"""URL functions: urlparse-compatible host/scheme extraction, SURT
canonicalization, public-suffix split, seen-key hashing.

Two tiers, chosen per call site:
  - JVM built-ins (``parse_url``, ``substring_index``) for the hot
    analytical path — whole-stage codegen, no Python;
  - Arrow-vectorized pandas UDFs wrapping ``urllib.parse`` for the
    byte-compat tier, where outputs must match Python ``urlparse`` edge
    cases exactly (reference behavior at crawlstats.py:493-499). Per
    BASELINE.json input_hint these are pandas/Arrow UDFs — never
    row-at-a-time Python.
"""

from __future__ import annotations

import functools

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# JVM tier (codegen; default for aggregations)
# ---------------------------------------------------------------------------


def host_of(url):
    """Host via built-in parse_url, lowercased, trailing dots stripped —
    mirrors crawlstats.py:497-498."""
    return F.regexp_replace(
        F.lower(F.parse_url(url, F.lit("HOST"))), r"\.+$", ""
    )


def scheme_of(url):
    return F.lower(F.parse_url(url, F.lit("PROTOCOL")))


IP_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"  # reference-lax (crawlstats.py:487)


# ---------------------------------------------------------------------------
# Arrow tier (urlparse byte-compat + SURT)
# ---------------------------------------------------------------------------


# pandas_udf construction needs an active SparkSession (DDL type parsing),
# so the UDFs are built lazily and memoized


@functools.lru_cache(maxsize=None)
def urlparse_host():
    @pandas_udf("string")
    def _host(urls: pd.Series) -> pd.Series:
        from urllib.parse import urlparse

        def one(u):
            if u is None:
                return None
            try:
                h = urlparse(u).hostname
            except ValueError:
                return None
            return h.rstrip(".") if h else None

        return urls.map(one)

    return _host


@functools.lru_cache(maxsize=None)
def urlparse_scheme():
    @pandas_udf("string")
    def _scheme(urls: pd.Series) -> pd.Series:
        from urllib.parse import urlparse

        return urls.map(
            lambda u: urlparse(u).scheme.lower() if u is not None else None
        )

    return _scheme


@functools.lru_cache(maxsize=None)
def surt_key():
    """SURT (Sort-friendly URI Reordering Transform) canonical key:
    'tld,domain,...,sub)path?query' — host labels reversed, scheme and
    leading www. dropped, default ports removed, case folded. Format per
    the public SURT convention the reference's CDX input uses
    (crawlstats.py:303-306, 776-777)."""

    @pandas_udf("string")
    def _surt(urls: pd.Series) -> pd.Series:
        from urllib.parse import urlparse

        def one(u):
            if u is None:
                return None
            try:
                p = urlparse(u)
            except ValueError:
                return None
            host = (p.hostname or "").rstrip(".").lower()
            if host.startswith("www."):
                host = host[4:]
            rev = ",".join(reversed(host.split(".")))
            path = p.path or "/"
            q = f"?{p.query}" if p.query else ""
            return f"{rev}){path}{q}"

        return urls.map(one)

    return _surt


def surt_domain_of(surt_key_col):
    """SURT domain = the part before ')' (crawlstats.py:777)."""
    return F.substring_index(surt_key_col, ")", 1)


# the URL-seen key (xxhash64 over the canonical form) lives with its
# consumer: frontier/scheduler.py::seen_key

# public-suffix split lives in functions/psl.py (full vendored PSL rules,
# arbitrary-depth longest match incl. wildcard/exception rules, applied as
# broadcast joins via psl.split_host)
