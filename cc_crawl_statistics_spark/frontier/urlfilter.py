"""URL filter chain for frontier admission — the crawler's scope rules.

Every production crawler gates discovered URLs through an ordered filter
chain before they enter the frontier (Nutch's urlfilter-{validator,
suffix,regex} plugins; Heritrix's DecideRule scope): drop non-fetchable
schemes, absurd lengths, crawler traps, binary payloads the pipeline
won't parse, and session-id churn that defeats the URL-seen set. The
reference repo measures crawls that were produced behind exactly such a
chain (its CDX rows are post-filter), so the engine that *runs* a crawl
needs the operator itself.

Rules, first-match-wins, all whole-stage-codegen string expressions — a
single projection, no shuffle, no UDF, safe to run inline in the
discovery path at any scale:

1. ``scheme``            — scheme not in the allowlist (http/https).
2. ``too_long``          — URL longer than ``max_len`` (default 2048,
                           the conventional interop limit).
3. ``too_many_segments`` — more than ``max_segments`` path segments
                           (Heritrix TooManyPathSegmentsDecideRule; the
                           classic calendar/mirror trap signature).
                           Segments are counted as slashes beyond the
                           scheme's two.
4. ``binary_extension``  — path (query string stripped) ends in a
                           media/archive extension the pipeline won't
                           parse (Nutch urlfilter-suffix).
5. ``session_id``        — session-token query parameter; infinite
                           alias space for the same resource.
6. ``accept``            — everything else.

The semantics are deliberately expressible in ANSI SQL (no regex
backreferences) so the ``url_filters`` query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALLOWED_SCHEMES = ("http", "https")

# media / archive suffixes a text pipeline won't parse (lower-case,
# checked against the path with the query string stripped)
BLOCKED_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".gif", ".webp", ".bmp", ".ico", ".svg",
    ".css", ".js", ".zip", ".gz", ".tar", ".rar", ".7z", ".exe",
    ".dmg", ".mp3", ".mp4", ".avi", ".mov", ".wmv", ".flv", ".woff",
    ".woff2", ".ttf",
)

# lower-case needles; any occurrence anywhere in the URL disqualifies
SESSION_PARAMS = ("jsessionid=", "phpsessid=", "sessionid=")

MAX_URL_LEN = 2048
MAX_PATH_SEGMENTS = 20


def url_filter_verdict(
    url: Column,
    *,
    max_len: int = MAX_URL_LEN,
    max_segments: int = MAX_PATH_SEGMENTS,
) -> Column:
    """Column expression: the first-match-wins verdict for one URL."""
    u = F.coalesce(url, F.lit(""))
    scheme = F.substring_index(u, "://", 1)
    path_segments = (
        F.length(u) - F.length(F.replace(u, F.lit("/"), F.lit(""))) - 2
    )
    # path with query string AND fragment stripped ('x.jpg#gallery' must
    # not bypass the extension rule)
    base = F.lower(
        F.substring_index(F.substring_index(u, "#", 1), "?", 1)
    )
    lower_u = F.lower(u)
    is_blocked_ext = None
    for ext in BLOCKED_EXTENSIONS:
        c = base.endswith(ext)
        is_blocked_ext = c if is_blocked_ext is None else (is_blocked_ext | c)
    has_session = None
    for p in SESSION_PARAMS:
        c = lower_u.contains(p)
        has_session = c if has_session is None else (has_session | c)
    return (
        F.when(~scheme.isin(*ALLOWED_SCHEMES), F.lit("scheme"))
        .when(F.length(u) > max_len, F.lit("too_long"))
        .when(path_segments > max_segments, F.lit("too_many_segments"))
        .when(is_blocked_ext, F.lit("binary_extension"))
        .when(has_session, F.lit("session_id"))
        .otherwise(F.lit("accept"))
    )


def url_filter(
    df: DataFrame,
    url_col: str = "url",
    *,
    max_len: int = MAX_URL_LEN,
    max_segments: int = MAX_PATH_SEGMENTS,
) -> DataFrame:
    """Append a ``verdict`` column classifying ``url_col`` against the
    rule chain. Pure projection — composes inline after any discovery
    step (scheduler.run_round's pluggable ``discover``) with zero plan
    impact beyond the expression."""
    return df.withColumn(
        "verdict",
        url_filter_verdict(
            F.col(url_col), max_len=max_len, max_segments=max_segments
        ),
    )


def accepted(df: DataFrame, url_col: str = "url", **kw) -> DataFrame:
    """Only the URLs that pass the chain, verdict column dropped — the
    frontier-admission form."""
    return url_filter(df, url_col, **kw).filter(
        F.col("verdict") == "accept"
    ).drop("verdict")


def oracle_verdict_sql(url_expr: str = "url") -> str:
    """The identical rule chain as an ANSI-SQL CASE expression (DuckDB
    oracle side). Kept adjacent to the Column builder so the two rule
    lists can never drift apart silently."""
    ext_checks = " OR ".join(
        f"lower(split_part(split_part({url_expr}, '#', 1), '?', 1)) "
        f"LIKE '%{e}'"
        for e in BLOCKED_EXTENSIONS
    )
    sess_checks = " OR ".join(
        f"lower({url_expr}) LIKE '%{p}%'" for p in SESSION_PARAMS
    )
    schemes = ", ".join(f"'{s}'" for s in ALLOWED_SCHEMES)
    return f"""CASE
      WHEN split_part({url_expr}, '://', 1) NOT IN ({schemes}) THEN 'scheme'
      WHEN length({url_expr}) > {MAX_URL_LEN} THEN 'too_long'
      WHEN length({url_expr}) - length(replace({url_expr}, '/', '')) - 2
           > {MAX_PATH_SEGMENTS} THEN 'too_many_segments'
      WHEN {ext_checks} THEN 'binary_extension'
      WHEN {sess_checks} THEN 'session_id'
      ELSE 'accept'
    END"""


def apply_host_blocklist(
    df: DataFrame, blocklist: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Drop rows whose host is on a derived blocklist (the output of
    operators/textstats.py:host_quality_rollup filtered to blocked=1,
    or any (host) frame) — the quality-feedback admission gate that runs
    after the static URL filter chain.

    Scale shape: broadcast LEFT ANTI join. A blocklist is bounded by the
    distinct-host dimension and in practice by its blocked subset
    (10^4-10^6 rows — kilobytes to a few MB of host strings), far under
    the broadcast threshold even at a 10^10-URL frontier, so the gate
    costs one hash-probe per discovered row and no shuffle of the
    frontier side."""
    hosts = blocklist.select(F.col(host_col).alias(host_col)).distinct()
    return df.join(F.broadcast(hosts), host_col, "left_anti")


def mine_url_templates(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    min_urls: int = 10,
    share_permille: int = 500,
) -> DataFrame:
    """Empirical crawler-trap mining — the data-driven complement to the
    static rule chain above: collapse every distinct URL to its path
    TEMPLATE (digit runs -> ``<n>``) and flag templates that behave like
    infinite generators. Heritrix/Nutch ship the fixed rules; real
    operations derive new ones from the crawl itself (calendar pages,
    session mirrors, faceted search) by exactly this frequency shape.

    A template is flagged ``trap`` when all three hold:
      - it carries >= 2 ``<n>`` placeholders (a one-dimensional id space
        like /page/<n>.html is a normal listing; traps are
        multi-dimensional),
      - it holds >= ``min_urls`` distinct URLs, and
      - it accounts for >= ``share_permille``/1000 of the host's distinct
        URLs (one template dominating a host is the signature).

    Output per (host, template): (host, template, n_urls, host_urls,
    n_placeholders, trap) — integers/bool only, oracle-safe.

    Scale shape: one distinct over (host, url) (politeness-bounded per
    host), one (host, template) aggregation with map-side partials, then
    a host-level second aggregation joined back — templates-per-host is
    tiny, so the join's right side is host-dimension-sized. Pure codegen
    string expressions; no UDF, no window over an unbounded dimension.
    """
    urls = pages.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("url")
    ).distinct()
    t = urls.withColumn(
        "template",
        F.regexp_replace(
            F.regexp_replace("url", "^https?://[^/]+", ""),
            "[0-9]+",
            "<n>",
        ),
    )
    per_t = t.groupBy("host", "template").agg(
        F.count("*").cast("long").alias("n_urls")
    )
    host_tot = per_t.groupBy("host").agg(
        F.sum("n_urls").cast("long").alias("host_urls")
    )
    n_ph = (
        (
            F.length("template")
            - F.length(F.expr("replace(template, '<n>', '')"))
        )
        / 3
    ).cast("long")
    return per_t.join(host_tot, "host").select(
        "host",
        "template",
        "n_urls",
        "host_urls",
        n_ph.alias("n_placeholders"),
        (
            (n_ph >= 2)
            & (F.col("n_urls") >= min_urls)
            & (F.col("n_urls") * 1000 >= share_permille * F.col("host_urls"))
        ).alias("trap"),
    )
