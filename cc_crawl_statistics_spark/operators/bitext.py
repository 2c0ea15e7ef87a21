"""Bitext candidate mining by URL language-variant matching.

The classic parallel-corpus bootstrap (the WMT16 bilingual-document
alignment baseline; ParaCrawl/CCMatrix start the same way before content
scoring): multilingual sites publish translations at URLs that differ
only in a language path segment (/en/about vs /de/about), so collapsing
the segment to a placeholder yields an alignment key, and URLs sharing a
key with different language segments are translation-pair candidates.
Content-level verification (sentence alignment, LASER cosine) is a
downstream stage; the URL pass is the candidate generator that has to
run at full crawl scale.

Scale shape: one codegen projection (regexp extract + replace — no UDF),
a distinct, then a self equi-join on the alignment key. Groups are
bounded by the language-segment alphabet (≤ a few dozen variants per
key), so the join fans out at most |langs|² per key — never quadratic in
the crawl. The key carries the host, so the join key is high-cardinality
and hash-partitions evenly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# language path segments recognized as variants (two-letter core set; a
# production list adds locale forms like en-us, pt-br — same machinery)
LANG_SEG = "(en|de|fr|es|it|pt|nl|pl|ja|zh|ru|ko|ar|tr)"

__all__ = ["LANG_SEG", "language_variant_pairs"]


def language_variant_pairs(
    urls: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Translation-pair candidates from language-segment URL matching.

    Input: any frame with a ``url_col``. URLs without a recognized
    ``/xx/`` language segment are dropped. Output one row per unordered
    candidate pair: (key, lang_a, url_a, lang_b, url_b) with
    lang_a < lang_b; ``key`` is the URL with the segment collapsed to
    ``<lang>`` (host included, so keys never collide across sites).
    """
    t = (
        urls.select(
            F.regexp_extract(url_col, f"/{LANG_SEG}/", 1).alias("lang"),
            F.regexp_replace(url_col, f"/{LANG_SEG}/", "/<lang>/").alias(
                "key"
            ),
            F.col(url_col).alias("u"),
        )
        .filter(F.col("lang") != "")
        .distinct()
    )
    a = t.select(
        "key", F.col("lang").alias("lang_a"), F.col("u").alias("url_a")
    )
    b = t.select(
        "key", F.col("lang").alias("lang_b"), F.col("u").alias("url_b")
    )
    return a.join(b, "key").filter(F.col("lang_a") < F.col("lang_b")).select(
        "key", "lang_a", "url_a", "lang_b", "url_b"
    )
