"""REP page-directive gates — where the in-HTML directives parsed by
functions/rep.py take effect in the pipeline:

- ``with_rep_flags``  annotates a pages frame with (noindex, nofollow,
  canonical) parsed from the html bytes, in the single codegen stage
  that touches the blob;
- ``indexable_pages`` is the noindex gate a compliant pipeline applies
  before derived text/index products (WET conversion, cc-index
  publication, training-corpus ingestion);
- ``canonical_groups`` aggregates rel=canonical hints into dedup
  groups: every capture pointing at the same canonical URL is one
  group, the canonical capture is kept, the rest are dup credit
  (RFC 6596 semantics; complements digest dedup, which only catches
  byte-identical bodies).

Scale shape: flags are computed where the blob already is (no extra
scan); the canonical grouping aggregates a slim (canonical_url, url)
projection — one hash aggregation keyed by canonical target, partial
map-side like every counts.py rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.links import resolve_href_col
from ..functions.rep import (
    parse_meta_robots_col,
    parse_rel_canonical_col,
    robots_noindex_col,
    robots_nofollow_col,
)
from ..functions.urlkit import host_of, scheme_of


def with_rep_flags(pages: DataFrame) -> DataFrame:
    """pages + (noindex boolean, nofollow boolean, canonical string) —
    canonical resolved against the page URL like any href, NULL when
    the tag is absent."""
    meta = parse_meta_robots_col(F.col("html"))
    return pages.withColumns(
        {
            "noindex": robots_noindex_col(meta),
            "nofollow": robots_nofollow_col(meta),
            "canonical": resolve_href_col(
                scheme_of(F.col("url")),
                host_of(F.col("url")),
                F.parse_url(F.col("url"), F.lit("PATH")),
                parse_rel_canonical_col(F.col("html")),
            ),
        }
    )


def indexable_pages(pages: DataFrame) -> DataFrame:
    """Drop pages whose meta robots excludes indexing — the gate WET /
    index sinks must apply (absence of the tag means indexable)."""
    return with_rep_flags(pages).filter(~F.col("noindex")).drop(
        "noindex", "nofollow", "canonical"
    )


def canonical_groups(pages: DataFrame) -> DataFrame:
    """Per canonical target: how many distinct captured URLs point at it
    and how many are non-canonical duplicates (url != canonical). Only
    pages that declare a canonical participate; the group key is the
    resolved canonical URL, so variant captures (tracking params, mirror
    subdomains, …) consolidate onto one credit line."""
    flagged = (
        with_rep_flags(pages)
        .filter(F.col("canonical").isNotNull())
        .select("canonical", "url")
        .distinct()
    )
    return (
        flagged.groupBy(F.col("canonical").alias("canonical_url"))
        .agg(
            F.count("*").alias("n_urls"),
            F.sum(
                F.when(F.col("url") != F.col("canonical"), 1).otherwise(0)
            ).alias("n_dup"),
        )
        .orderBy("canonical_url")
    )


def meta_robots_stats(pages: DataFrame) -> DataFrame:
    """Directive-class census over fetch rows: pages and distinct URLs
    per (noindex, nofollow) combination — the compliance summary a crawl
    operator reads before publishing derived products."""
    return (
        with_rep_flags(pages)
        .groupBy("noindex", "nofollow")
        .agg(
            F.count("*").alias("pages"),
            F.countDistinct("url").alias("urls"),
        )
        .orderBy("noindex", "nofollow")
    )
