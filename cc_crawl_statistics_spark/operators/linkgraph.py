"""Link-graph operators: html outlink parse → resolved edge list →
host-level graph → degree statistics.

This is the discovery front the frontier consumes (the reference repo
reads CDX metadata downstream of a crawler that does exactly this; its
arithmetic stand-in is frontier/scheduler.expand_links, whose child
formula the fixture generator embeds as real ``<a href>`` anchors —
sources/cc_pages.cc_pages_linked_df — so the parse here has exact
arithmetic ground truth in DuckDB).

Scale shape at 100 TB / 10^10 pages:
- the parse is pure codegen over the html blob (functions/links.py) — the
  ONLY stage that reads the blob; the edge list projects it away before
  the explode, so the fan-out (~50 links/page in real corpora) shuffles
  slim (url, outlink) strings, never html bytes;
- host_link_graph is one hash aggregation on (src_host, dst_host); counts
  are sum-combinable so map-side partial aggregation absorbs the ~Zipf
  skew of popular destination hosts before the shuffle;
- degree stats are a second aggregation over the (already tiny) edge
  relation; the pseudo-log histogram (shared with timeseries.W10) bounds
  output cardinality to a few dozen rows per side regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.links import parse_outlinks_col, resolve_href_col
from ..functions.urlkit import host_of, scheme_of
from .timeseries import pseudo_log_histogram


def page_outlinks(pages: DataFrame) -> DataFrame:
    """Distinct (url, outlink) edges parsed out of the html column and
    resolved against the page's own URL (scheme/host/path derived via
    codegen parse_url — a crawler resolves against the fetched URL,
    nothing else).

    Distinct-ness collapses repeat anchors within a page AND repeat
    fetches of the same URL across crawls. The dedup runs on the slim
    (url, outlink) projection AFTER the parse — never shuffle the html
    blob to deduplicate pages; decoding a duplicate page twice map-side is
    cheaper than moving its bytes."""
    base = pages.select(
        "url",
        scheme_of(F.col("url")).alias("_scheme"),
        host_of(F.col("url")).alias("_host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("_path"),
        F.explode(parse_outlinks_col(F.col("html"))).alias("_href"),
    )
    return (
        base.select(
            "url",
            resolve_href_col(
                F.col("_scheme"), F.col("_host"), F.col("_path"),
                F.col("_href"),
            ).alias("outlink"),
        )
        .filter(F.col("outlink").isNotNull())
        .distinct()
    )


def host_link_graph(outlinks: DataFrame,
                    keep_self_loops: bool = True) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level web graph, the unit
    Common Crawl publishes its own webgraph at. Self-loops (intra-host
    links) are real navigation structure and kept by default; PageRank-
    style consumers usually drop them (``keep_self_loops=False``)."""
    edges = outlinks.select(
        host_of(F.col("url")).alias("src_host"),
        host_of(F.col("outlink")).alias("dst_host"),
    )
    if not keep_self_loops:
        edges = edges.filter(F.col("src_host") != F.col("dst_host"))
    return (
        edges.groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
        .orderBy("src_host", "dst_host")
    )


def host_degree_stats(host_edges: DataFrame) -> DataFrame:
    """Per-host degree summary over the host graph: distinct out-/in-
    neighbor counts and total out-link weight, full-outer-merged so hosts
    that only receive links still appear (in-degree > 0, out-degree 0)."""
    out_deg = host_edges.groupBy(
        F.col("src_host").alias("host")
    ).agg(
        F.count("*").alias("out_degree"),
        F.sum("n_links").alias("out_links"),
    )
    in_deg = host_edges.groupBy(
        F.col("dst_host").alias("host")
    ).agg(F.count("*").alias("in_degree"))
    return (
        out_deg.join(in_deg, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("out_links", F.lit(0)).alias("out_links"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .orderBy("host")
    )


def host_degree_histogram(host_edges: DataFrame) -> DataFrame:
    """Pseudo-log histogram (1-2-5 decades, shared with W10) of host
    in-degrees — the classic power-law summary plot of a web graph, O(1)
    output rows at any scale."""
    in_deg = host_edges.groupBy(
        F.col("dst_host").alias("host")
    ).agg(F.count("*").alias("in_degree"))
    return pseudo_log_histogram(in_deg, "in_degree")


def anchor_text_stats(pages_html: DataFrame, top_k: int = 2) -> DataFrame:
    """Top anchor texts per target host — the anchor-text web-graph
    product (what link-based ranking / query-independent relevance
    training consumes). Input: rows with an ``html`` binary column.

    Plan shape: anchors parse in codegen (functions/links.py
    parse_anchors_col), the blob is pruned BEFORE the explode, counts
    pre-aggregate map-side on (dst_host, text), and the ranking window
    partitions by dst_host over the already-aggregated distinct-text
    rows (per-host cardinality, not per-anchor volume). A pathological
    host with ~10^6 distinct texts is one partition of counted rows —
    acceptable; the salted two-phase shape (textstats.vocabulary) drops
    in if a corpus ever breaks that."""
    from pyspark.sql import Window

    from ..functions.links import parse_anchors_col

    anchors = pages_html.select(
        F.explode(parse_anchors_col(F.col("html"))).alias("a")
    )
    counted = (
        anchors.select(
            host_of(F.col("a.href")).alias("dst_host"),
            F.col("a.text").alias("anchor_text"),
        )
        .filter(F.col("dst_host").isNotNull() & (F.col("dst_host") != ""))
        .groupBy("dst_host", "anchor_text")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.desc("n"), F.asc("anchor_text")
    )
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .orderBy("dst_host", "rank")
    )
