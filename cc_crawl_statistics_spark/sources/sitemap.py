"""XML sitemap source — the other half of a crawler's seed discovery
(robots.txt points at sitemaps; sitemaps enumerate URLs with freshness
hints). Beyond the reference repo's scope (it consumes the crawler's
output); a frontier engine consumes sitemaps as a seed/recrawl signal.

Rendering aggregates per host (one <urlset> document per host — the real
cardinality: sitemap files are host-dimension objects, bounded to 50k URLs
by the protocol, so the per-host collect_list is bounded by protocol, not
by corpus size). Parsing uses Spark's native ``from_xml`` with an explicit
schema — JVM-side, no UDFs; unknown elements are ignored by schema
projection, malformed documents yield NULL structs and are counted, not
fatal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SITEMAP_SCHEMA = (
    "url ARRAY<STRUCT<loc STRING, lastmod BIGINT, priority STRING>>"
)

_MAX_URLS = 50_000  # sitemaps.org protocol cap per sitemap file


def render_sitemaps(pages: DataFrame) -> DataFrame:
    """pages → one ``<urlset>`` XML document per host (columns host,
    sitemap_xml). lastmod = the URL's latest fetch epoch; priority =
    the URL's deterministic score rendered as the protocol's 0.0–1.0
    decimal string. Entries are sorted by loc so the document bytes are
    deterministic."""
    per_url = pages.groupBy("host", "url").agg(
        F.max("fetch_ts").alias("lastmod"),
        F.min(((F.col("doc_id") * 37) % 101)).alias("prio_pct"),
    )
    entry = F.concat(
        F.lit("<url><loc>"),
        F.col("url"),
        F.lit("</loc><lastmod>"),
        F.col("lastmod").cast("string"),
        F.lit("</lastmod><priority>"),
        F.when(F.col("prio_pct") == 100, F.lit("1.00")).otherwise(
            F.concat(
                F.lit("0."), F.lpad(F.col("prio_pct").cast("string"), 2, "0")
            )
        ),
        F.lit("</priority></url>"),
    )
    return (
        per_url.select("host", entry.alias("entry"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(F.array_sort(F.collect_list("entry")), ""),
                F.lit("</urlset>"),
            ).alias("sitemap_xml")
        )
    )


def parse_sitemaps(
    sitemaps: DataFrame, xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Sitemap documents → one row per <url> entry:
    (host, url, lastmod, priority_permille). Malformed documents parse to
    NULL and are dropped here (count them upstream via is_valid if needed);
    priority '0.80' → 800‰ integer (protocol default 0.5 when absent)."""
    entries = (
        sitemaps.select(
            "host", F.from_xml(F.col(xml_col), SITEMAP_SCHEMA).alias("s")
        )
        .filter(F.col("s").isNotNull() & F.col("s.url").isNotNull())
        .select("host", F.explode("s.url").alias("u"))
    )
    prio = F.coalesce(
        (F.col("u.priority").try_cast("decimal(4,3)") * 1000).cast("long"),
        F.lit(500),
    )
    return entries.select(
        "host",
        F.col("u.loc").alias("url"),
        F.col("u.lastmod").alias("lastmod"),
        prio.alias("priority_permille"),
    )


def advertised_sitemaps(robots: DataFrame, sitemaps: DataFrame) -> DataFrame:
    """Filter fetched sitemap documents to those a host's robots.txt
    actually advertises (``Sitemap:`` directives,
    frontier/robots.py:sitemap_directives) — the real discovery chain:
    robots → sitemap URL → sitemap fetch → seeds. The directive relation
    is host-dimension, so it broadcasts into the semi join; the sitemap
    side never shuffles."""
    from ..frontier.robots import sitemap_directives
    from ..functions.urlkit import host_of

    adv = (
        sitemap_directives(robots)
        .select(host_of(F.col("sitemap_url")).alias("host"))
        .distinct()
    )
    return sitemaps.join(F.broadcast(adv), "host", "semi")


def seeds_from_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """Frontier seed list from sitemap entries: depth 0, score from the
    sitemap priority — the protocol-blessed analogue of seed_frontier's
    deterministic score (frontier/scheduler.py:seed_frontier)."""
    return parse_sitemaps(sitemaps).select(
        "url",
        "host",
        F.lit(0).alias("depth"),
        F.col("priority_permille").alias("score"),
        F.lit("pending").alias("state"),
    )


SITEMAP_INDEX_SCHEMA = "sitemap ARRAY<STRUCT<loc STRING, lastmod BIGINT>>"


def render_sitemap_shards(
    pages: DataFrame, max_urls: int = _MAX_URLS
) -> tuple[DataFrame, DataFrame]:
    """Protocol-compliant sharding for hosts over the 50k-URL cap
    (sitemaps.org: split into ≤max_urls <urlset> files + one
    <sitemapindex> that lists them): returns (shards, index).

    shards: (host, shard_id, shard_loc, sitemap_xml, lastmod) — one
    <urlset> document per shard, entries in url order, shard_loc the
    conventional https://host/sitemap-<k>.xml address, lastmod the
    shard's newest entry (what an index-driven recrawler compares).
    index: (host, index_xml) — one <sitemapindex> document per host.

    Scale: the per-host ranking window is the protocol's REQUIRED total
    order (shard membership must be stable across renders); per-host URL
    cardinality is politeness-budget-bounded in any real crawl, the same
    bounded-stratum argument as pack_sequences' per-group window.
    """
    from pyspark.sql import Window

    per_url = pages.groupBy("host", "url").agg(
        F.max("fetch_ts").alias("lastmod"),
        F.min(((F.col("doc_id") * 37) % 101)).alias("prio_pct"),
    )
    w = Window.partitionBy("host").orderBy("url")
    entry = F.concat(
        F.lit("<url><loc>"),
        F.col("url"),
        F.lit("</loc><lastmod>"),
        F.col("lastmod").cast("string"),
        F.lit("</lastmod><priority>"),
        F.when(F.col("prio_pct") == 100, F.lit("1.00")).otherwise(
            F.concat(
                F.lit("0."), F.lpad(F.col("prio_pct").cast("string"), 2, "0")
            )
        ),
        F.lit("</priority></url>"),
    )
    sharded = per_url.withColumn(
        "shard_id",
        F.floor((F.row_number().over(w) - 1) / max_urls).cast("long"),
    )
    shards = (
        sharded.select("host", "shard_id", entry.alias("entry"), "lastmod")
        .groupBy("host", "shard_id")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(F.array_sort(F.collect_list("entry")), ""),
                F.lit("</urlset>"),
            ).alias("sitemap_xml"),
            F.max("lastmod").alias("lastmod"),
        )
        .withColumn(
            "shard_loc",
            F.concat(
                F.lit("https://"),
                F.col("host"),
                F.lit("/sitemap-"),
                F.col("shard_id").cast("string"),
                F.lit(".xml"),
            ),
        )
    )
    sm_entry = F.concat(
        F.lit("<sitemap><loc>"),
        F.col("shard_loc"),
        F.lit("</loc><lastmod>"),
        F.col("lastmod").cast("string"),
        F.lit("</lastmod></sitemap>"),
    )
    index = (
        shards.select("host", sm_entry.alias("e"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<sitemapindex>"),
                F.array_join(F.array_sort(F.collect_list("e")), ""),
                F.lit("</sitemapindex>"),
            ).alias("index_xml")
        )
    )
    return shards, index


def parse_sitemap_index(
    index: DataFrame, xml_col: str = "index_xml"
) -> DataFrame:
    """<sitemapindex> documents → one row per advertised shard:
    (host, shard_loc, lastmod). Same native from_xml path as
    parse_sitemaps; NULL (malformed) documents drop."""
    return (
        index.select(
            "host",
            F.from_xml(F.col(xml_col), SITEMAP_INDEX_SCHEMA).alias("s"),
        )
        .filter(F.col("s").isNotNull() & F.col("s.sitemap").isNotNull())
        .select("host", F.explode("s.sitemap").alias("u"))
        .select(
            "host",
            F.col("u.loc").alias("shard_loc"),
            F.col("u.lastmod").alias("lastmod"),
        )
    )
