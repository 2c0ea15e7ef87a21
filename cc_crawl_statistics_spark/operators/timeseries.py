"""Plot-layer window / time-series analytics (SURVEY.md §2.5 W1–W10).

The reference computes these in pandas over the tiny per-crawl series
(/root/reference/crawl_size.py:90-176, overlap.py:47-76). Here they are
window functions over the crawl-level aggregates — the inputs are already
reduced to one row per crawl (≤ ~126 rows at full production scale), so the
single-partition window is deliberately cheap, while the heavy reduction
below it is fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .counts import page_rows


def cumulative_size(size: DataFrame) -> DataFrame:
    """W1: running totals over crawls ordered by crawl id
    (crawl_size.py:92-97)."""
    w = Window.orderBy("crawl").rowsBetween(Window.unboundedPreceding, 0)
    return size.select(
        "crawl",
        "fetches",
        "pages",
        F.sum("fetches").over(w).alias("cum_fetches"),
        F.sum("pages").over(w).alias("cum_pages"),
    ).orderBy("crawl")


def duplicate_ratio(size: DataFrame) -> DataFrame:
    """W6: URL- and content-level duplicate ratios per crawl
    (crawl_size.py:167-176). Ratios scaled to integer permille to keep the
    oracle comparison float-free."""
    return size.select(
        "crawl",
        "pages",
        "urls",
        "digests",
        (
            F.floor(
                F.lit(1000)
                * (F.lit(1.0) - F.col("urls") / F.col("pages"))
            )
        )
        .cast("long")
        .alias("url_dup_permille"),
        (
            F.floor(
                F.lit(1000)
                * (F.lit(1.0) - F.col("digests") / F.col("pages"))
            )
        )
        .cast("long")
        .alias("content_dup_permille"),
    ).orderBy("crawl")


def crawl_overlap(pages: DataFrame) -> DataFrame:
    """W7 exact mode: pairwise URL overlap + Jaccard between crawls
    (overlap.py:47-68). One scan builds the per-URL crawl bitmask; the
    O(crawls²) pair expansion happens on the tiny crawl dimension.

    Jaccard reported as integer permille (floor) to stay float-exact in the
    oracle comparison.
    """
    per_url = (
        page_rows(pages)
        .groupBy("url")
        .agg(F.collect_set("crawl").alias("crawls"))
    )
    # explode to (url, c1), (url, c2) pairs with c1 < c2
    a = per_url.select("url", F.explode("crawls").alias("c1"))
    b = per_url.select("url", F.explode("crawls").alias("c2"))
    inter = (
        a.join(b, "url")
        .filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count("*").alias("inter"))
    )
    sizes = (
        page_rows(pages)
        .groupBy("crawl")
        .agg(F.countDistinct("url").alias("n"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("crawl", "c1")), "c1")
        .withColumnRenamed("n", "n1")
        .join(F.broadcast(sizes.withColumnRenamed("crawl", "c2")), "c2")
        .withColumnRenamed("n", "n2")
        .select(
            "c1",
            "c2",
            "inter",
            (F.col("n1") + F.col("n2") - F.col("inter")).alias("uni"),
            F.floor(
                F.lit(1000)
                * F.col("inter")
                / (F.col("n1") + F.col("n2") - F.col("inter"))
            )
            .cast("long")
            .alias("jaccard_permille"),
        )
        .orderBy("c1", "c2")
    )


def trailing_union(size_by_crawl: DataFrame, n: int) -> DataFrame:
    """W4/W5: trailing-N-crawl page sums + URL/page ratio
    (crawl_size.py:121-155). NULL until N crawls exist, like the
    reference's 'nan'."""
    w = Window.orderBy("crawl").rowsBetween(-(n - 1), 0)
    cnt = F.count("*").over(w)
    return size_by_crawl.select(
        "crawl",
        F.when(cnt >= n, F.sum("pages").over(w)).alias(f"pages_last_{n}"),
        F.when(cnt >= n, F.sum("urls").over(w)).alias(f"urls_last_{n}"),
    ).orderBy("crawl")


def domain_coverage(domain_counts: DataFrame) -> DataFrame:
    """W8: cumulative share of pages covered by the top domains
    (histogram.py:125-143): sort domains by pages desc, running sums,
    permille of total."""
    w = Window.partitionBy("crawl").orderBy(
        F.desc("pages"), F.desc("urls"), F.desc("domain")
    )
    total = Window.partitionBy("crawl")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return domain_counts.select(
        "crawl",
        "domain",
        F.row_number().over(w).alias("rank"),
        F.sum("pages").over(run).alias("cum_pages"),
        F.floor(
            F.lit(1000) * F.sum("pages").over(run) / F.sum("pages").over(total)
        )
        .cast("long")
        .alias("cum_pages_permille"),
    ).orderBy("crawl", "rank")


def pseudo_log_histogram(counts: DataFrame, col: str) -> DataFrame:
    """W10: pseudo-log bins 1,2,5,10,20,50,... (histogram.py:29-32).
    Bin = largest edge ≤ value, computed closed-form from log10."""
    v = F.col(col).cast("double")
    p = F.floor(F.log10(v))
    mant = v / F.pow(F.lit(10.0), p)
    edge = (
        F.when(mant >= 5, 5).when(mant >= 2, 2).otherwise(1)
        * F.pow(F.lit(10.0), p)
    ).cast("long")
    return (
        counts.select(edge.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .orderBy("bin")
    )
