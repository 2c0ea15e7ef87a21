"""Crawler-metrics side input (SURVEY.md §2.1 S5): Nutch counter dumps
``stats/crawler/CC-MAIN-*.json`` in the same ``JSON_KEY\\tJSON_VALUE`` wire
format as the stats output (/root/reference/plot/crawler_metrics.py:75-91;
fixture format stats/crawler/CC-MAIN-2016-18.json:1-19), e.g.::

    ["crawl_status", "fetcher:total", "CC-MAIN-2016-18"]\t4823256591

Everything here is built-in-expression Spark (split / from_json / element_at)
— counter files are small side inputs, but the parse is JVM-side anyway so
the same reader works if a deployment logs counters at scale.

The reference consumes three record families (crawler_metrics.py add()):
``crawl_status`` counters verbatim, ``size`` records for page/url totals,
and ``scheme`` records (taking the unique-URL element of the count vector).
Aggregate roll-ups (redirect/denied/failed/skipped) follow its metrics_map,
including the post-NUTCH-3132 counter names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# vendored from crawler_metrics.py:35-68 (old + NUTCH-3132 counter names)
METRICS_MAP: dict[str, tuple[str, ...]] = {
    "fetcher:aggr:redirect": (
        "fetcher:temp_moved",
        "fetcher:moved",
        "fetcher:redirect_count_exceeded",
        "fetcher:redirect_deduplicated",
        "fetcher:redirect_count_exceeded_total",
        "fetcher:redirect_deduplicated_total",
        "fetcher:redirect_not_created_total",
    ),
    "fetcher:aggr:denied": (
        "fetcher:access_denied",
        "fetcher:robots_denied",
        "fetcher:robots_denied_maxcrawldelay",
        "fetcher:robots_defer_visits_dropped",
        "fetcher:filter_denied",
        "fetcher:robots_denied_total",
        "fetcher:robots_denied_maxcrawldelay_total",
        "fetcher:robots_defer_visits_dropped_total",
    ),
    "fetcher:aggr:failed": ("fetcher:gone", "fetcher:notfound", "fetcher:exception"),
    "fetcher:aggr:skipped": (
        "fetcher:hitByThrougputThreshold",
        "fetcher:hitByTimeLimit",
        "fetcher:AboveExceptionThresholdInQueue",
        "fetcher:filtered",
        "fetcher:hit_by_throughput_threshold_total",
        "fetcher:hit_by_timelimit_total",
        "fetcher:above_exception_threshold_total",
        "fetcher:hit_by_timeout_total",
        "fetcher:filtered_total",
    ),
}


def parse_crawler_metric_lines(
    lines: DataFrame, value_col: str = "value"
) -> DataFrame:
    """Parse counter-dump lines → (type, counter, crawl, value).

    Count-vector values (scheme records) take the unique-URL element: index 1
    of the expanded vector, falling back to index 0 / the bare scalar for
    run-length-compressed values (MultiCount.get_count(1, val) semantics,
    crawler_metrics.py:86)."""
    key = F.from_json(
        F.substring_index(value_col, "\t", 1), "array<string>"
    )
    raw_val = F.substring_index(value_col, "\t", -1)
    vec = F.from_json(raw_val, "array<long>")
    value = F.coalesce(
        F.element_at(vec, 2), F.element_at(vec, 1), raw_val.cast("long")
    )
    return lines.select(
        key.getItem(0).alias("type"),
        key.getItem(1).alias("counter"),
        key.getItem(2).alias("crawl"),
        value.alias("value"),
    )


def read_crawler_metrics(spark: SparkSession, path: str) -> DataFrame:
    """File flavor of parse_crawler_metric_lines (the S5 side input)."""
    return parse_crawler_metric_lines(spark.read.text(path))


def crawler_metrics_stats(metrics: DataFrame) -> DataFrame:
    """The reference's selection + aggregate roll-up (crawler_metrics.py
    add(), :75-91): crawl_status counters verbatim, size page/url totals,
    scheme records prefixed ``scheme:``; then METRICS_MAP aggregates unioned
    in. Output: (crawl, item_type, value), one row per counter per crawl."""
    base = (
        metrics.filter(
            (F.col("type") == "crawl_status")
            | ((F.col("type") == "size") & F.col("counter").isin("page", "url"))
            | (F.col("type") == "scheme")
        )
        .select(
            "crawl",
            F.when(
                F.col("type") == "scheme",
                F.concat(F.lit("scheme:"), F.col("counter")),
            )
            .otherwise(F.col("counter"))
            .alias("item_type"),
            "value",
        )
    )
    pairs = [
        (src, metric) for metric, srcs in METRICS_MAP.items() for src in srcs
    ]
    spark = metrics.sparkSession
    rollup_dim = spark.createDataFrame(pairs, "item_type string, metric string")
    rollups = (
        base.join(F.broadcast(rollup_dim), "item_type")
        .groupBy("crawl", F.col("metric").alias("item_type"))
        .agg(F.sum("value").alias("value"))
    )
    return base.unionByName(rollups).orderBy("crawl", "item_type")


def display_title(item_type_col):
    """P11 (crawler_metrics.py:145-152 row2title): counter name → plot
    title, as a built-in regexp chain."""
    c = F.regexp_replace(item_type_col, "(?<=^fetch)er(?::aggr)?|^generator:", "")
    c = F.regexp_replace(c, "[:_]", " ")
    return F.when(c == "page", F.lit("pages released")).otherwise(c)
