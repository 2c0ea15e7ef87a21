"""Bucketed table materialization — co-located, shuffle-free joins.

At 100 TB the same join keys recur across the whole workload: pages ⨝
frontier state on host (politeness, blocked-host retirement), crawl ⨝
crawl on url/surt_key (overlap, new-items), stats ⨝ stats on the dim
key. Each such join normally shuffles BOTH sides every time it runs.
Bucketing pays the shuffle ONCE at write time: ``bucketBy(n, key)``
hash-partitions the stored files exactly like Spark's shuffle
partitioner, so Catalyst proves the required distribution already holds
and plans a SortMergeJoin with **no Exchange on either side** (and with
``sortBy`` no Sort either). This is the storage analog of the
reference's fixed 10/200-reducer layout (crawlstats.py:1024-1029) done
right: the partitioning is carried by the table, not re-derived per job.

The same mechanism co-locates repeated groupBys: an aggregation keyed on
the bucket column plans as a single partial+final HashAggregate with no
Exchange.

Evidence: tests/test_bucketed.py asserts Exchange-freedom on the
executed plans (broadcast disabled so the join can't cheat) and value
parity with the unbucketed join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    n_buckets: int,
    bucket_cols: tuple[str, ...] = ("host",),
    sort_cols: tuple[str, ...] | None = None,
    path: str | None = None,
) -> None:
    """Materialize ``df`` as a parquet table bucketed (and optionally
    sorted) on the join key. ``n_buckets`` plays the role shuffle
    partitions play at query time — size it so one bucket of the largest
    co-located join fits an executor (at 100 TB / 1000 executors:
    thousands, not dozens)."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read back a bucketed table; the bucket spec rides along in the
    catalog, so downstream joins/aggregations on the bucket key skip
    their Exchange (requires spark.sql.sources.bucketing.enabled, the
    default)."""
    return spark.table(name)
