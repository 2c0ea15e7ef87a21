"""Streaming WARC ingestion — the continuous flavor of the crawl-output
pipeline (sources/warc.py): as the crawler lands .warc part files, a
Structured Streaming job parses records incrementally, maintains running
crawl statistics, and derives WET text exactly once per record.

Scale posture: the file source discovers new part files per micro-batch
(the unit of parallelism Common Crawl's layout already uses); parsing is
the same all-codegen expression tree as batch, so stream == batch results
by construction (pinned in tests/test_streaming_ingest.py). The WET
derivation runs under foreachBatch with a checkpoint — Spark's
exactly-once pattern: a replayed micro-batch overwrites the same
batch-id-addressed output, so a crashed/restarted query never duplicates
records (same idempotent-commit posture as the frontier store).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.warc import (
    RECORD_SEP,
    parse_warc_records,
    render_wet_records,
    wet_from_warc,
)
from ..sources.zipnum import (
    render_cdx_index_lines,
    write_zipnum,
    zipnum_members,
)


def stream_warc_records(spark: SparkSession, path: str) -> DataFrame:
    """Streaming source over a directory of WARC part files — the same
    custom record delimiter as the batch reader, so one record per row."""
    raw = (
        spark.readStream.option("lineSep", RECORD_SEP)
        .text(path)
    )
    return raw.filter(F.trim(F.col("value")) != "")


def streaming_crawl_stats(records: DataFrame) -> DataFrame:
    """Running per-(status, mime) record counts + distinct-URL sketch over
    the parsed stream (complete-mode aggregation; distinct URLs via
    HLL++ — exact distinct is unbounded state in a stream, the sketch is
    the same estimator the batch engine's size_estimate uses)."""
    parsed = parse_warc_records(records)
    return (
        parsed.filter(F.col("is_valid"))
        .groupBy("status", "mime")
        .agg(
            F.count("*").alias("n_records"),
            F.approx_count_distinct("url").alias("urls_est"),
        )
    )


def stream_warc_to_wet(
    spark: SparkSession, warc_dir: str, wet_dir: str, checkpoint_dir: str
):
    """WARC stream → WET conversion records, exactly once: each micro-batch
    derives WET rows with the byte-identical Arrow extraction and writes a
    batch-id-addressed text directory (idempotent on replay). Returns the
    started query; callers processAllAvailable()/stop()."""

    def write_batch(batch_df: DataFrame, batch_id: int):
        conv = wet_from_warc(parse_warc_records(batch_df))
        out = os.path.join(wet_dir, f"batch-{batch_id}")
        render_wet_records(conv).write.mode("overwrite").text(out)

    return (
        stream_warc_records(spark, warc_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_publish_zipnum(
    spark: SparkSession,
    pages_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema,
    n_shards: int = 4,
    block_size: int = 3000,
):
    """Incremental index publication — Common Crawl's per-segment model as
    a stream: as pages parquet lands, each micro-batch is rendered,
    total-order sorted, and published as its own complete ZipNum shard
    set + cluster.idx under ``batch-<id>/`` (segment indexes are later
    merged by a plain sorted-merge over cluster.idx key ranges). Replays
    after a crash rewrite the same batch-id directory, so publication is
    exactly once. Returns the started query."""

    def publish(batch_df: DataFrame, batch_id: int):
        members = zipnum_members(
            render_cdx_index_lines(batch_df), n_shards, block_size
        )
        out = os.path.join(index_dir, f"batch-{batch_id}")
        if os.path.exists(out):
            shutil.rmtree(out)
        # write_zipnum pins the block lineage itself (persist around its
        # two consumers: the .gz writes and cluster_index)
        write_zipnum(members, out)

    return (
        spark.readStream.schema(schema)
        .parquet(pages_dir)
        .writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
