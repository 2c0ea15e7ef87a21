"""Structured Streaming surface.

The reference is a monthly batch pipeline (SURVEY.md §2.8) and the frontier
rounds are batch-incremental over snapshots by design; this module provides
the streaming counterparts for continuously-arriving fetch/event data:

  - windowed statistics with watermarked late-data handling (the streaming
    analog of the per-crawl histograms),
  - exactly-once-ish dedup on the event id within the watermark horizon
    (the streaming analog of the URL-seen filter),
  - a foreachBatch round driver that feeds micro-batches through the same
    batch operators (one code path for both modes).

At scale: sources are Kafka/files on object storage; sinks are Iceberg via
foreachBatch MERGE. Here the file source + memory sink exercise identical
plans (Trigger.AvailableNow ≅ one scheduling round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def windowed_event_stats(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window per-type counts with a watermark: late rows beyond
    the horizon are dropped instead of reopening state — the bounded-state
    property the 10^10-scale deployment needs."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    state size bounded by horizon × arrival rate."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "append"):
    """Drive a streaming query to completion over the available input
    (Trigger.AvailableNow semantics via processAllAvailable)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def foreach_batch_rounds(
    events: DataFrame, batch_fn, checkpoint_dir: str
):
    """foreachBatch driver: each micro-batch runs the supplied *batch*
    transformation (the same operators the batch engine uses), giving
    exactly-once sinks via the checkpoint + idempotent-commit pattern the
    frontier store implements."""
    return (
        events.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
