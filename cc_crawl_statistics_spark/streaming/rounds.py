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


def attribution_join(
    lhs_events: DataFrame,
    rhs_events: DataFrame | None = None,
    lhs_type: str = "view",
    rhs_type: str = "click",
    horizon_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream event-time range join (the remaining §2.8 operator
    class): attribute each ``rhs_type`` event to every same-user
    ``lhs_type`` event it follows within ``horizon_seconds`` — the
    view→click attribution shape.

    ONE plan for both modes: on static inputs this is a plain range
    equi-join (the batch oracle path, SQL-expressible for DuckDB parity);
    on streaming inputs the watermarks plus the two-sided time-range
    condition let Spark derive state-eviction bounds, so join state per
    side is watermark-horizon × arrival-rate, hash-partitioned by
    ``user_id`` — bounded regardless of stream length. Inner join: no
    row waits on the other side beyond the horizon.

    ``rhs_events`` defaults to the lhs source (self-join); pass a second
    readStream over the same path for engines/tests that want distinct
    source nodes. Stream == batch equivalence is pinned in
    tests/test_streaming.py; exact-value parity vs DuckDB by the
    events_attribution oracle query."""
    rhs_events = lhs_events if rhs_events is None else rhs_events
    lhs = lhs_events.filter(F.col("event_type") == lhs_type).select(
        F.col("user_id").alias("lhs_user"),
        F.col("event_id").alias("lhs_id"),
        F.col("ts").alias("lhs_ts"),
    )
    rhs = rhs_events.filter(F.col("event_type") == rhs_type).select(
        F.col("user_id").alias("rhs_user"),
        F.col("event_id").alias("rhs_id"),
        F.col("ts").alias("rhs_ts"),
    )
    if lhs.isStreaming:
        lhs = lhs.withWatermark("lhs_ts", watermark)
    if rhs.isStreaming:
        rhs = rhs.withWatermark("rhs_ts", watermark)
    cond = (
        (F.col("lhs_user") == F.col("rhs_user"))
        & (F.col("rhs_ts") > F.col("lhs_ts"))
        & (
            F.col("rhs_ts")
            <= F.col("lhs_ts") + F.expr(f"INTERVAL {horizon_seconds} SECOND")
        )
    )
    return lhs.join(rhs, cond, "inner").select(
        F.col("lhs_user").alias("user_id"),
        "lhs_id",
        "rhs_id",
        (
            F.unix_timestamp("rhs_ts") - F.unix_timestamp("lhs_ts")
        ).alias("lag_seconds"),
    )


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


SESSION_STATE_SCHEMA = "n_events BIGINT, last_epoch BIGINT, n_sessions BIGINT"
SESSION_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_sessions BIGINT, n_events BIGINT, closed BOOLEAN"
)


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState
    (SURVEY.md §2.8 forward path): per-user session counting with an
    explicit gap rule, state kept per group and expired by processing-time
    timeout — the pattern for engine-side stateful ops Spark lacks as
    built-ins (the batch equivalent is plans/pipeline_queries.py
    q_events_sessionize, lag-window based).

    State per user: (n_events, last_epoch, n_sessions). Arrow-batched:
    pandas per group-batch, no per-row Python at the plan level.

    ``state_timeout_ms`` enables processing-time expiry (state emitted with
    closed=True and removed). Leave None for bounded replays/tests: with a
    processing-time timeout the stream keeps scheduling timeout batches, so
    ``processAllAvailable`` on a finite source would never settle."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n_events, _last, n_sessions) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_sessions": [n_sessions],
                    "n_events": [n_events],
                    "closed": [True],
                }
            )
            return
        epochs = []
        for pdf in pdfs:
            epochs.extend((pdf["ts"].astype("int64") // 10**9).tolist())
        epochs.sort()
        if state.exists:
            n_events, last_epoch, n_sessions = state.get
        else:
            n_events, last_epoch, n_sessions = 0, None, 0
        for e in epochs:
            if last_epoch is None or e - last_epoch > gap_seconds:
                n_sessions += 1
            last_epoch = e
            n_events += 1
        state.update((n_events, last_epoch, n_sessions))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
                "closed": [False],
            }
        )

    return (
        events.selectExpr("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if state_timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
