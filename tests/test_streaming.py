"""Streaming surface: the streaming plans must agree with their batch
equivalents over the same (fully available) input."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.streaming import rounds as R
from tests.conftest import SF_SMOKE


def test_windowed_stream_matches_batch(spark):
    stream = R.windowed_event_stats(R.stream_events(spark, SF_SMOKE))
    # complete mode: append would hold back the final still-open windows
    R.run_to_memory(stream, "win_out", mode="complete")
    got = spark.sql("SELECT * FROM win_out").toPandas()

    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_cents",
        )
        .toPandas()
    )
    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    batch_s = batch.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(batch_s)
    assert (got_s.n_events.values == batch_s.n_events.values).all()
    assert (got_s.sum_cents.values == batch_s.sum_cents.values).all()


def test_dedup_stream(spark):
    R.run_to_memory(
        R.dedup_stream(R.stream_events(spark, SF_SMOKE)), "dedup_out"
    )
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").collect()[0]
    assert got.n == got.d  # no duplicate ids survive


def test_foreach_batch_rounds(spark, tmp_path):
    seen = {}

    def batch_fn(df, epoch_id):
        seen[epoch_id] = df.count()

    q = R.foreach_batch_rounds(
        R.stream_events(spark, SF_SMOKE), batch_fn, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert sum(seen.values()) == 1000  # all events routed through batches


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState session counts must agree with the batch
    lag-window sessionization on the same input (same 30-min gap rule)."""
    from cc_crawl_statistics_spark.plans.pipeline_queries import (
        q_events_sessionize,
    )
    from cc_crawl_statistics_spark.streaming.rounds import (
        stateful_sessionize,
        stream_events,
    )

    sf = "/root/testdata/sf0.001"
    stream = stream_events(spark, sf)
    out = stateful_sessionize(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions_state")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql(
            "SELECT user_id, n_sessions, n_events FROM sessions_state"
        ).collect()
    }
    expected = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_events_sessionize(spark, sf).collect()
    }
    assert got == expected


def test_attribution_stream_matches_batch(spark):
    """Stream-stream event-time range join (attribution_join): the
    watermarked streaming self-join over the file source emits exactly
    the rows the identical plan produces on the static table."""
    stream = R.attribution_join(
        R.stream_events(spark, SF_SMOKE),
        R.stream_events(spark, SF_SMOKE),
    )
    assert stream.isStreaming
    R.run_to_memory(stream, "attr_out", mode="append")
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM attr_out").collect())
    )
    batch = sorted(
        map(
            tuple,
            R.attribution_join(
                spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            ).collect(),
        )
    )
    assert len(batch) > 0  # fixture actually exercises the join
    assert got == batch


def test_attribution_semantics_hand_computed(spark):
    """Boundary pins: strictly-after lower bound, inclusive horizon upper
    bound, per-user isolation, integer lag."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view at t0; clicks at +1s (in), +1800s (in, boundary),
        # +1801s (out), and one click BEFORE the view (out)
        (1, t0, 1, "view", 0.0, ""),
        (2, t0 + dt.timedelta(seconds=1), 1, "click", 0.0, ""),
        (3, t0 + dt.timedelta(seconds=1800), 1, "click", 0.0, ""),
        (4, t0 + dt.timedelta(seconds=1801), 1, "click", 0.0, ""),
        (5, t0 - dt.timedelta(seconds=5), 1, "click", 0.0, ""),
        # user 2's click never joins user 1's view
        (6, t0 + dt.timedelta(seconds=10), 2, "click", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    got = {
        (r.user_id, r.lhs_id, r.rhs_id): r.lag_seconds
        for r in R.attribution_join(ev).collect()
    }
    assert got == {(1, 1, 2): 1, (1, 1, 3): 1800}
