"""As-of (point-in-time) join — the temporal lookup operator Spark's
built-in join strategies lack, in its crawl-native form: "what was the
latest capture of this URL as of time T?" (the Wayback Machine query;
also recrawl diffing, snapshot reconstruction, and feature point-in-time
correctness in training pipelines).

Spark-first composition instead of a per-row UDF or an exploding
range join:

  union-tag + ordered window
    captures(url, fetch_ts, payload…)  tagged _probe=0
    probes  (url, ts)                  tagged _probe=1
    → one shuffle on the key, one within-partition sort on
      (event time, tag), then `last(payload, ignorenulls=True)` over the
      running frame carries each capture's payload forward to every probe
      that follows it in time.

Why this shape survives 100 TB: the naive formulation
(probes ⋈ captures ON url WHERE fetch_ts <= ts → max) materializes every
(probe, earlier-capture) pair — quadratic per hot URL — and Catalyst can
only plan it as a join + re-aggregation. The union-tag plan moves each
input row exactly once, costs one Exchange + one sort (both on the url
key, AQE-skew-splittable), and the window frame is streaming (running
`last`), so no per-group buffering beyond the sort. This is the same
plan shape Flink/kdb as-of implementations lower to; DuckDB ships it as
a native ASOF JOIN — which is exactly what the oracle uses, so the
composition is verified against an independent first-class
implementation, not against itself.

Tie semantics: a capture at exactly ts qualifies (<=), implemented by
sorting the capture (tag 0) before the probe (tag 1) at equal times.
Capture-side ties on (key, time) are resolved by the payload sort
suffix — deterministic, and absent in the fixture ((url, fetch_ts) is
unique there).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_latest_capture(
    captures: DataFrame,
    probes: DataFrame,
    keys: Sequence[str] = ("url",),
    capture_ts: str = "fetch_ts",
    probe_ts: str = "ts",
    payload: Sequence[str] = ("crawl", "digest"),
    probe_id: str = "probe_id",
) -> DataFrame:
    """For every probe row, the most recent capture of the same key with
    capture time <= probe time (LEFT semantics: probes with no prior
    capture keep NULL payload and NULL capture_ts).

    Row consistency: the carried value is ONE struct of
    (capture time, payload…), so every output row is a whole capture —
    payload columns can never back-fill independently from different
    captures when one capture holds a NULL field (SQL ASOF returns whole
    rows; per-column `last(ignorenulls)` would not). NULL-key rows follow
    SQL equality: a NULL-key capture matches nothing (dropped from the
    union), so NULL-key probes come back with NULL payload, exactly as
    the ON-clause equality in the DuckDB oracle behaves."""
    keys = list(keys)
    payload = list(payload)
    cap_keyed = captures
    for k in keys:
        cap_keyed = cap_keyed.filter(F.col(k).isNotNull())
    cap = cap_keyed.select(
        *keys,
        F.col(capture_ts).cast("long").alias("_t"),
        F.struct(
            F.col(capture_ts).cast("long").alias("capture_ts"), *payload
        ).alias("_cap"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast("long").alias("_pid"),
    )
    cap_struct_type = cap.schema["_cap"].dataType
    pr = probes.select(
        *keys,
        F.col(probe_ts).cast("long").alias("_t"),
        F.lit(None).cast(cap_struct_type).alias("_cap"),
        F.lit(1).alias("_tag"),
        F.col(probe_id).cast("long").alias("_pid"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_tag", "_cap")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = cap.unionByName(pr).select(
        *keys,
        "_t",
        "_tag",
        "_pid",
        F.last("_cap", ignorenulls=True).over(w).alias("_cap"),
    )
    return (
        carried.filter(F.col("_tag") == 1)
        .select(
            F.col("_pid").alias(probe_id),
            *keys,
            F.col("_t").alias(probe_ts),
            F.col("_cap.capture_ts").alias("capture_ts"),
            *[F.col(f"_cap.{c}").alias(c) for c in payload],
        )
        .orderBy(probe_id)
    )


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str = "start_s",
    end_col: str = "end_s",
    point_col: str = "t",
    bucket_s: int = 3600,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Containment (range) join — the other temporal join Spark's planner
    has no native strategy for: all (point, interval) pairs with
    ``start <= t <= end``, optionally key-scoped.

    A naive theta join plans as BroadcastNestedLoop/Cartesian — O(n·m)
    comparisons. This lowers it to the standard bucketization rewrite:
    every interval explodes into the ``bucket_s``-wide epochs it covers,
    points map to their single bucket, the two equi-join on
    (keys…, bucket) — hash join, AQE-skew-splittable — and the exact
    predicate re-filters. Each true pair matches in EXACTLY one bucket
    (the point's), so no dedup pass is needed. Fanout is
    interval_length/bucket_s rows per interval: pick bucket_s near the
    median interval length (sessions: ~minutes-hours → 3600 keeps the
    explode ≤ a few rows each). Same rewrite Databricks' range-join hints
    and kdb window joins apply; DuckDB plans the predicate natively
    (IEJoin), which is what the oracle runs against.
    """
    keys = list(keys)
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_s),
                F.floor(F.col(end_col) / bucket_s),
            )
        ),
    )
    pt = points.withColumn("_b", F.floor(F.col(point_col) / bucket_s))
    return (
        pt.join(iv, keys + ["_b"], "inner")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_b")
    )
