"""Space-saving heavy-hitters sketch: bound and guarantee properties.

No SQL oracle (the sketch depends on partitioning/order); instead the
tests pin the two theorems the implementation claims:
  1. every emitted key's exact bounds bracket its true count;
  2. any key heavier than the summed per-partition minima is present.
Plus the degenerate-exactness case (k >= distinct keys => est_lo ==
est_hi == true).
"""

import random

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.operators.sketches import (
    heavy_hitters,
    space_saving_partials,
)


def _skewed_df(spark, n_keys=200, seed=7, parts=8):
    rng = random.Random(seed)
    rows = []
    for i in range(n_keys):
        true = max(1, 2000 // (i + 1))  # Zipf-ish: key000 hot, tail flat
        rows += [(f"key{i:03d}",)] * true
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "key string").repartition(parts)


def test_bounds_bracket_true_counts(spark):
    df = _skewed_df(spark)
    true = {
        r["key"]: r["cnt"]
        for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()
    }
    out = heavy_hitters(df, "key", k=32, top=25).collect()
    assert len(out) == 25
    assert out[0]["rank"] == 1
    for r in out:
        assert r["est_lo"] <= true[r["key"]] <= r["est_hi"], r


def test_heavy_keys_guaranteed_present(spark):
    df = _skewed_df(spark)
    partials = space_saving_partials(df, "key", k=32)
    mins = (
        partials.select("part_id", "part_min").distinct()
        .agg(F.sum("part_min").alias("m"))
        .first()["m"]
    )
    true = {
        r["key"]: r["cnt"]
        for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()
    }
    # any key heavier than the summed minima cannot have been evicted
    # from every partition summary
    present = {r["key"] for r in heavy_hitters(df, "key", k=32, top=10**6).collect()}
    for key, cnt in true.items():
        if cnt > mins:
            assert key in present, (key, cnt, mins)


def test_exact_when_k_covers_all_keys(spark):
    df = _skewed_df(spark, n_keys=40)
    true = {
        r["key"]: r["cnt"]
        for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()
    }
    out = heavy_hitters(df, "key", k=1000, top=40).collect()
    assert len(out) == 40
    for r in out:
        assert r["est_lo"] == r["est_hi"] == true[r["key"]], r
    # exact mode must reproduce the true descending order
    ordered = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [r["key"] for r in out] == [k for k, _ in ordered]


def test_weighted_counts(spark):
    rows = [("a", 5), ("b", 1), ("a", 7), ("c", 2), ("b", 1)]
    df = spark.createDataFrame(rows, "key string, w long").repartition(2)
    out = {r["key"]: r for r in heavy_hitters(df, "key", k=10, top=10, weight_col="w").collect()}
    assert out["a"]["est_lo"] == out["a"]["est_hi"] == 12
    assert out["b"]["est_lo"] == out["b"]["est_hi"] == 2
    assert out["c"]["est_lo"] == out["c"]["est_hi"] == 2
    # tie between b and c at weight 2 -> key-ascending tiebreak
    assert out["b"]["rank"] < out["c"]["rank"]
