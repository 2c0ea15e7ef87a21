"""AQE skew-join evidence: the session config (session.py — skewJoin on)
actually splits a Zipf-hot partition at runtime, with unchanged results.

At 100 TB the host/domain dimensions are Zipf-distributed; the engine's
posture (SURVEY §4) is salting for the *known* hot keys (frontier's
host-bucketed top-k) plus AQE skew-join for the *unknown* ones. This
test pins the second half: a key carrying half the left relation is
detected from runtime shuffle stats and split — SortMergeJoin(skew=true)
in the final adaptive plan — while the join result stays exact.
Thresholds are lowered only because the fixture is tiny; production
defaults engage at 256 MB partitions."""

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401  (fixture)

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
}


def test_aqe_splits_zipf_hot_key_with_exact_results(spark):  # noqa: F811
    old = {k: spark.conf.get(k) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        n = 2_000_000
        # every even id collapses onto key 0 -> one partition holds half
        # the relation; odd ids are unique keys
        left = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        cnt = left.join(right, "k").groupBy().count()
        got = cnt.collect()[0][0]
        # exact expectation: n/2 rows with k=0 match right's k=0, plus
        # the 500 odd ids below 1000 that match their own key
        assert got == n // 2 + 500
        plan = cnt._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
