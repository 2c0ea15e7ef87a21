"""SemDeDup (similarity.py:semdedup_verdicts): planted-duplicate recall,
greedy keep rule, cross-cluster independence, partition stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.operators.similarity import semdedup_verdicts


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _two_blobs(spark):
    """Two well-separated direction groups; within group A, vectors 0-2
    are near-identical (planted semantic dups), 3 points elsewhere."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),  # dup of 0
        (2, [0.998, 0.02, 0.0]),  # dup of 0
        (3, [0.6, 0.8, 0.0]),  # same half-space, not a dup
        (10, [0.0, 0.0, 1.0]),
        (11, [0.0, 0.01, 0.999]),  # dup of 10
        (12, [0.0, 0.8, 0.6]),  # not a dup
    ]
    return _emb(spark, rows)


def test_planted_duplicates_dropped_earliest_kept(spark):
    out = {
        r.vec_id: r.kept
        for r in semdedup_verdicts(
            _two_blobs(spark), k=2, eps_x1m=990_000, iters=4
        ).collect()
    }
    assert out[0] is True and out[1] is False and out[2] is False
    assert out[10] is True and out[11] is False
    assert out[3] is True and out[12] is True


def test_all_unique_all_kept(spark):
    rows = [(i, [float(i + 1), float((i * 7) % 5), 1.0]) for i in range(12)]
    out = semdedup_verdicts(_emb(spark, rows), k=3, eps_x1m=999_999)
    assert all(r.kept for r in out.collect())


def test_verdicts_stable_across_partitioning(spark):
    df = _two_blobs(spark)
    one = semdedup_verdicts(df, k=2, eps_x1m=990_000).collect()
    two = semdedup_verdicts(df.repartition(5), k=2, eps_x1m=990_000).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))


def test_pairs_confined_to_clusters(spark):
    """Identical vectors that land in different clusters are NOT compared
    — the documented approximation of the method. Construct two far
    groups, force k=2, and verify each kept set is computed per cluster:
    every cluster keeps its own earliest member."""
    df = _two_blobs(spark)
    out = semdedup_verdicts(df, k=2, eps_x1m=990_000)
    per_cluster_kept = (
        out.filter("kept").groupBy("centroid_id").count().collect()
    )
    assert len(per_cluster_kept) == 2
    for r in per_cluster_kept:
        assert r["count"] >= 1


def test_scale_shape_no_cross_cluster_join(spark):
    plan = (
        semdedup_verdicts(_two_blobs(spark), k=2, eps_x1m=990_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
