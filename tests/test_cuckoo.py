"""Partitioned cuckoo filter: no false negatives, bounded FPR, deletion,
save/load determinism, eviction path, and seam-compatibility with the
Bloom prefilter UDF (bit-identical anti-join results)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cc_crawl_statistics_spark.frontier import cuckoo as CK
from tests.conftest import spark  # noqa: F401  (fixture)


def _seen_df(spark, n=20_000):  # noqa: F811
    # deterministic spread-out 64-bit keys (xxhash64 of the id)
    return spark.range(n).select(F.xxhash64("id").alias("seen_key"))


@pytest.fixture(scope="module")
def built(spark):  # noqa: F811
    seen = _seen_df(spark)
    f = CK.build_cuckoo(seen, n_tables=4, load_target=0.8)
    keys = np.array([r.seen_key for r in seen.collect()], dtype=np.int64)
    return f, keys


def test_no_false_negatives(built):
    f, keys = built
    assert CK.contains(f, keys).all()


def test_false_positive_rate_bounded(spark, built):  # noqa: F811
    f, _ = built
    other = np.array(
        [
            r.h
            for r in spark.range(1_000_000, 1_020_000)
            .select(F.xxhash64("id").alias("h"))
            .collect()
        ],
        dtype=np.int64,
    )
    fpr = CK.contains(f, other).mean()
    # 16-bit fingerprints, 2 buckets x 4 slots: theoretical ~8/2^16 = 0.012%
    assert fpr < 0.005, fpr


def test_delete_then_membership(built):
    f, keys = built
    f2 = {**f, "tables": [t.copy() for t in f["tables"]]}
    victims, rest = keys[:2000], keys[2000:]
    assert CK.delete_keys(f2, victims) == len(victims)
    # remaining inserted keys keep the no-false-negative guarantee
    assert CK.contains(f2, rest).all()
    # deleted keys are gone up to fingerprint-collision residue
    assert CK.contains(f2, victims).mean() < 0.005


def test_save_load_roundtrip_deterministic(spark, built, tmp_path):  # noqa: F811
    f, keys = built
    p = str(tmp_path / "cuckoo.npy")
    CK.save_cuckoo(f, p)
    g = CK.load_cuckoo(p)
    assert g["n_buckets"] == f["n_buckets"] and g["n_keys"] == f["n_keys"]
    assert all(
        np.array_equal(a, b) for a, b in zip(f["tables"], g["tables"])
    )
    # rebuild from the same input -> identical bytes (vectorized placement
    # is order-deterministic given the partition layout)
    f2 = CK.build_cuckoo(_seen_df(spark), n_tables=4, load_target=0.8)
    assert all(
        np.array_equal(a, b) for a, b in zip(f["tables"], f2["tables"])
    )


def test_eviction_path_high_load():
    # drive the insert kernel directly at 0.94 load on a small table so
    # the sequential eviction tail is exercised (the build path sizes
    # with variance padding and rarely needs it)
    n_buckets = 256
    rng_keys = (np.arange(1, int(n_buckets * CK.SLOTS * 0.94)) * 2654435761
                ).astype(np.int64)
    table = np.zeros((n_buckets, CK.SLOTS), dtype=np.uint16)
    fill = np.zeros(n_buckets, dtype=np.int64)
    CK._insert_keys(table, fill, rng_keys.view(np.uint64), n_buckets)
    assert (table != 0).sum() == len(rng_keys)
    f = {
        "tables": [table],
        "n_tables": 1,
        "n_buckets": n_buckets,
        "n_keys": len(rng_keys),
    }
    assert CK.contains(f, rng_keys).all()


def test_prefilter_udf_seam(spark, built):  # noqa: F811
    """Same anti-join result whether the prefilter is cuckoo, bloom, or
    absent — the correctness contract of the scheduler seam."""
    from cc_crawl_statistics_spark.frontier import bloom as BL

    f, _ = built
    seen = _seen_df(spark)
    cand = spark.range(15_000, 45_000).select(
        F.xxhash64("id").alias("seen_key")
    )
    exact = cand.join(seen, "seen_key", "left_anti")

    might_ck = CK.might_contain_udf(spark, f)
    bl = BL.build_bloom(seen)
    might_bl = BL.might_contain_udf(spark, bl)
    for might in (might_ck, might_bl):
        flagged = cand.withColumn("_maybe", might(F.col("seen_key")))
        clean = flagged.filter(~F.col("_maybe")).drop("_maybe")
        maybe = (
            flagged.filter(F.col("_maybe"))
            .drop("_maybe")
            .join(seen, "seen_key", "left_anti")
        )
        got = sorted(r.seen_key for r in clean.union(maybe).collect())
        assert got == sorted(r.seen_key for r in exact.collect())
