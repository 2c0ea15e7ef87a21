"""Cuckoo-filter kernels and the sharded build/delete path: no false
negatives, bounded FPR, vectorized deletion (bit-identical to the
sequential reference), build determinism, and the eviction path.

The whole-filter build/save/load/broadcast API this file once exercised
was retired in round 5 (legacy stores migrate on touch —
tests/test_frontier.py::test_legacy_blob_prefilter_migrates_on_touch);
the filter now only ever exists as shard files
(frontier/shardedfilter.py), so these tests drive the in-memory kernels
directly plus the sharded Spark path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cc_crawl_statistics_spark.frontier import cuckoo as CK
from cc_crawl_statistics_spark.frontier import shardedfilter as SH
from tests.conftest import spark  # noqa: F401  (fixture)


def _seen_df(spark, n=20_000):  # noqa: F811
    # deterministic spread-out 64-bit keys (xxhash64 of the id)
    return spark.range(n).select(F.xxhash64("id").alias("seen_key"))


def _build_tables(keys: np.ndarray, n_tables=4, load_target=0.8) -> dict:
    """In-memory multi-table build from the kernels — the per-shard
    work a Spark build task does, without the job."""
    u = keys.view(np.uint64)
    per = max(1, (len(keys) + n_tables - 1) // n_tables)
    n_buckets = CK._n_buckets_for(per, load_target)
    tables = []
    route = CK._route(u, n_tables)
    for t in range(n_tables):
        table = np.zeros((n_buckets, CK.SLOTS), dtype=np.uint16)
        fill = np.zeros(n_buckets, dtype=np.int64)
        CK._insert_keys(table, fill, u[route == t], n_buckets)
        tables.append(table)
    return {"tables": tables, "n_tables": n_tables, "n_buckets": n_buckets}


@pytest.fixture(scope="module")
def built(spark):  # noqa: F811
    seen = _seen_df(spark)
    keys = np.array([r.seen_key for r in seen.collect()], dtype=np.int64)
    return _build_tables(keys), keys


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


def _delete_sequential_reference(table, u, n_buckets):
    """The retired per-key deletion loop, kept as the semantics oracle
    for the vectorized kernel."""
    fps = CK._fingerprint(u)
    b1 = CK._bucket1(u, n_buckets)
    b2 = CK._alt_bucket(b1, fps, n_buckets)
    removed = 0
    for i in range(len(u)):
        for b in (b1[i], b2[i]):
            slots = np.flatnonzero(table[b] == fps[i])
            if slots.size:
                table[b, slots[0]] = 0
                removed += 1
                break
    return removed


def test_vectorized_delete_matches_sequential(built):
    """_delete_from_table is bit-identical to the per-key reference loop
    — including on inputs with duplicate keys (shared candidate pairs
    take the ordered fallback path)."""
    f, keys = built
    for victims in (
        keys[:4000],
        np.concatenate([keys[:100], keys[:100], keys[50:150]]),  # dupes
    ):
        t_vec = [t.copy() for t in f["tables"]]
        t_seq = [t.copy() for t in f["tables"]]
        vroute = CK._route(victims.view(np.uint64), f["n_tables"])
        got_vec = got_seq = 0
        for t in range(f["n_tables"]):
            u = victims[vroute == t].view(np.uint64)
            got_vec += SH._delete_from_table(t_vec[t], u, f["n_buckets"])
            got_seq += _delete_sequential_reference(
                t_seq[t], u, f["n_buckets"]
            )
        assert got_vec == got_seq
        assert all(np.array_equal(a, b) for a, b in zip(t_vec, t_seq))


def test_delete_then_membership(built):
    f, keys = built
    tables = [t.copy() for t in f["tables"]]
    victims, rest = keys[:2000], keys[2000:]
    route = CK._route(victims.view(np.uint64), f["n_tables"])
    removed = sum(
        SH._delete_from_table(
            tables[t], victims[route == t].view(np.uint64), f["n_buckets"]
        )
        for t in range(f["n_tables"])
    )
    assert removed == len(victims)
    f2 = {**f, "tables": tables}
    # remaining inserted keys keep the no-false-negative guarantee
    assert CK.contains(f2, rest).all()
    # deleted keys are gone up to fingerprint-collision residue
    assert CK.contains(f2, victims).mean() < 0.005


def test_sharded_build_deterministic(spark, tmp_path):  # noqa: F811
    """Rebuilding from the same input produces byte-identical shard
    files (vectorized placement is order-deterministic given the
    partition layout) — the property spark-submit bit-identity rests on."""
    import os

    seen = _seen_df(spark, n=8000)
    d1, d2 = str(tmp_path / "a.d"), str(tmp_path / "b.d")
    h1 = SH.build_sharded_cuckoo(seen, d1, n_shards=4)
    h2 = SH.build_sharded_cuckoo(seen, d2, n_shards=4)
    assert h1["n_buckets"] == h2["n_buckets"]
    shards = sorted(
        f for f in os.listdir(d1) if f.startswith("shard=")
    )
    assert shards == sorted(
        f for f in os.listdir(d2) if f.startswith("shard=")
    )
    for f in shards:
        with open(os.path.join(d1, f), "rb") as a, open(
            os.path.join(d2, f), "rb"
        ) as b:
            assert a.read() == b.read(), f


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
    }
    assert CK.contains(f, rng_keys).all()
