"""Storage-interface conformance (ICEBERG.md): the behavioral contract
every SnapshotStore implementation — the sandbox parquet+manifest
fallback today, an Iceberg-backed store at scale — must satisfy. The
tests exercise ONLY the public store interface (commit / latest_round /
read / read_seen / reopen_seen / compact_seen / expire_rounds /
table_rows / manifest), never the on-disk layout, so an Iceberg
implementation runs this file unchanged: the contract IS the swap spec.

Contract items (numbered as in ICEBERG.md):
  C1 atomic visibility — a round exists iff its commit marker does
  C2 metrics/lineage recorded at commit time, readable after
  C3 append-only seen set: read_seen(upto) == union of deltas ≤ upto
  C4 reopen = delete-until-readd (merge-on-read delete semantics)
  C5 compaction is read-transparent (bit-identical results)
  C6 expiration never touches reachable state; expired reads fail loudly
  C7 metadata row counts == data row counts (manifest-answered COUNT(*))
"""

import os

import pytest
from pyspark.sql import functions as F

from cc_crawl_statistics_spark.frontier.state import MANIFEST, SnapshotStore
from tests.conftest import spark  # noqa: F401  (fixture)


def _keys_df(spark, lo, hi):  # noqa: F811
    return spark.range(lo, hi).select(
        F.xxhash64(F.col("id").cast("string")).alias("seen_key")
    )


def _mk_store(spark, root, rounds=3, per_round=200):  # noqa: F811
    st = SnapshotStore(str(root))
    for r in range(rounds):
        delta = _keys_df(spark, r * per_round, (r + 1) * per_round)
        st.commit(
            r,
            {"url_seen_delta": delta.coalesce(1)},
            {"round": r, "n": per_round},
        )
    return st


def test_c1_commit_marker_is_the_visibility_point(spark, tmp_path):  # noqa: F811
    st = _mk_store(spark, tmp_path / "s", rounds=2)
    assert st.latest_round() == 1
    # a crashed attempt = data written, no marker → invisible + redoable
    d2 = os.path.join(st.root, "round=0002")
    os.makedirs(os.path.join(d2, "url_seen_delta"), exist_ok=True)
    assert st.latest_round() == 1
    st.commit(2, {"url_seen_delta": _keys_df(spark, 400, 600).coalesce(1)},
              {"round": 2})
    assert st.latest_round() == 2
    # double-commit of a committed round must refuse, not overwrite
    with pytest.raises(ValueError):
        st.commit(2, {}, {})


def test_c2_metrics_and_lineage_survive(spark, tmp_path):  # noqa: F811
    st = _mk_store(spark, tmp_path / "s", rounds=1)
    m = st.manifest(0)
    assert m["metrics"]["n"] == 200
    assert "url_seen_delta" in m["partition_lineage"]
    assert len(m["partition_lineage"]["url_seen_delta"]) >= 1


def test_c3_seen_is_union_of_deltas(spark, tmp_path):  # noqa: F811
    st = _mk_store(spark, tmp_path / "s", rounds=3)
    for upto in range(3):
        got = {r.seen_key for r in st.read_seen(spark, upto).collect()}
        want = {
            r.seen_key
            for r in _keys_df(spark, 0, (upto + 1) * 200).collect()
        }
        assert got == want


def test_c4_reopen_deletes_until_readd(spark, tmp_path):  # noqa: F811
    st = _mk_store(spark, tmp_path / "s", rounds=2)
    victims = _keys_df(spark, 0, 5)
    st.reopen_seen(spark, 1, victims)
    vs = {r.seen_key for r in victims.collect()}
    after = {r.seen_key for r in st.read_seen(spark, 1).collect()}
    assert after.isdisjoint(vs)
    # a later delta re-adding one victim wins over the delete
    readd = list(vs)[0]
    st.commit(
        2,
        {
            "url_seen_delta": spark.createDataFrame(
                [(readd,)], "seen_key bigint"
            ).coalesce(1)
        },
        {"round": 2},
    )
    seen2 = {r.seen_key for r in st.read_seen(spark, 2).collect()}
    assert readd in seen2 and seen2.isdisjoint(vs - {readd})


def test_c5_compaction_is_read_transparent(spark, tmp_path):  # noqa: F811
    a = _mk_store(spark, tmp_path / "a", rounds=3)
    b = _mk_store(spark, tmp_path / "b", rounds=3)
    b.compact_seen(spark, 2, n_partitions=2)
    sa = {r.seen_key for r in a.read_seen(spark, 2).collect()}
    sb = {r.seen_key for r in b.read_seen(spark, 2).collect()}
    assert sa == sb
    assert b.seen_base_round(2) == 2 and a.seen_base_round(2) is None


def test_c6_expiration_reachability(spark, tmp_path):  # noqa: F811
    st = _mk_store(spark, tmp_path / "s", rounds=3)
    # frontier base + seen base at round 2 → cutoff 2
    st.commit(
        3,
        {
            "frontier": _keys_df(spark, 0, 10)
            .select(F.col("seen_key").alias("surt_key"))
            .coalesce(1)
        },
        {"round": 3},
    )
    st.compact_seen(spark, 3, n_partitions=2)
    before = {r.seen_key for r in st.read_seen(spark, 3).collect()}
    removed = st.expire_rounds(3)
    assert removed  # old deltas actually dropped
    after = {r.seen_key for r in st.read_seen(spark, 3).collect()}
    assert after == before  # reachable state untouched
    # manifests (history) always survive expiration
    assert os.path.exists(os.path.join(st.root, "round=0000", MANIFEST))


def test_c7_metadata_counts_match_data(spark, tmp_path):  # noqa: F811
    st = _mk_store(spark, tmp_path / "s", rounds=2)
    for r in range(2):
        meta = st.table_rows(r, "url_seen_delta")
        data = st.read(spark, r, "url_seen_delta").count()
        assert meta == data == 200
