"""OPIC (operators/opic.py): bit-for-bit parity with an independent
single-threaded Python model, exact cash conservation, and partitioning
invariance. Oracle exactness of the registry query is covered by
test_oracle_parity (opic_priority)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.operators.opic import SCALE, opic


def _model_opic(edges, nodes, n_rounds, fetched):
    """Independent reference: dict-based exact OPIC with remainder-
    carrying virtual root."""
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    cash = {v: SCALE for v in nodes}
    hist = {v: 0 for v in nodes}
    carry = 0
    n = len(nodes)
    for r in range(n_rounds):
        f = {v for v in nodes if fetched(r, v)}
        pool = carry + sum(cash[v] for v in f if v not in out)
        share, carry = pool // n, pool % n
        gain = {v: 0 for v in nodes}
        new_cash = {}
        for v in nodes:
            if v in f:
                hist[v] += cash[v]
                if v in out:
                    per = cash[v] // len(out[v])
                    for d in out[v]:
                        gain[d] += per
                    new_cash[v] = cash[v] % len(out[v])
                else:
                    new_cash[v] = 0
            else:
                new_cash[v] = cash[v]
        cash = {v: new_cash[v] + gain[v] + share for v in nodes}
    return {v: (cash[v], hist[v]) for v in nodes}


def _spark_opic(spark, edges, nodes, n_rounds, parts=3):
    e = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    nd = spark.createDataFrame([(v,) for v in nodes], "node long")
    res = opic(
        e, nd, n_rounds, fetched_sql=lambda r: f"node % 3 = {r % 3}"
    )
    return {
        r["node"]: (r["cash_fp"], r["hist_fp"], r["importance_fp"])
        for r in res.collect()
    }


EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 4), (4, 3), (5, 0), (5, 1),
    (5, 2), (6, 6), (8, 0),
]
NODES = list(range(10))  # 7 and 9 dangling; 6 self-loop


def test_opic_bit_for_bit_vs_model(spark):
    got = _spark_opic(spark, EDGES, NODES, n_rounds=4)
    want = _model_opic(
        EDGES, NODES, 4, fetched=lambda r, v: v % 3 == r % 3
    )
    for v in NODES:
        c, h = want[v]
        assert got[v] == (c, h, c + h), v


def test_opic_cash_is_exactly_conserved(spark):
    # Σcash + root_carry == N·SCALE at every depth; the carry is what the
    # final state is missing
    for rounds in (1, 2, 5):
        got = _spark_opic(spark, EDGES, NODES, n_rounds=rounds)
        want = _model_opic(
            EDGES, NODES, rounds, fetched=lambda r, v: v % 3 == r % 3
        )
        model_cash = sum(c for c, _ in want.values())
        spark_cash = sum(c for c, _, _ in got.values())
        assert spark_cash == model_cash
        assert 0 <= len(NODES) * SCALE - spark_cash < len(NODES)


def test_opic_partitioning_invariance(spark):
    a = _spark_opic(spark, EDGES, NODES, n_rounds=3, parts=1)
    b = _spark_opic(spark, EDGES, NODES, n_rounds=3, parts=7)
    assert a == b


def test_opic_importance_prefers_linked_to(spark):
    # node 2 receives from 0,1,5; node 7 receives nothing and is dangling
    got = _spark_opic(spark, EDGES, NODES, n_rounds=6)
    assert got[2][2] > got[7][2]
