"""Fetcher-fleet capacity planning (frontier/capacity.py) and the
leakage-safe split (operators/sampling.py): ring determinism, the
consistent-hashing resize invariant, makespan semantics, and the
no-domain-straddles-splits invariant."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cc_crawl_statistics_spark.frontier import capacity as C
from cc_crawl_statistics_spark.frontier.scheduler import (
    first_round_schedule,
    host_ledger,
    url_universe,
)
from cc_crawl_statistics_spark.operators.sampling import (
    leakage_safe_split,
    split_summary,
)
from cc_crawl_statistics_spark.sources.tables import pages_df

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, SF_SMOKE)


def test_point32_matches_python_md5(spark):
    vals = ["example.com", "www.site3.de", "vn:0:0", "a"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"]).select(
        "s", C.point32(F.col("s")).alias("p")
    )
    got = {r.s: r.p for r in df.collect()}
    for v in vals:
        exp = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
        assert got[v] == exp


def test_ring_sorted_distinct_and_deterministic():
    ring = C.ring_points(4, 16)
    assert ring == C.ring_points(4, 16)
    pts = [p for p, _ in ring]
    assert pts == sorted(pts)
    assert len(set(pts)) == len(pts)
    assert {f for _, f in ring} == {0, 1, 2, 3}


def test_assignment_is_ring_successor(spark):
    """Spark assignment == independent Python successor-on-ring model."""
    hosts = [f"h{i}.example" for i in range(200)]
    ring = C.ring_points(4, 16)
    pts = [p for p, _ in ring]

    def model(h: str) -> int:
        hp = int(hashlib.md5(h.encode()).hexdigest()[:8], 16)
        for p, f in ring:
            if p >= hp:
                return f
        return ring[0][1]

    df = C.assign_fetchers(
        spark.createDataFrame([(h,) for h in hosts], ["host"]), 4, 16
    )
    got = {r.host: r.fetcher for r in df.collect()}
    assert got == {h: model(h) for h in hosts}
    # ring points span well below/above some host points so both the
    # successor and the wrap branch are exercised
    hps = [int(hashlib.md5(h.encode()).hexdigest()[:8], 16) for h in hosts]
    assert min(hps) < min(pts) or max(hps) > max(pts)


def test_fleet_resize_moves_hosts_only_to_new_fetcher(spark):
    """THE consistent-hashing contract: growing the fleet N -> N+1 may
    reassign a host only to the NEW fetcher — never between survivors —
    and most hosts do not move at all."""
    hosts_df = spark.createDataFrame(
        [(f"h{i}.example",) for i in range(500)], ["host"]
    )
    a4 = {
        r.host: r.fetcher
        for r in C.assign_fetchers(hosts_df, 4, 16).collect()
    }
    a5 = {
        r.host: r.fetcher
        for r in C.assign_fetchers(hosts_df, 5, 16).collect()
    }
    moved = [h for h in a4 if a4[h] != a5[h]]
    assert all(a5[h] == 4 for h in moved)
    # expected ~1/5 of hosts move; allow generous slack either way
    assert 0 < len(moved) < 250


def test_fetcher_load_conserves_schedule(spark, pages):
    sched = first_round_schedule(pages)
    load = C.fetcher_load(sched, 4, 16).collect()
    assert sum(r.n_urls for r in load) == sched.count()
    assert sum(r.n_hosts for r in load) == sched.select(
        "host"
    ).distinct().count()
    assert 900 <= sum(r.load_permille for r in load) <= 1000


def test_round_makespan_semantics(spark, pages):
    sched = first_round_schedule(pages)
    ledger = host_ledger(url_universe(pages))
    ms = C.round_makespan(sched, ledger, 4, 16).collect()
    # critical flags exactly the max-busy fetchers
    busiest = max(r.busy_ms for r in ms)
    assert all(r.critical == (r.busy_ms == busiest) for r in ms)
    # busy = sum of per-host chains, recomputed independently
    led = {r.host: r.max_per_round for r in ledger.collect()}
    per_host: dict[str, int] = {}
    for r in sched.collect():
        per_host[r.host] = per_host.get(r.host, 0) + 1
    ring = C.ring_points(4, 16)

    def fetcher_of(h: str) -> int:
        hp = int(hashlib.md5(h.encode()).hexdigest()[:8], 16)
        for p, f in ring:
            if p >= hp:
                return f
        return ring[0][1]

    busy: dict[int, int] = {}
    for h, n in per_host.items():
        busy.setdefault(fetcher_of(h), 0)
        busy[fetcher_of(h)] += n * (60_000 // led[h])
    assert {r.fetcher: r.busy_ms for r in ms} == busy


def test_leakage_split_invariant_and_buckets(spark, pages):
    assigned = leakage_safe_split(pages, "domain")
    # no domain in two splits
    worst = (
        assigned.groupBy("domain")
        .agg(F.countDistinct("split").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert worst == 1
    # bucket and split match an independent Python recomputation
    for r in assigned.select("domain", "unit_bucket", "split").distinct().collect():
        b = int(hashlib.md5(r.domain.encode()).hexdigest()[:8], 16) % 1000
        assert r.unit_bucket == b
        assert r.split == (
            "train" if b < 800 else "valid" if b < 900 else "test"
        )


def test_split_summary_rollup(spark, pages):
    rows = split_summary(pages, "domain").collect()
    assert {r.split for r in rows} <= {"train", "valid", "test"}
    assert all(r.max_splits_per_unit == 1 for r in rows)
    assert sum(r.n_rows for r in rows) == pages.count()
    assert 900 <= sum(r.share_permille for r in rows) <= 1000


def test_schedule_fairness_hand_computed(spark):
    """Jain's index floor(1000·(Σx)²/(n·Σx²)) recomputed in Python at
    host grain; an equal allocation reads exactly 1000."""
    rows = [("h%d.x" % i, "u%d" % j) for i, n in enumerate([1, 2, 3, 6])
            for j in range(n)]
    sched = spark.createDataFrame(rows, ["host", "url"])
    got = C.schedule_fairness(sched, 4, 16).first()
    xs = [1, 2, 3, 6]
    assert got.n_hosts == 4
    assert got.jain_host_x1000 == (1000 * sum(xs) ** 2) // (
        len(xs) * sum(x * x for x in xs)
    )
    equal = spark.createDataFrame(
        [("h%d.x" % i, "u%d" % j) for i in range(5) for j in range(3)],
        ["host", "url"],
    )
    eq = C.schedule_fairness(equal, 4, 16).first()
    assert eq.jain_host_x1000 == 1000


def test_maxmin_fair_hand_computed(spark):
    # one shard, B=10, demands 1,2,3,9: full prefix j=2 (1+2 satisfied,
    # then 3*2+3=9<=10-0? predicate: S_i + d_i*(k-i): i=3 -> 6+3*1=9<=10
    # so j=3, R=10-6=4, m=1, host d=9 gets 4.
    d = spark.createDataFrame(
        [("h1", 1), ("h2", 2), ("h3", 3), ("h4", 9)], "host string, demand int"
    ).withColumn("fetcher", F.lit(0))
    got = {
        r["host"]: r["alloc"]
        for r in C.maxmin_fair_allocation(d, 10).collect()
    }
    assert got == {"h1": 1, "h2": 2, "h3": 3, "h4": 4}
    # oversubscribed equal split with remainder: B=10 over demands 4,4,4
    # -> base 3, first (by host order) gets the +1
    e = spark.createDataFrame(
        [("a", 4), ("b", 4), ("c", 4)], "host string, demand int"
    ).withColumn("fetcher", F.lit(0))
    got = {
        r["host"]: r["alloc"]
        for r in C.maxmin_fair_allocation(e, 10).collect()
    }
    assert got == {"a": 4, "b": 3, "c": 3}
    # undersubscribed: everyone satisfied
    got = {
        r["host"]: r["alloc"]
        for r in C.maxmin_fair_allocation(e, 100).collect()
    }
    assert got == {"a": 4, "b": 4, "c": 4}


def test_maxmin_fair_invariants_per_shard(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"host{i}.example", rng.randint(1, 40), i % 3) for i in range(60)
    ]
    d = spark.createDataFrame(rows, "host string, demand int, fetcher int")
    out = C.maxmin_fair_allocation(d, 200).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["fetcher"], []).append(r)
    assert len(out) == 60
    for shard, rs in by_shard.items():
        total_d = sum(r["demand"] for r in rs)
        total_a = sum(r["alloc"] for r in rs)
        assert total_a == min(200, total_d), shard
        assert all(0 <= r["alloc"] <= r["demand"] for r in rs)
        # water-level property: every capped host sits within 1 unit of
        # every other capped host, and above every fully-served demand
        capped = [r["alloc"] for r in rs if r["alloc"] < r["demand"]]
        served = [r["demand"] for r in rs if r["alloc"] == r["demand"]]
        if capped:
            assert max(capped) - min(capped) <= 1
            assert not served or max(served) <= max(capped) + 1
