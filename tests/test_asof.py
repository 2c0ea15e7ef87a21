"""As-of join (operators/asof.py): tie inclusivity, LEFT nulls,
carry-forward correctness, and the union-tag plan shape (window, not a
probe-x-capture join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.operators.asof import asof_latest_capture


def _caps(spark):
    rows = [
        ("u1", 100, "c0", "d0"),
        ("u1", 200, "c1", "d1"),
        ("u1", 300, "c2", "d2"),
        ("u2", 500, "c0", "d9"),
    ]
    return spark.createDataFrame(
        rows, "url string, fetch_ts long, crawl string, digest string"
    )


def test_asof_semantics(spark):
    probes = spark.createDataFrame(
        [
            (1, "u1", 99),    # before first capture -> NULL
            (2, "u1", 200),   # exactly at a capture -> inclusive
            (3, "u1", 250),   # between captures -> latest earlier
            (4, "u1", 9999),  # after all -> last
            (5, "u2", 499),   # other key, before -> NULL
            (6, "u3", 100),   # key with no captures at all -> NULL
        ],
        "probe_id long, url string, ts long",
    )
    got = {
        r.probe_id: r
        for r in asof_latest_capture(_caps(spark), probes).collect()
    }
    assert len(got) == 6
    assert got[1].capture_ts is None and got[1].crawl is None
    assert got[2].capture_ts == 200 and got[2].crawl == "c1"
    assert got[3].capture_ts == 200 and got[3].digest == "d1"
    assert got[4].capture_ts == 300 and got[4].crawl == "c2"
    assert got[5].capture_ts is None
    assert got[6].capture_ts is None and got[6].digest is None


def test_asof_plan_is_windowed_not_joined(spark):
    """The as-of core must lower to Union + one url-keyed Window — never
    a probe-x-capture join (the quadratic-per-hot-key shape)."""
    probes = spark.createDataFrame(
        [(1, "u1", 250)], "probe_id long, url string, ts long"
    )
    plan = (
        asof_latest_capture(_caps(spark), probes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan and "Union" in plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join not in plan, join


def test_interval_point_join_semantics_and_plan(spark):
    from cc_crawl_statistics_spark.operators.asof import interval_point_join

    iv = spark.createDataFrame(
        [
            ("a", 100, 200),   # short, single bucket at W=3600
            ("b", 3500, 7300), # spans three buckets
        ],
        "iv_id string, start_s long, end_s long",
    )
    pts = spark.createDataFrame(
        [(1, 150), (2, 200), (3, 201), (4, 3600), (5, 7300), (6, 99)],
        "pid long, t long",
    )
    out = interval_point_join(iv, pts)
    got = sorted((r.pid, r.iv_id) for r in out.collect())
    # inclusive both ends; 3/6 outside; point 4+5 inside b's span
    assert got == [(1, "a"), (2, "a"), (4, "b"), (5, "b")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # bucketized rewrite must plan a HASH equi-join, never nested-loop
    assert "Join" in plan and "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_null_payload_row_consistency(spark):
    """A NULL field in the latest capture must come back NULL — whole-row
    semantics like SQL ASOF — never back-filled from an older capture."""
    caps = spark.createDataFrame(
        [("u1", 100, "c0", "d0"), ("u1", 200, "c1", None)],
        "url string, fetch_ts long, crawl string, digest string",
    )
    probes = spark.createDataFrame(
        [(1, "u1", 250)], "probe_id long, url string, ts long"
    )
    r = asof_latest_capture(caps, probes).collect()[0]
    assert r.capture_ts == 200 and r.crawl == "c1"
    assert r.digest is None  # NOT 'd0'


def test_asof_null_key_never_matches(spark):
    """SQL equality: NULL-key probes and NULL-key captures never pair."""
    caps = spark.createDataFrame(
        [(None, 100, "c0", "d0"), ("u1", 100, "c1", "d1")],
        "url string, fetch_ts long, crawl string, digest string",
    )
    probes = spark.createDataFrame(
        [(1, None, 250), (2, "u1", 250)],
        "probe_id long, url string, ts long",
    )
    got = {r.probe_id: r for r in asof_latest_capture(caps, probes).collect()}
    assert got[1].capture_ts is None and got[1].crawl is None
    assert got[2].crawl == "c1"


def test_asof_random_vs_pandas_merge_asof(spark):
    """Seeded random battery vs an independent first-class model:
    pandas.merge_asof(direction='backward', allow_exact_matches=True)
    must agree row-for-row, including NULL payload fields and probes on
    keys with no captures. (url, t) capture collisions are excluded —
    tie choice is implementation-defined in both engines."""
    import random

    import pandas as pd

    rng = random.Random(0xA50F)
    seen, caps = set(), []
    for i in range(400):
        k, t = f"u{rng.randrange(40)}", rng.randrange(1000)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        caps.append((k, t, f"c{i}", None if rng.random() < 0.1 else f"d{i}"))
    probes = [
        (i, f"u{rng.randrange(44)}", rng.randrange(1050)) for i in range(300)
    ]
    got = (
        asof_latest_capture(
            spark.createDataFrame(
                caps, "url string, fetch_ts long, crawl string, digest string"
            ),
            spark.createDataFrame(
                probes, "probe_id long, url string, ts long"
            ),
        )
        .toPandas()
        .set_index("probe_id")
        .sort_index()
    )
    cdf = pd.DataFrame(
        caps, columns=["url", "fetch_ts", "crawl", "digest"]
    ).sort_values("fetch_ts")
    pdf = pd.DataFrame(probes, columns=["probe_id", "url", "ts"]).sort_values(
        "ts"
    )
    want = (
        pd.merge_asof(
            pdf,
            cdf,
            left_on="ts",
            right_on="fetch_ts",
            by="url",
            direction="backward",
            allow_exact_matches=True,
        )
        .set_index("probe_id")
        .sort_index()
    )
    assert len(got) == len(want) == 300
    for pid in want.index:
        g, w = got.loc[pid], want.loc[pid]
        wct = None if pd.isna(w.fetch_ts) else int(w.fetch_ts)
        gct = None if pd.isna(g.capture_ts) else int(g.capture_ts)
        assert gct == wct, (pid, gct, wct)
        for c in ("crawl", "digest"):
            gv = None if pd.isna(g[c]) else g[c]
            wv = None if pd.isna(w[c]) else w[c]
            assert gv == wv, (pid, c, gv, wv)


def test_interval_join_random_vs_bruteforce(spark):
    from cc_crawl_statistics_spark.operators.asof import interval_point_join
    import random

    rng = random.Random(0xBEEF)
    iv = [
        (i, a, a + rng.randrange(0, 9000))
        for i, a in ((i, rng.randrange(50000)) for i in range(200))
    ]
    pts = [(j, rng.randrange(60000)) for j in range(300)]
    got = sorted(
        (r.pid, r.iv_id)
        for r in interval_point_join(
            spark.createDataFrame(
                iv, "iv_id long, start_s long, end_s long"
            ),
            spark.createDataFrame(pts, "pid long, t long"),
            bucket_s=1024,
        ).collect()
    )
    want = sorted(
        (p, i) for i, a, b in iv for p, t in pts if a <= t <= b
    )
    assert got == want and len(want) > 100
