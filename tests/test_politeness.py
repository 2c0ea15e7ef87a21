"""Token-bucket politeness gate: batch fold semantics vs a pure-Python
model, stream==batch bit-for-bit equivalence, and the codegen-only plan
shape of the batch path."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.frontier.politeness import (
    token_bucket_gate,
    token_bucket_stream,
)
from cc_crawl_statistics_spark.sources.tables import pages_df
from tests.conftest import SF_SMOKE


def _model(events, capacity=1800, refill=1, cost=1000):
    """Reference fold: events = [(host, ts, url)] in any order."""
    out = {}
    by_host: dict[str, list[tuple[int, str]]] = {}
    for host, ts, url in events:
        by_host.setdefault(host, []).append((ts, url))
    for host, evs in by_host.items():
        tokens, last = capacity, None
        for ts, url in sorted(evs):
            if last is not None:
                tokens = min(capacity, tokens + (ts - last) * refill)
            last = ts
            admitted = tokens >= cost
            if admitted:
                tokens -= cost
            out[(host, url, ts)] = (admitted, tokens)
    return out


EVENTS = [
    # burst of three 1s apart: 1st admitted (800 left), 2nd denied
    # (801 < 1000), 3rd denied (802)
    ("a.com", 1000, "http://a.com/1"),
    ("a.com", 1001, "http://a.com/2"),
    ("a.com", 1002, "http://a.com/3"),
    # refill to exactly cost: 802 + 198 = 1000 -> admitted, 0 left
    ("a.com", 1200, "http://a.com/4"),
    # one second short: 0 + 999 = 999 -> denied
    ("a.com", 2199, "http://a.com/5"),
    # long idle clamps at capacity (not capacity + surplus): admitted, 800
    ("a.com", 100000, "http://a.com/6"),
    # independent host: bucket starts full
    ("b.com", 1001, "http://b.com/1"),
    # tie on ts broken by url: /a admitted first, /b denied
    ("c.com", 500, "http://c.com/b"),
    ("c.com", 500, "http://c.com/a"),
]


def test_batch_gate_matches_model(spark):
    df = spark.createDataFrame(
        EVENTS, "host string, fetch_ts long, url string"
    )
    got = {
        (r.host, r.url, r.fetch_ts): (r.admitted, r.tokens_after)
        for r in token_bucket_gate(df).collect()
    }
    assert got == _model(EVENTS)
    # spot-pin the edge verdicts the fixture was built around
    assert got[("a.com", "http://a.com/2", 1001)] == (False, 801)
    assert got[("a.com", "http://a.com/4", 1200)] == (True, 0)
    assert got[("a.com", "http://a.com/5", 2199)] == (False, 999)
    assert got[("a.com", "http://a.com/6", 100000)] == (True, 800)
    assert got[("c.com", "http://c.com/a", 500)] == (True, 800)
    assert got[("c.com", "http://c.com/b", 500)] == (False, 800)


def test_batch_gate_on_pages_is_conservation_exact(spark):
    """On the sf0.001 pages fixture: every row gets a verdict, admitted +
    denied = total, and token balances never go negative or above
    capacity."""
    pages = pages_df(spark, SF_SMOKE)
    gated = token_bucket_gate(pages)
    agg = gated.agg(
        F.count("*").alias("n"),
        F.sum(F.col("admitted").cast("long")).alias("adm"),
        F.min("tokens_after").alias("lo"),
        F.max("tokens_after").alias("hi"),
    ).collect()[0]
    assert agg.n == pages.count()
    assert 0 < agg.adm < agg.n  # the fixture exercises both verdicts
    assert agg.lo >= 0 and agg.hi <= 1800


def test_pandas_impl_matches_fold(spark):
    """The linear big-host path (applyInPandas) and the codegen fold give
    identical verdicts on the pages fixture."""
    pages = pages_df(spark, SF_SMOKE)
    key = lambda r: (r.host, r.url, r.fetch_ts)  # noqa: E731
    fold = {key(r): (r.admitted, r.tokens_after)
            for r in token_bucket_gate(pages).collect()}
    pand = {key(r): (r.admitted, r.tokens_after)
            for r in token_bucket_gate(pages, impl="pandas").collect()}
    assert fold == pand


def test_batch_plan_is_jvm_only(spark):
    df = spark.createDataFrame(
        EVENTS, "host string, fetch_ts long, url string"
    )
    plan = token_bucket_gate(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python UDF in the batch path
    # exactly the one unavoidable exchange: the groupBy(host)
    assert plan.count("Exchange") <= 2  # agg partial/final pair


def test_stream_matches_batch_bit_for_bit(spark, tmp_path):
    pages = pages_df(spark, SF_SMOKE).select("host", "fetch_ts", "url")
    src = str(tmp_path / "fetches")
    pages.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("host string, fetch_ts long, url string")
        .parquet(src)
    )
    out = token_bucket_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("bucket_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.host, r.url, r.fetch_ts): (r.admitted, r.tokens_after)
        for r in spark.sql("SELECT * FROM bucket_out").collect()
    }
    want = {
        (r.host, r.url, r.fetch_ts): (r.admitted, r.tokens_after)
        for r in token_bucket_gate(pages).collect()
    }
    assert got == want


def test_per_host_params_override(spark):
    """The params frame overrides refill per host: a refill of 1000
    mtok/s re-admits the 1s burst the global rate denies; hosts missing
    from params keep the default."""
    df = spark.createDataFrame(EVENTS, "host string, fetch_ts long, url string")
    params = spark.createDataFrame(
        [("a.com", 1000)], "host string, refill_mtok_per_s long"
    )
    got = {
        (r.host, r.url): r.admitted
        for r in token_bucket_gate(df, params=params).collect()
    }
    assert got[("a.com", "http://a.com/2")]  # denied under rf=1
    assert got[("a.com", "http://a.com/3")]
    # c.com untouched: tie-ordered second request still denied
    assert not got[("c.com", "http://c.com/b")]


def test_adaptive_contrast_on_fixture(spark):
    """End-to-end loop: exactly the echo cohort (hosts that demonstrably
    sustained 1s gaps) gets its denials lifted; no host denies more
    under the adaptive gate than under the fixed one."""
    from cc_crawl_statistics_spark.plans.pipeline_queries import (
        q_adaptive_token_bucket,
    )

    rows = q_adaptive_token_bucket(spark, SF_SMOKE).collect()
    assert all(r.denied_adaptive <= r.denied_fixed for r in rows)
    lifted = [r for r in rows if r.denied_fixed > r.denied_adaptive]
    assert lifted and all(r.refill_mtok_per_s == 1000 for r in lifted)
    assert sum(r.denied_adaptive for r in rows) == 0  # fixture has no
    # host that keeps denying once paced by its own observed gaps


def test_server_pressure_backoff_tiers(spark):
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.frontier.politeness import (
        server_pressure_backoff,
    )

    rows = (
        [("calm", 200)] * 10
        + [("warm", 503)] * 2 + [("warm", 200)] * 8      # 200 permille
        + [("hot", 429)] * 4 + [("hot", 200)] * 6        # 400 permille
        + [("down", 503)] * 7 + [("down", 200)] * 3      # 700 permille
        + [("soft404", 404)] * 10                        # 404 is not pressure
    )
    pages = spark.createDataFrame(rows, "host string, status int")
    ledger = spark.createDataFrame(
        [("calm", 8), ("warm", 8), ("hot", 8), ("down", 8), ("soft404", 8)],
        "host string, max_per_round int",
    )
    got = {
        r["host"]: (r["pressure_permille"], r["backoff_budget"])
        for r in server_pressure_backoff(pages, ledger).collect()
    }
    assert got == {
        "calm": (0, 8),
        "warm": (200, 4),
        "hot": (400, 2),
        "down": (700, 1),
        "soft404": (0, 8),
    }
    # budget never drops below 1 even with a tiny ledger budget
    tiny = spark.createDataFrame(
        [("hot", 1), ("warm", 1), ("down", 1), ("calm", 1), ("soft404", 1)],
        "host string, max_per_round int",
    )
    got = {
        r["host"]: r["backoff_budget"]
        for r in server_pressure_backoff(pages, tiny).collect()
    }
    assert all(v == 1 for v in got.values())
