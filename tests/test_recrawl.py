"""Adaptive recrawl scheduling tests (operators/recrawl.py): hand-computed
change rates over a 5-crawl history, repeat-fetch collapse (last digest of
the crawl wins), and tier boundaries."""

from __future__ import annotations

from cc_crawl_statistics_spark.operators import recrawl as RC


def _pages(spark, rows):
    # (url, crawl_id, fetch_ts, digest)
    return spark.createDataFrame(rows, ["url", "crawl_id", "fetch_ts", "digest"])


def test_change_rates_hand_computed(spark):
    rows = (
        # hot: changes on every of its 4 transitions → 1000‰
        [(f"u/hot", c, c * 10, f"d{c}") for c in range(5)]
        # warm: 1 change in 4 transitions → 250‰
        + [("u/warm", c, c * 10, "d0" if c < 3 else "d1") for c in range(5)]
        # cold: never changes → 0‰
        + [("u/cold", c, c * 10, "same") for c in range(5)]
        # new: single observation → unknown
        + [("u/new", 2, 20, "only")]
    )
    got = {
        r["url"]: (r["n_obs"], r["n_changes"], r["change_permille"])
        for r in RC.url_change_rates(_pages(spark, rows)).collect()
    }
    assert got["u/hot"] == (5, 4, 1000)
    assert got["u/warm"] == (5, 1, 250)
    assert got["u/cold"] == (5, 0, 0)
    assert got["u/new"] == (1, 0, None)
    tiers = {
        r["url"]: r["tier"]
        for r in RC.recrawl_tiers(_pages(spark, rows)).collect()
    }
    assert tiers == {
        "u/hot": "hot",
        "u/warm": "warm",
        "u/cold": "cold",
        "u/new": "new",
    }


def test_repeat_fetches_collapse_to_last_digest(spark):
    rows = [
        # crawl 0 fetched twice: early digest dA, later dB → dB counts
        ("u", 0, 100, "dA"),
        ("u", 0, 200, "dB"),
        # crawl 1: dB again → NO change across crawls
        ("u", 1, 300, "dB"),
    ]
    got = RC.url_change_rates(_pages(spark, rows)).first()
    assert (got["n_obs"], got["n_changes"], got["change_permille"]) == (2, 0, 0)


def test_tier_boundaries_exact(spark):
    # 499‰ vs 500‰ and 99‰ vs 100‰ — integer floor division semantics:
    # 1 change / 3 transitions = 333‰ (warm); 2/4 = 500‰ (hot, inclusive);
    # 1/11 = 90‰ (cold)
    rows = (
        [("u/333", c, c, "x" if c < 3 else "y") for c in range(4)]
        + [("u/500", c, c, f"v{c // 2}") for c in range(5)]
        + [("u/90", c, c, "x" if c < 11 else "y") for c in range(12)]
    )
    tiers = {
        r["url"]: (r["change_permille"], r["tier"])
        for r in RC.recrawl_tiers(_pages(spark, rows)).collect()
    }
    assert tiers["u/333"] == (333, "warm")
    assert tiers["u/500"] == (500, "hot")
    assert tiers["u/90"] == (90, "cold")


def test_revalidation_plan_hand_computed(spark):
    from cc_crawl_statistics_spark.operators.recrawl import (
        revalidation_plan,
    )

    # host h: u1 validator+stable (conditional), u2 validator+1-of-3
    #   transitions changed = 333 permille (risky; 1-of-2 = exactly 500
    #   would classify unconditional — the boundary is exclusive),
    #   u3 no validator (unconditional),
    #   u4 validator but single capture (unconditional),
    #   u5 validator but changes every crawl (unconditional)
    rows = []
    for crawl, dig2, dig5 in ((0, "a", "x"), (1, "a", "y"), (2, "b", "z")):
        rows += [
            ("u1", "h", crawl, 100 + crawl, "d1", True),
            ("u2", "h", crawl, 100 + crawl, dig2, True),
            ("u3", "h", crawl, 100 + crawl, "d3", False),
            ("u5", "h", crawl, 100 + crawl, dig5, True),
        ]
    rows.append(("u2", "h", 3, 103, "b", True))
    rows.append(("u4", "h", 2, 500, "d4", True))
    pages = spark.createDataFrame(
        rows,
        "url string, host string, crawl_id int, fetch_ts long,"
        " digest string, has_validator boolean",
    )
    got = revalidation_plan(pages).collect()
    assert len(got) == 1
    r = got[0]
    assert (
        r["n_urls"], r["n_conditional"], r["n_risky"], r["n_unconditional"]
    ) == (5, 1, 1, 3)
    assert r["conditional_permille"] == 400


def test_refresh_round_plan_invariants(spark, sf_smoke_pages=None):
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.operators.recrawl import (
        refresh_round_plan,
    )
    from cc_crawl_statistics_spark.sources.tables import pages_df
    from tests.conftest import SF_SMOKE

    pages = pages_df(spark, SF_SMOKE).withColumns(
        {
            "digest": F.concat(
                F.col("digest"),
                F.lit(":"),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.col("crawl_id").cast("string"),
                ).otherwise(F.lit("0")),
            ),
            "has_validator": F.col("doc_id") % 4 != 1,
        }
    )
    budget = 25
    plan = refresh_round_plan(pages, budget_per_fetcher=budget).collect()
    assert plan
    per_fetcher: dict[int, int] = {}
    assert any(r["alloc"] == 0 for r in plan)  # zeroed hosts stay visible
    for r in plan:
        assert r["n_scheduled"] == r["alloc"] >= 0
        assert r["alloc"] <= r["n_due"]
        assert 0 <= r["n_conditional"] <= r["n_scheduled"]
        per_fetcher[r["fetcher"]] = (
            per_fetcher.get(r["fetcher"], 0) + r["n_scheduled"]
        )
    # no shard exceeds its round budget
    assert all(v <= budget for v in per_fetcher.values())
    # contention is real at this fixture scale: every shard fully spent
    assert all(v == budget for v in per_fetcher.values())
