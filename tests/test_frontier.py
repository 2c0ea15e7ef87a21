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


def test_round_stats_semantics(spark, store):
    """Pins the documented one-fetch-per-URL-per-round stats semantics:
    pages == urls on EVERY row (a deduplicating frontier fetches each
    scheduled URL exactly once per round), the size row equals the
    schedule count, each histogram's pages sum to the schedule count, and
    the http_status histogram reflects the scheduled URLs' earliest-fetch
    attributes (url_universe min_by) exactly."""
    scheduler.run_round(spark, store, SF_SMOKE)
    stats = store.read(spark, 1, "round_stats").toPandas()
    sched = store.read(spark, 1, "schedule").toPandas()
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
    # one fetch per scheduled URL per round
    assert (stats.pages == stats.urls).all()
    g = stats[stats.type == "size"]
    assert len(g) == 1 and int(g.pages.iloc[0]) == len(sched)
    for typ in ("host", "tld", "http_status"):
        hist = stats[stats.type == typ]
        assert int(hist.pages.sum()) == len(sched), typ
    # attribute fidelity: the status histogram equals the earliest-fetch
    # status of each scheduled URL, recomputed independently from pages
    from cc_crawl_statistics_spark.sources.tables import pages_df

    expected = (
        scheduler.url_universe(pages_df(spark, SF_SMOKE))
        .join(
            spark.createDataFrame(sched[["url"]]), "url", "left_semi"
        )
        .groupBy("status")
        .count()
        .toPandas()
        .set_index("status")["count"]
        .to_dict()
    )
    got = (
        stats[stats.type == "http_status"]
        .assign(key=lambda d: d.key.astype(int))
        .set_index("key")["pages"]
        .to_dict()
    )
    assert got == expected


def test_compaction_and_bloom_bit_identical(spark, tmp_path):
    """Seen-set compaction + the materialized Bloom prefilter change the
    physical plan, never the results: running with compact_every=1 (a
    compacted base + Bloom from round 1 on) produces bit-identical
    schedules and seen sets to the uncompacted store, and round dirs hold
    the base/bloom artifacts."""
    import os

    a = SnapshotStore(str(tmp_path / "plain"))
    b = SnapshotStore(str(tmp_path / "compacted"))
    c = SnapshotStore(str(tmp_path / "cuckoo"))
    for rnd in range(1, 4):
        scheduler.run_round(spark, a, SF_SMOKE, compact_every=0)
        # bloom_min_seen=0 forces the prefilter path at fixture scale
        # (the default engages it only past 10^7 seen keys)
        scheduler.run_round(
            spark, b, SF_SMOKE, compact_every=1, bloom_min_seen=0
        )
        scheduler.run_round(
            spark, c, SF_SMOKE, compact_every=1, bloom_min_seen=0,
            prefilter="cuckoo",
        )
        assert schedule_rows(spark, a, rnd) == schedule_rows(spark, b, rnd)
        assert schedule_rows(spark, a, rnd) == schedule_rows(spark, c, rnd)
    assert b.seen_base_round(3) == 3
    assert b.bloom_path(3) is not None
    assert b.prefilter_path(3)[0] == "bloom"
    assert c.prefilter_path(3)[0] == "cuckoo"
    assert os.path.exists(os.path.join(b.root, "round=0002", "url_seen_base"))
    seen_a = {r.seen_key for r in a.read_seen(spark, 3).collect()}
    seen_b = {r.seen_key for r in b.read_seen(spark, 3).collect()}
    seen_c = {r.seen_key for r in c.read_seen(spark, 3).collect()}
    assert seen_a == seen_b == seen_c


def test_reopen_seen_for_recrawl(spark, tmp_path):
    """reopen_seen subtracts re-opened keys from the seen set (until a
    later delta re-adds them) and drops them from a materialized cuckoo
    prefilter shard-locally — the recrawl re-open path."""
    from cc_crawl_statistics_spark.frontier.shardedfilter import (
        contains_shards,
    )

    store = SnapshotStore(str(tmp_path / "s"))
    scheduler.run_round(
        spark, store, SF_SMOKE, compact_every=1, bloom_min_seen=0,
        prefilter="cuckoo",
    )
    scheduler.run_round(spark, store, SF_SMOKE, compact_every=0)
    base_keys = sorted(
        r.seen_key for r in store.read_seen(spark, 1).collect()
    )
    victims = base_keys[:5]
    seen_before = {r.seen_key for r in store.read_seen(spark, 2).collect()}
    store.reopen_seen(
        spark, 2,
        spark.createDataFrame([(k,) for k in victims], "seen_key bigint"),
    )
    seen_after = {r.seen_key for r in store.read_seen(spark, 2).collect()}
    assert seen_after == seen_before - set(victims)
    # cuckoo prefilter dropped the keys in place (bloom would stay stale
    # but correct; the cuckoo makes the reopened keys take the clean path)
    import numpy as np

    kind, path = store.prefilter_path(2)
    assert kind == "cuckoo"
    assert not contains_shards(path, np.array(victims, dtype=np.int64)).any()
    remaining = np.array(
        [k for k in base_keys if k not in victims], dtype=np.int64
    )
    assert contains_shards(path, remaining).all()
    # a later delta re-adding a reopened key wins over the reopen
    import os as _os

    d3 = _os.path.join(store.root, "round=0003")
    _os.makedirs(d3, exist_ok=True)
    spark.createDataFrame(
        [(victims[0],)], "seen_key bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        _os.path.join(d3, "url_seen_delta")
    )
    seen3 = {r.seen_key for r in store.read_seen(spark, 3).collect()}
    assert victims[0] in seen3
    assert not any(v in seen3 for v in victims[1:])


def test_reopen_for_recrawl_glue(spark, tmp_path):
    """The adaptive-recrawl glue re-opens exactly the due-tier URLs that
    are in the seen set (canonical seen keys, deduplicated)."""
    from cc_crawl_statistics_spark.frontier.scheduler import (
        reopen_for_recrawl,
        seen_key,
    )
    from cc_crawl_statistics_spark.operators.recrawl import recrawl_tiers
    from cc_crawl_statistics_spark.sources.tables import pages_df

    store = SnapshotStore(str(tmp_path / "s"))
    scheduler.run_round(
        spark, store, SF_SMOKE, compact_every=1, bloom_min_seen=0,
        prefilter="cuckoo",
    )
    pages = pages_df(spark, SF_SMOKE)
    before = {r.seen_key for r in store.read_seen(spark, 1).collect()}
    n = reopen_for_recrawl(spark, store, 1, pages, tiers=("cold",))
    after = {r.seen_key for r in store.read_seen(spark, 1).collect()}
    due_keys = {
        r.k
        for r in recrawl_tiers(pages)
        .filter(F.col("tier") == "cold")
        .select(seen_key(F.col("url")).alias("k"))
        .distinct()
        .collect()
    }
    assert n == len(due_keys)
    assert after == before - due_keys
    assert len(after) < len(before)


def test_legacy_blob_prefilter_migrates_on_touch(spark, tmp_path):
    """A pre-sharding store (single-blob ``url_seen_*.npy`` prefilter) is
    rebuilt as a SHARDED filter from its base parquet the first time the
    engine touches it — via migrate_prefilter at the scheduler's UDF seam
    and inside reopen_seen — and the blob is removed, so the retired
    driver-merge format can never reach an executor. The rebuilt filter
    keeps the no-false-negative contract over the base keys."""
    import numpy as np

    from cc_crawl_statistics_spark.frontier.shardedfilter import (
        contains_shards,
        is_sharded,
    )

    store = SnapshotStore(str(tmp_path / "s"))
    scheduler.run_round(
        spark, store, SF_SMOKE, compact_every=1, bloom_min_seen=0,
        prefilter="cuckoo",
    )
    kind, path = store.prefilter_path(1)
    assert kind == "cuckoo" and is_sharded(path)
    rdir = os.path.dirname(path)
    # simulate the legacy layout: drop the sharded dir, leave a blob
    # (content never read — migration rebuilds from the base parquet)
    shutil.rmtree(path)
    legacy = os.path.join(rdir, "url_seen_cuckoo.npy")
    with open(legacy, "wb") as f:
        np.save(f, np.zeros(3, dtype=np.int64))
    assert store.prefilter_path(1)[1] == legacy

    kind2, path2 = store.migrate_prefilter(spark, 1)
    assert kind2 == "cuckoo" and is_sharded(path2)
    assert not os.path.exists(legacy)
    base_keys = np.array(
        sorted(r.seen_key for r in store.read_seen(spark, 1).collect()),
        dtype=np.int64,
    )
    assert contains_shards(path2, base_keys).all()

    # reopen_seen on a legacy layout migrates too, then shard-deletes
    shutil.rmtree(path2)
    with open(legacy, "wb") as f:
        np.save(f, np.zeros(3, dtype=np.int64))
    victims = base_keys[:5]
    store.reopen_seen(
        spark, 1,
        spark.createDataFrame([(int(k),) for k in victims],
                              "seen_key bigint"),
    )
    kind3, path3 = store.prefilter_path(1)
    assert kind3 == "cuckoo" and is_sharded(path3)
    assert not os.path.exists(legacy)
    assert not contains_shards(path3, victims).any()
    rest = np.array(sorted(set(base_keys) - set(victims)), dtype=np.int64)
    assert contains_shards(path3, rest).all()


def test_resume_legacy_store_without_universe(spark, store):
    """Stores committed before the persisted-universe format resume via
    the recompute fallback instead of failing (ADVICE r1): delete the
    round-0 universe table and n_docs/n_seen metrics, then run a round."""
    import json
    import shutil as sh

    st = model.seed(N_DOCS)
    scheduler.run_round(spark, store, SF_SMOKE)
    model.run_round(st)
    # simulate a legacy layout
    sh.rmtree(os.path.join(store.root, "round=0000", "universe"))
    for rnd in ("round=0000", "round=0001"):
        mpath = os.path.join(store.root, rnd, MANIFEST)
        with open(mpath) as f:
            man = json.load(f)
        man["metrics"].pop("n_docs", None)
        man["metrics"].pop("n_seen", None)
        with open(mpath, "w") as f:
            json.dump(man, f)
    scheduler.run_round(spark, store, SF_SMOKE)
    msched = model.run_round(st)
    assert schedule_rows(spark, store, 2) == model_rows(msched)


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


def test_commit_resolves_multi_level_derived_tables(spark, tmp_path):
    """state.commit derived-table waves: a callable chain a -> b -> c
    resolves across waves regardless of dict order, each level reads the
    previous level's written parquet, and a circular chain raises instead
    of hanging."""
    store = SnapshotStore(str(tmp_path / "s"))
    base = spark.range(10).toDF("x")
    store.commit(
        0,
        {
            # insertion order deliberately reversed vs dependency order
            "c": lambda read: read("b").withColumn("x", F.col("x") + 1),
            "b": lambda read: read("a").withColumn("x", F.col("x") + 1),
            "a": base,
        },
        {"round": 0},
    )
    a = {r.x for r in store.read(spark, 0, "a").collect()}
    b = {r.x for r in store.read(spark, 0, "b").collect()}
    c = {r.x for r in store.read(spark, 0, "c").collect()}
    assert a == set(range(10))
    assert b == {x + 1 for x in a}
    assert c == {x + 2 for x in a}

    store2 = SnapshotStore(str(tmp_path / "s2"))
    with pytest.raises(ValueError, match="circular"):
        store2.commit(
            0,
            {
                "p": lambda read: read("q"),
                "q": lambda read: read("p"),
            },
            {"round": 0},
        )


def test_rediscovery_after_reopen_survives_old_retire(spark, tmp_path):
    """A URL scheduled at round r, re-opened for recrawl, then
    RE-DISCOVERED at round d > r must not be swallowed by round r's
    schedule retire list when read_frontier reconstructs base+deltas
    (retires are round-aware: a retire list only applies to pending rows
    discovered before it was written)."""
    import os as _os

    store = SnapshotStore(str(tmp_path / "s"))

    def write(rnd, table, df):
        df.write.mode("overwrite").parquet(
            _os.path.join(store.root, f"round={rnd:04d}", table)
        )

    write(
        0,
        "frontier",
        spark.createDataFrame(
            [("http://h/a", "h/a"), ("http://h/b", "h/b")],
            "url string, surt_key string",
        ),
    )
    write(
        1,
        "schedule",
        spark.createDataFrame([("http://h/a",)], "url string"),
    )
    assert {r.url for r in store.read_frontier(spark, 1).collect()} == {
        "http://h/b"
    }
    # round 2: a reopened+re-discovered → fresh pending delta
    write(
        2,
        "frontier_delta",
        spark.createDataFrame([("http://h/a", "h/a")], "url string, surt_key string"),
    )
    got = store.read_frontier(spark, 2)
    assert set(got.columns) == {"url", "surt_key"}  # no helper-column leak
    assert {r.url for r in got.collect()} == {"http://h/a", "http://h/b"}
    # a LATER schedule does retire the re-discovered row
    write(
        3,
        "schedule",
        spark.createDataFrame([("http://h/a",)], "url string"),
    )
    assert {r.url for r in store.read_frontier(spark, 3).collect()} == {
        "http://h/b"
    }
    # compaction bakes the same answer into a new base
    store.compact_frontier(spark, 3)
    assert {r.url for r in store.read_frontier(spark, 3).collect()} == {
        "http://h/b"
    }


def test_blocklist_gated_discovery(spark, store):
    """The quality feedback loop closed at the scheduler seam: with one
    host blocklisted, rounds run unchanged except that NO discovered URL
    on that host ever enters the frontier — seeds on the host still
    retire normally (blocking is an admission rule, not retroactive)."""
    from cc_crawl_statistics_spark.sources.tables import pages_df

    # pick a host that the arithmetic expansion definitely discovers
    victim = "www.site1.org"
    blocklist = spark.createDataFrame([(victim,)], "host string")
    gated = scheduler.blocklist_gated_discovery(
        scheduler.expand_links, blocklist
    )
    for _ in range(3):
        scheduler.run_round(spark, store, SF_SMOKE, expand_fn=gated)
    latest = store.latest_round()
    frontier = store.read_frontier(spark, latest).toPandas()
    seeds = (
        pages_df(spark, SF_SMOKE)
        .select("url", "host")
        .distinct()
        .filter(F.col("host") == victim)
        .toPandas()
    )
    on_victim = frontier[frontier.host == victim]
    # every victim-host row in the frontier must be a seed URL (round-0
    # seeding bypasses discovery by design); nothing NEW was admitted
    assert set(on_victim.url) <= set(seeds.url)
    # control: the ungated run does admit... (same store shape, new store)
    # — covered implicitly: with gating removed the same rounds schedule
    # the victim's children; assert the gate actually dropped something
    ungated = scheduler.expand_links
    st2 = SnapshotStore(store.root + "_ctl")
    for _ in range(3):
        scheduler.run_round(spark, st2, SF_SMOKE, expand_fn=ungated)
    f2 = st2.read_frontier(spark, st2.latest_round()).toPandas()
    assert len(f2[f2.host == victim]) > len(on_victim)


def test_expire_rounds_bit_identical_and_unreachable_removed(spark, tmp_path):
    """state.expire_rounds (the Iceberg expire_snapshots analog): after
    compaction, dropping the pre-cutoff state tables changes NOTHING a
    read at rounds >= the bases can see — the next scheduled round, the
    reconstructed frontier and the seen set are bit-identical to an
    unexpired copy of the same store — while the dead tables are gone,
    manifests/corpus dimensions survive, and time travel before the
    cutoff now fails loudly."""
    a = SnapshotStore(str(tmp_path / "keep"))
    for _ in range(1, 5):
        scheduler.run_round(
            spark, a, SF_SMOKE, compact_every=2, bloom_min_seen=0
        )
    # identical store copy, then expire one of them
    shutil.copytree(a.root, str(tmp_path / "expired"))
    b = SnapshotStore(str(tmp_path / "expired"))
    removed = b.expire_rounds(4)
    cutoff = min(a.frontier_base_round(4), a.seen_base_round(4))
    assert cutoff >= 2  # compaction ran, so the test exercises deletion
    assert removed, "expected pre-cutoff state tables to be removed"
    for p in removed:
        assert not os.path.exists(p)
        assert int(p.split("round=")[1][:4]) < cutoff
    # idempotent
    assert b.expire_rounds(4) == []
    # manifests + corpus dimensions survive at every round
    for r in range(0, 5):
        assert os.path.exists(os.path.join(b._round_dir(r), MANIFEST))
    assert os.path.exists(os.path.join(b._round_dir(0), "universe"))
    assert os.path.exists(os.path.join(b._round_dir(0), "host_ledger"))
    # reads at the head are bit-identical to the unexpired store
    assert (
        sorted(map(tuple, a.read_seen(spark, 4).collect()))
        == sorted(map(tuple, b.read_seen(spark, 4).collect()))
    )
    fa = a.read_frontier(spark, 4).drop("doc_id")
    fb = b.read_frontier(spark, 4).drop("doc_id")
    assert (
        sorted(map(tuple, fa.collect())) == sorted(map(tuple, fb.collect()))
    )
    # the NEXT round schedules identically on both stores
    scheduler.run_round(spark, a, SF_SMOKE, compact_every=2, bloom_min_seen=0)
    scheduler.run_round(spark, b, SF_SMOKE, compact_every=2, bloom_min_seen=0)
    assert schedule_rows(spark, a, 5) == schedule_rows(spark, b, 5)
    # time travel before the cutoff is gone, and fails loudly
    with pytest.raises(FileNotFoundError):
        b.read_frontier(spark, cutoff - 1)


def test_stats_merge_is_lossless_and_associative(spark):
    """Mergeable statistics: folding per-crawl sketched stats equals the
    direct single pass on the exact columns (lossless), and EVERY merge
    shape's estimate lands within the HLL error envelope of the true
    distinct count. Estimates are not bit-invariant across assembly
    paths (HIP vs composite estimator, mode-promotion points — see
    merge_round_statistics docstring), which is exactly why the driver
    oracle compares only the exact columns."""
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.frontier.scheduler import (
        merge_round_statistics,
        sketched_round_statistics,
    )
    from cc_crawl_statistics_spark.sources.tables import pages_df
    from tests.conftest import SF_SMOKE

    pages = pages_df(spark, SF_SMOKE)
    parts = [
        sketched_round_statistics(pages.filter(F.col("crawl_id") == i))
        for i in range(3)
    ]

    def snap(df):
        return {
            (r.type, r.key): (r.pages, r.urls, r.est)
            for r in df.select(
                "type", "key", "pages", "urls",
                F.hll_sketch_estimate("url_hll").cast("long").alias("est"),
            ).collect()
        }

    direct = snap(sketched_round_statistics(pages))
    merged = snap(merge_round_statistics(*parts))
    # exact columns: lossless
    assert {k: v[:2] for k, v in merged.items()} == {
        k: v[:2] for k, v in direct.items()
    }
    # reordered/nested fold: exact columns identical, estimates within
    # envelope (not bit-equal — assembly-path-dependent estimator)
    nested = snap(
        merge_round_statistics(
            merge_round_statistics(parts[2], parts[0]), parts[1]
        )
    )
    assert {k: v[:2] for k, v in nested.items()} == {
        k: v[:2] for k, v in merged.items()
    }
    g = ("size", "global")
    exact = pages.agg(F.count_distinct("url")).first()[0]
    for est in (merged[g][2], nested[g][2], direct[g][2]):
        assert abs(est - exact) <= max(2, exact // 50)  # ≤2%
    # the distinct estimate is genuinely per-key: the global row's
    # distinct urls exceed any single host's
    assert merged[g][2] == max(v[2] for v in merged.values())


def test_priority_aging_bit_for_bit(spark, tmp_path):
    """Starvation-free aging (age_boost): under a flat-depth expansion
    and a budget-1 ledger — the contention shape where same-depth
    competitors carry different discovery rounds — the Spark engine
    matches the model bit-for-bit over 6 rounds with aging ON, and the
    aged schedule provably diverges from the static one (so the
    _src_rnd age wiring is load-bearing, not vacuous)."""
    import os
    import shutil

    from cc_crawl_statistics_spark.frontier.scheduler import expand_links

    def flat_expand(sched_m, universe, n_docs):
        out = expand_links(sched_m, universe, n_docs)
        t = dict(out.dtypes)["depth"]
        return out.withColumn("depth", F.lit(1).cast(t))

    def cap_ledger(st_store):
        """Rewrite the seeded store's ledger to budget 1 everywhere,
        preserving the original column types."""
        path = os.path.join(st_store.root, "round=0000", "host_ledger")
        df = spark.read.parquet(path)
        t = dict(df.dtypes)["max_per_round"]
        tmp = path + ".tmp"
        df.withColumn("max_per_round", F.lit(1).cast(t)).write.mode(
            "overwrite"
        ).parquet(tmp)
        shutil.rmtree(path)
        os.replace(tmp, path)

    def run(boost, root):
        sp_store = SnapshotStore(str(tmp_path / root))
        st = model.seed(N_DOCS, age_boost=boost, flat_depth=True)
        out = []
        for rnd in range(1, 7):
            scheduler.run_round(
                spark, sp_store, SF_SMOKE,
                age_boost=boost, expand_fn=flat_expand,
            )
            msched = model.run_round(st)
            got = schedule_rows(spark, sp_store, rnd)
            assert got == model_rows(msched), (boost, rnd)
            out.append(got)
            if rnd == 1:  # cap budgets from round 2 on, both engines
                cap_ledger(sp_store)
                st.budget_cap = 1
        return out

    aged = run(40, "aged")
    static = run(0, "static")
    assert aged != static  # aging visibly reorders under contention


def test_reopen_for_policy_change_glue(spark, tmp_path):
    """Robots-drift reopen: exactly the disallowed→allowed flip set's
    canonical seen keys leave the seen set; a host-level no-op epoch pair
    reopens nothing."""
    from cc_crawl_statistics_spark.frontier.robots import unblocked_urls
    from cc_crawl_statistics_spark.frontier.scheduler import (
        reopen_for_policy_change,
        seen_key,
    )
    from cc_crawl_statistics_spark.sources.tables import pages_df

    store = SnapshotStore(str(tmp_path / "s"))
    scheduler.run_round(spark, store, SF_SMOKE)
    pages = pages_df(spark, SF_SMOKE)
    before = {r.seen_key for r in store.read_seen(spark, 1).collect()}
    n = reopen_for_policy_change(spark, store, 1, pages, 0, 1)
    after = {r.seen_key for r in store.read_seen(spark, 1).collect()}
    due_keys = {
        r.k
        for r in unblocked_urls(pages, 0, 1)
        .select(seen_key(F.col("url")).alias("k"))
        .distinct()
        .collect()
    }
    assert n == len(due_keys) > 0
    assert after == before - due_keys
    # identical epochs -> no flips -> no seen-set edit
    n0 = reopen_for_policy_change(spark, store, 1, pages, 1, 1)
    assert n0 == 0
    again = {r.seen_key for r in store.read_seen(spark, 1).collect()}
    assert again == after


def test_run_round_fetcher_sharding(spark, tmp_path):
    """n_fetchers stamps a host-affine fetcher column on the schedule
    (matching the capacity module's ring exactly), leaves everything else
    bit-identical to the unsharded round, and records the fleet balance
    metric."""
    import hashlib

    from cc_crawl_statistics_spark.frontier import capacity as C

    plain = SnapshotStore(str(tmp_path / "plain"))
    sharded = SnapshotStore(str(tmp_path / "sharded"))
    scheduler.run_round(spark, plain, SF_SMOKE)
    m = scheduler.run_round(spark, sharded, SF_SMOKE, n_fetchers=4)
    assert schedule_rows(spark, plain, 1) == schedule_rows(spark, sharded, 1)
    rows = sharded.read(spark, 1, "schedule").collect()
    ring = C.ring_points(4, 16)

    def fetcher_of(h: str) -> int:
        hp = int(hashlib.md5(h.encode()).hexdigest()[:8], 16)
        for p, f in ring:
            if p >= hp:
                return f
        return ring[0][1]

    per_host: dict[str, set] = {}
    for r in rows:
        per_host.setdefault(r.host, set()).add(r.fetcher)
        assert r.fetcher == fetcher_of(r.host)
    assert all(len(s) == 1 for s in per_host.values())
    assert 0 < m["fetcher_max_load_permille"] <= 1000


def test_round_trajectory_matches_manifests(spark, store):
    """Trajectory rows come straight from the committed manifests; the
    discovery ratio is the integer permille of new/scheduled."""
    from cc_crawl_statistics_spark.frontier.state import round_trajectory

    for _ in range(3):
        scheduler.run_round(spark, store, SF_SMOKE)
    rows = {r.round: r for r in round_trajectory(spark, store).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0].n_seeded == rows[0].n_seen > 0
    for rnd in (1, 2, 3):
        m = store.manifest(rnd)["metrics"]
        r = rows[rnd]
        assert r.n_scheduled == m["n_scheduled"]
        assert r.n_discovered_new == m["n_discovered_new"]
        assert r.n_seen == m["n_seen"]
        assert r.n_frontier_pending == m["n_frontier_pending"]
        assert r.discovery_permille == (
            m["n_discovered_new"] * 1000 // m["n_scheduled"]
        )


def test_enforce_robots_paths_bit_for_bit(spark, store):
    """Fetch-time per-path robots gate: three rounds Spark == model with
    enforce_paths — allowed rows, denied rows (with pre-gate ranks), the
    n_robots_denied metric, and the expansion-from-allowed-only frontier
    all line up; denied rows never reappear in later schedules."""
    st = model.seed(N_DOCS)
    st.enforce_paths = True
    seen_urls: set[str] = set()
    for rnd in range(1, 4):
        metrics = scheduler.run_round(
            spark, store, SF_SMOKE, enforce_robots_paths=True
        )
        msched = model.run_round(st)
        tbl = store.read(spark, rnd, "schedule").toPandas()
        got = sorted(
            map(
                tuple,
                tbl[
                    ["round", "url", "host", "depth", "score", "rank",
                     "allowed"]
                ].itertuples(index=False, name=None),
            )
        )
        exp = sorted(
            (x["round"], x["url"], x["host"], x["depth"], x["score"],
             x["rank"], x["allowed"])
            for x in msched
        )
        assert got == exp
        n_denied = sum(1 for x in msched if not x["allowed"])
        assert metrics["n_robots_denied"] == n_denied
        assert n_denied > 0  # the gate actually fires on this fixture
        dup = seen_urls & set(tbl.url)
        assert not dup  # retirement covers denied rows too
        seen_urls |= set(tbl.url)


def test_mid_store_flag_enable_widens_schedule_schema(spark, store):
    """Turning enforcement/sharding ON for a store whose earlier rounds
    wrote the narrow schedule schema must not bind the cached narrow
    schema to the new round's tables (regression: the commit-internal
    and metrics reads dropped the new columns)."""
    scheduler.run_round(spark, store, SF_SMOKE)
    m2 = scheduler.run_round(
        spark, store, SF_SMOKE, enforce_robots_paths=True, n_fetchers=4
    )
    assert m2["n_robots_denied"] > 0
    assert 0 < m2["fetcher_max_load_permille"] <= 1000
    cols = set(store.read(spark, 2, "schedule").columns)
    assert {"allowed", "fetcher"} <= cols


def test_opic_and_backoff_drive_the_priority_queue(spark):
    """Glue: the session's scoring/budget operators plug into the REAL
    selection operator — OPIC importance as host_bucketed_topk's
    score_col, server-pressure backoff budgets as its budget_col — and
    the selected set matches an independent per-host recompute."""
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.frontier.politeness import (
        server_pressure_backoff,
    )
    from cc_crawl_statistics_spark.frontier.scheduler import (
        host_bucketed_topk,
    )
    from cc_crawl_statistics_spark.operators.opic import opic

    # two hosts x five pages; host B is under pressure (budget shrinks)
    nodes = list(range(10))
    edges = [(i, (i * 3 + 1) % 10) for i in nodes] + [(0, 5), (1, 5)]
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    imp = opic(
        edf, ndf, n_rounds=3, fetched_sql=lambda r: f"node % 3 = {r % 3}"
    ).select("node", "importance_fp")

    cand = (
        imp.withColumn(
            "host",
            F.when(F.col("node") < 5, "a.example").otherwise("b.example"),
        )
        .withColumn(
            "url",
            F.concat(
                F.lit("https://"), F.col("host"), F.lit("/p/"),
                F.col("node"),
            ),
        )
        .withColumn("depth", F.lit(0))
        .withColumn("score", F.col("importance_fp"))
    )
    fetches = [("a.example", 200)] * 10 + [
        ("b.example", 503)
    ] * 4 + [("b.example", 200)] * 6
    ledger = spark.createDataFrame(
        [("a.example", 3), ("b.example", 3)],
        "host string, max_per_round int",
    )
    budgets = server_pressure_backoff(
        spark.createDataFrame(fetches, "host string, status int"), ledger
    ).select("host", F.col("backoff_budget").alias("max_per_round"))

    sel = host_bucketed_topk(cand.join(budgets, "host"))
    got = sorted(
        (r["host"], r["url"]) for r in sel.select("host", "url").collect()
    )

    rows = cand.select("host", "url", "score").collect()
    buds = {r["host"]: r["max_per_round"] for r in budgets.collect()}
    want = []
    for host in ("a.example", "b.example"):
        hs = sorted(
            (r for r in rows if r["host"] == host),
            key=lambda r: (-r["score"], r["url"]),
        )
        want += [(host, r["url"]) for r in hs[: buds[host]]]
    assert got == sorted(want)
    # pressure host got fewer slots than its ledger budget
    assert buds["b.example"] == 1 and buds["a.example"] == 3
