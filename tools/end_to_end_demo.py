"""Self-hosting end-to-end demo: one script that walks the whole engine
the way a cc-crawl-statistics user migrating to this repo would —

  pages table (input_hint schema)
    → WARC files on disk + byte-addressed CDX index   (the cc-index BUILD)
    → CDX line ingest                                  (the reference's INPUT)
    → count-job aggregates + JSON\\tJSON stats wire     (crawlstats --job=count/stats)
    → curation verdicts (dedup → quality → language)   (training-data layer)
    → token-balanced training shards                   (loader handoff)

Run:  python tools/end_to_end_demo.py [sf_dir]   (default /root/testdata/sf0.001)

Each stage asserts a cross-stage invariant, so the demo doubles as an
integration smoke: the CDX ingest must reproduce the source aggregates,
the stats wire must round-trip byte-stably, and shard token totals must
equal the curated corpus total.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.operators import counts as C
from cc_crawl_statistics_spark.operators.sampling import shard_summary
from cc_crawl_statistics_spark.operators.textstats import curate_corpus
from cc_crawl_statistics_spark.plans.pipeline_queries import corpus_df
from cc_crawl_statistics_spark.session import get_spark
from cc_crawl_statistics_spark.sources.cdx import parse_cdx_lines
from cc_crawl_statistics_spark.sources.compat import (
    emit_stats_lines,
    read_stats_lines,
)
from cc_crawl_statistics_spark.sources.tables import pages_df
from cc_crawl_statistics_spark.sources.warc import write_warc_with_index

DEFAULT_SF = "/root/testdata/sf0.001"


def main(spark=None, sf: str = DEFAULT_SF) -> None:
    owns = spark is None
    if owns:
        spark = get_spark(app_name="end_to_end_demo", cores=8)
    tmp = tempfile.mkdtemp(prefix="e2e_")
    try:
        pages = pages_df(spark, sf).cache()
        n_pages = pages.count()
        print(f"[1] pages table: {n_pages} fetch rows")

        # ── pages → WARC files + byte-addressed CDX index ────────────────
        idx = write_warc_with_index(pages, os.path.join(tmp, "warc"))
        n_idx = idx.count()
        assert n_idx == n_pages, (n_idx, n_pages)
        print(f"[2] WARC layout written; CDX index rows: {n_idx}")

        # ── CDX lines → the reference's ingest path ──────────────────────
        blob = F.concat(
            F.lit('{"url": "'), F.col("url"),
            F.lit('", "status": "'), F.col("status").cast("string"),
            F.lit('", "digest": "'), F.col("digest"), F.lit('"}'),
        )
        lines = pages.select(
            F.concat_ws(
                " ",
                F.col("surt_key"),
                F.col("fetch_ts").cast("string"),
                blob,
            ).alias("value")
        )
        parsed = parse_cdx_lines(lines)
        assert parsed.count() == n_pages
        print(f"[3] CDX ingest parsed {n_pages} lines (0 malformed)")

        # ── count job + stats wire round-trip ────────────────────────────
        sizes = C.crawl_size(pages)
        stats = sizes.select(
            F.lit("size").alias("type"),
            F.lit("page").alias("key"),
            "crawl",
            "pages",
            "urls",
        )
        wire = emit_stats_lines(stats)
        back = read_stats_lines(wire.withColumnRenamed("line", "value"))
        assert back.count() == stats.count()
        per_crawl = {r.crawl: r.pages for r in sizes.collect()}
        print(f"[4] stats wire round-trip: per-crawl pages {per_crawl}")

        # ── REP page directives + URL alias collapse ─────────────────────
        from cc_crawl_statistics_spark.functions.urlkit import normalize_url
        from cc_crawl_statistics_spark.operators.rep_gate import (
            indexable_pages,
        )
        from cc_crawl_statistics_spark.sources.cc_pages import (
            cc_pages_rep_df,
        )
        from cc_crawl_statistics_spark.synth import messy_url_sql

        rep = cc_pages_rep_df(spark, sf)
        n_rep, n_indexable = rep.count(), indexable_pages(rep).count()
        assert 0 < n_indexable < n_rep
        base = pages.select("doc_id", "url", "scheme", "host").distinct()
        aliased = base.withColumn("messy", F.expr(messy_url_sql()))
        # class 5 carries a query string, which normalization must NOT
        # touch — every other alias class collapses onto its capture
        n_bad = aliased.filter(F.col("doc_id") % 13 != 5).filter(
            normalize_url(F.col("messy")) != F.col("url")
        ).count()
        n_q = aliased.filter(F.col("doc_id") % 13 == 5).filter(
            normalize_url(F.col("messy")) != F.col("messy")
        ).count()
        assert n_bad == 0 and n_q == 0
        print(
            f"[4b] REP gate kept {n_indexable}/{n_rep} fetches indexable; "
            f"all URL aliases normalized back to canonical, queries "
            f"untouched"
        )

        # ── curation layer ───────────────────────────────────────────────
        corpus = corpus_df(spark, sf).cache()
        verdicts = curate_corpus(corpus)
        funnel = {
            r.verdict: r.n
            for r in verdicts.groupBy("verdict")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        kept = verdicts.filter(F.col("verdict") == "kept")
        print(f"[5] curation verdicts: {funnel}")

        # ── training shards over the curated corpus ──────────────────────
        curated = corpus.join(kept.select("doc_id"), "doc_id")
        shards = shard_summary(curated, n_shards=8, n_salts=4)
        rows = shards.collect()
        total_tokens = sum(r.n_tokens for r in rows)
        check = curated.select(
            F.sum(F.regexp_count("text", F.lit(r"\S+"))).alias("t")
        ).first()["t"]
        assert total_tokens == check, (total_tokens, check)
        print(
            f"[6] {len(rows)} shards, {total_tokens} tokens total, "
            f"max |dev| {max(abs(r.dev_permille) for r in rows)} permille"
        )
        # ── frontier: sharded scheduling rounds + robots policy drift ───
        from cc_crawl_statistics_spark.frontier import scheduler
        from cc_crawl_statistics_spark.frontier.state import SnapshotStore

        store = SnapshotStore(os.path.join(tmp, "frontier"))
        m1 = scheduler.run_round(spark, store, sf, n_fetchers=4)
        sched = store.read(spark, 1, "schedule")
        per_host_shards = (
            sched.groupBy("host")
            .agg(F.countDistinct("fetcher").alias("nf"))
            .agg(F.max("nf"))
            .first()[0]
        )
        assert per_host_shards == 1  # politeness stays fetcher-local
        print(
            f"[7] frontier round 1: {m1['n_scheduled']} URLs over 4 "
            f"fetcher shards (max load "
            f"{m1['fetcher_max_load_permille']} permille)"
        )

        n_reopened = scheduler.reopen_for_policy_change(
            spark, store, 1, pages, 0, 1
        )
        assert n_reopened > 0
        m2 = scheduler.run_round(
            spark, store, sf, n_fetchers=4, enforce_robots_paths=True
        )
        print(
            f"[8] robots drift re-opened {n_reopened} newly-allowed URLs; "
            f"round 2 scheduled {m2['n_scheduled']} "
            f"({m2['n_robots_denied']} denied at fetch time by per-path "
            f"rules)"
        )

        # ── adaptive refresh: tiers × fair budget × fetch mode ──────────
        from cc_crawl_statistics_spark.operators.recrawl import (
            refresh_round_plan,
        )
        from cc_crawl_statistics_spark.plans.pipeline_queries import (
            _drifted_pages,
        )

        plan = refresh_round_plan(
            _drifted_pages(spark, sf), budget_per_fetcher=25
        )
        over = (
            plan.groupBy("fetcher")
            .agg(F.sum("n_scheduled").alias("s"))
            .filter(F.col("s") > 25)
            .count()
        )
        assert over == 0  # no shard exceeds its round budget
        tot = plan.agg(
            F.sum("n_scheduled").alias("s"), F.sum("n_conditional").alias("c")
        ).first()
        print(
            f"[9] refresh plan: {tot['s']} URLs scheduled within 4x25 "
            f"budget, {tot['c']} as conditional GETs"
        )

        print("END-TO-END OK")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        if owns:
            spark.stop()


if __name__ == "__main__":
    main(sf=sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF)
