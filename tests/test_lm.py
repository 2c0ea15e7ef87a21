"""CCNet-style bigram-LM perplexity filter (operators/lm.py): smoothing
formula hand-checks, unseen-bigram/context paths, degenerate documents,
and the keep/drop partition semantics."""

from __future__ import annotations

import math

from cc_crawl_statistics_spark.operators import lm as LM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_bigrams_filtered_adjacency(spark):
    df = _docs(spark, [(1, "en", "a  b c"), (2, "en", "x"), (3, "en", "")])
    got = sorted(
        (r.doc_id, r.w1, r.w2)
        for r in LM.bigrams(df).collect()
    )
    # double space collapses: adjacency over the FILTERED token sequence
    assert got == [(1, "a", "b"), (1, "b", "c")]


def test_lm_train_hand_computed(spark):
    # reference corpus: "a b a b" + "b a" -> tokens: a,b,a,b,b,a
    # bigrams: (a,b)x2 (b,a)x2 (b,a from doc2? doc2 = "b a" -> (b,a))
    ref = _docs(spark, [(1, "en", "a b a b"), (2, "en", "b a")])
    rows = {(r.w1, r.w2): r for r in LM.lm_train_bigram(ref).collect()}
    # doc1 bigrams: (a,b),(b,a),(a,b); doc2: (b,a)
    assert rows[("a", "b")].c_bigram == 2
    assert rows[("b", "a")].c_bigram == 2
    # contexts: a appears as w1 twice, b twice; vocab = {a, b} -> V=2
    for k in rows:
        assert rows[k].c_context == 2
        assert rows[k].v == 2
    expect = math.floor(1_000_000 * math.log((2 + 1) / (2 + 2)))
    assert rows[("a", "b")].logp_x1m == expect


def test_cross_entropy_seen_unseen_and_degenerate(spark):
    ref = _docs(spark, [(1, "en", "a b a b"), (2, "en", "b a")])
    docs = _docs(
        spark,
        [
            (10, "en", "a b"),  # seen bigram
            (11, "en", "a c"),  # seen context a, unseen bigram
            (12, "en", "z q"),  # unseen context
            (13, "en", "solo"),  # no bigrams
        ],
    )
    out = {r.doc_id: r for r in LM.lm_cross_entropy(docs, ref).collect()}
    lp_seen = math.floor(1_000_000 * math.log(3 / 4))  # (2+1)/(2+2)
    lp_unseen_pair = math.floor(1_000_000 * math.log(1 / 4))  # (0+1)/(2+2)
    lp_unseen_ctx = math.floor(1_000_000 * math.log(1 / 2))  # (0+1)/(0+2)
    assert out[10].xent_mnat == (-lp_seen) // 1000
    assert out[11].xent_mnat == (-lp_unseen_pair) // 1000
    assert out[12].xent_mnat == (-lp_unseen_ctx) // 1000
    assert out[13].n_bigrams == 0 and out[13].xent_mnat is None


def test_quality_partition_keeps_no_evidence_docs(spark):
    ref = _docs(spark, [(1, "en", "a b a b")])
    docs = _docs(
        spark,
        [
            (10, "en", "a b a b"),  # low xent -> kept
            (11, "fr", "z q z q"),  # unseen -> high xent -> dropped
            (12, "fr", "solo"),  # no evidence -> kept
        ],
    )
    # threshold between the in-domain and out-of-domain doc
    lo = LM.lm_cross_entropy(docs, ref)
    vals = {r.doc_id: r.xent_mnat for r in lo.collect()}
    th = (vals[10] + vals[11]) // 2
    got = {
        r.grp: (r.kept, r.dropped)
        for r in LM.lm_quality_partition(docs, ref, th).collect()
    }
    assert got == {"en": (1, 0), "fr": (1, 1)}


def test_scores_are_integer_and_order_independent(spark):
    ref = _docs(spark, [(1, "en", "a b c a b c"), (2, "en", "c b a")])
    docs = _docs(spark, [(i, "en", "a b c b a") for i in range(20)])
    one = LM.lm_cross_entropy(docs, ref)
    two = LM.lm_cross_entropy(docs.repartition(7), ref)
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, two.collect())
    )


def test_curation_funnel_monotone_and_grounded(spark, duck):
    from cc_crawl_statistics_spark.plans.pipeline_queries import (
        q_curation_funnel,
    )

    rows = q_curation_funnel(spark, "/root/testdata/sf0.001").collect()
    assert [r.stage for r in rows] == [
        "total",
        "exact_dedup",
        "quality",
        "language",
        "perplexity",
        "decontamination",
    ]
    surv = [r.survivors for r in rows]
    assert surv == sorted(surv, reverse=True)
    from cc_crawl_statistics_spark.synth import CORPUS_SQL

    total = duck.execute(
        f"SELECT COUNT(*) FROM ({CORPUS_SQL})"
    ).fetchone()[0]
    assert surv[0] == total
