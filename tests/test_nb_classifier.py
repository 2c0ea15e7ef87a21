"""In-engine Naive Bayes classifier: hand-computed weight/score checks on a
tiny fixture, the cross-engine fixed-point-log determinism evidence, and the
priors-only fallback for out-of-vocabulary documents."""

from __future__ import annotations

import math

import pytest

from cc_crawl_statistics_spark.operators import textstats as TX

DOCS = [
    # 3 'en' docs, 1 'de' doc; vocabulary is every token here (<= 50)
    (0, "the cat sat", "en"),
    (1, "the dog sat", "en"),
    (2, "the the cat", "en"),
    (3, "der hund", "de"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def _expected_weights():
    """Independent Python model of nb_train on DOCS."""
    toks = []
    for _, text, lang in DOCS:
        toks += [(t, lang) for t in text.split(" ") if t]
    vocab = sorted({t for t, _ in toks})
    v = len(vocab)
    cls: dict[tuple[str, str], int] = {}
    n_c: dict[str, int] = {}
    for t, c in toks:
        cls[(t, c)] = cls.get((t, c), 0) + 1
        n_c[c] = n_c.get(c, 0) + 1
    labels = sorted({lang for _, _, lang in DOCS})
    out = {}
    for t in vocab:
        for c in labels:
            num = cls.get((t, c), 0) + 1
            den = n_c.get(c, 0) + v
            out[(t, c)] = math.floor(1_000_000 * math.log(num / den))
    n_docs = {c: sum(1 for d in DOCS if d[2] == c) for c in labels}
    for c in labels:
        out[("<prior>", c)] = math.floor(
            1_000_000 * math.log(n_docs[c] / len(DOCS))
        )
    return out


def test_nb_train_matches_hand_model(docs_df):
    got = {
        (r["token"], r["label"]): r["weight_x1m"]
        for r in TX.nb_train(docs_df, vocab_size=50).collect()
    }
    assert got == _expected_weights()


def test_nb_classify_scores_and_argmax(docs_df):
    w = _expected_weights()

    def score(text: str, c: str) -> int:
        s = w[("<prior>", c)]
        for t in text.split(" "):
            if (t, c) in w:
                s += w[(t, c)]
        return s

    weights = TX.nb_train(docs_df, vocab_size=50)
    got = {
        r["doc_id"]: (r["label_pred"], r["score_x1m"])
        for r in TX.nb_classify(docs_df, weights).collect()
    }
    for doc_id, text, _ in DOCS:
        scores = {c: score(text, c) for c in ("de", "en")}
        best = min(sorted(scores), key=lambda c: (-scores[c], c))
        assert got[doc_id] == (best, scores[best]), doc_id
    # the 'the'-heavy docs classify en, the German doc de
    assert got[0][0] == "en" and got[3][0] == "de"


def test_nb_classify_oov_doc_falls_back_to_priors(spark, docs_df):
    weights = TX.nb_train(docs_df, vocab_size=50)
    oov = spark.createDataFrame(
        [(9, "zzz qqq", "en")], "doc_id long, text string, lang string"
    )
    row = TX.nb_classify(oov, weights).collect()[0]
    w = _expected_weights()
    # priors only: en (3/4) beats de (1/4)
    assert row["label_pred"] == "en"
    assert row["score_x1m"] == w[("<prior>", "en")]


def test_nb_self_agreement_flags_disagreements(docs_df):
    rows = {
        r["doc_id"]: r["keep"]
        for r in TX.nb_self_agreement(docs_df).collect()
    }
    assert rows[3] == 1  # German doc agrees
    assert set(rows) == {0, 1, 2, 3}


def test_fixed_point_log_is_cross_engine_deterministic(spark, duck):
    """floor(1e6*ln(a/b)) must be identical between Spark's JVM log and
    DuckDB's libm — the property the integer NB weights rely on. Checked
    over 200k rational inputs here (3M in the design measurement)."""
    q = (
        "SELECT sum(cast(floor(1000000*ln(cast(n AS DOUBLE)/"
        "cast(((n*7919)%97)+1 AS DOUBLE))) AS BIGINT)) AS s FROM {src}"
    )
    got_spark = spark.sql(
        q.format(src="(SELECT id+1 AS n FROM range(200000))")
    ).collect()[0]["s"]
    got_duck = duck.execute(
        q.format(src="(SELECT n::BIGINT + 1 AS n FROM range(200000) t(n))")
    ).fetchone()[0]
    assert got_spark == got_duck


def test_tfidf_keywords_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple apple banana common"),
            (1, "banana cherry common"),
            (2, "cherry cherry common"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["rank"]): (r["token"], r["score_x1m"])
        for r in TX.tfidf_keywords(docs, top_k=2).collect()
    }
    idf = {
        "apple": math.floor(1_000_000 * math.log(3 / 1)),
        "banana": math.floor(1_000_000 * math.log(3 / 2)),
        "cherry": math.floor(1_000_000 * math.log(3 / 2)),
        "common": math.floor(1_000_000 * math.log(3 / 3)),
    }
    assert got[(0, 1)] == ("apple", 2 * idf["apple"])
    assert got[(0, 2)] == ("banana", idf["banana"])
    assert got[(2, 1)] == ("cherry", 2 * idf["cherry"])
    # ubiquitous token scores 0 and still ranks (tie broken by token asc)
    assert got[(1, 1)] == ("banana", idf["banana"])
    assert got[(1, 2)] == ("cherry", idf["cherry"])


def test_nb_calibration_bins_and_accuracy(spark):
    """Per-bin accuracy recomputed independently: run nb_classify for the
    predictions, _nb_scored for the margins, bin with the pure-Python
    pseudo-log rule, and compare the whole table."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (0, "aa aa aa bb", "x"),
            (1, "aa aa cc cc", "x"),
            (2, "bb bb bb aa", "y"),
            (3, "cc cc bb bb", "y"),
            (4, "aa bb cc dd", "x"),
            (5, "dd dd dd dd", "y"),
        ],
        "doc_id long, text string, lang string",
    )
    w = TX.nb_train(docs, vocab_size=10)
    got = {
        r.margin_bin: (r.n_docs, r.n_correct, r.acc_permille)
        for r in TX.nb_calibration(docs, w).collect()
    }
    pred = {r.doc_id: r.label_pred for r in TX.nb_classify(docs, w).collect()}
    scores: dict[int, list[int]] = {}
    for r in TX._nb_scored(docs, w).collect():
        scores.setdefault(r.doc_id, []).append(r.score)
    truth = {r.doc_id: r.lang for r in docs.collect()}

    def plog_bin(m: int) -> int:
        if m <= 0:
            return 0
        p10 = 10 ** (len(str(m)) - 1)
        mant = m // p10
        return (5 if mant >= 5 else 2 if mant >= 2 else 1) * p10

    exp: dict[int, list[int]] = {}
    for d, ss in scores.items():
        ss.sort(reverse=True)
        b = plog_bin(ss[0] - (ss[1] if len(ss) > 1 else ss[0]))
        row = exp.setdefault(b, [0, 0])
        row[0] += 1
        row[1] += int(pred[d] == truth[d])
    assert got == {
        b: (n, c, (c * 1000) // n) for b, (n, c) in exp.items()
    }
