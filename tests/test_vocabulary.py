"""Vocabulary operator: salted two-phase top-k == naive ranking, coverage
semantics, and plan shape (no unbounded-dimension single-partition window
before the salt phase)."""

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.operators.textstats import vocabulary
from tests.conftest import spark  # noqa: F401  (fixture)


def _docs(spark, n=200):  # noqa: F811
    # zipfian-ish: token w<j> appears in doc i iff j divides i
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("w1"),
            F.when(F.col("id") % 2 == 0, "w2"),
            F.when(F.col("id") % 3 == 0, "w3"),
            F.when(F.col("id") % 5 == 0, "w5"),
            F.when(F.col("id") % 7 == 0, "w7 w7"),
        ).alias("text"),
    )


def test_two_phase_matches_naive_and_coverage(spark):  # noqa: F811
    docs = _docs(spark)
    got = vocabulary(docs, top_k=3, n_salts=4).collect()
    # naive expected: counts over all tokens, rank by (count desc, token)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t") != "")
    naive = {
        r.t: (r.n, r.d)
        for r in toks.groupBy("t")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("d"))
        .collect()
    }
    expected = sorted(naive.items(), key=lambda kv: (-kv[1][0], kv[0]))[:3]
    total = sum(n for n, _ in naive.values())
    assert [(r.token, (r.n_tokens, r.n_docs)) for r in got] == expected
    assert [r.rank for r in got] == [1, 2, 3]
    # cumulative coverage is the running integer permille of total
    cum = 0
    for r in got:
        cum += r.n_tokens
        assert r.cum_permille == (1000 * cum) // total
    assert got[0].cum_permille < 1000


def test_full_vocab_coverage_closes_at_1000(spark):  # noqa: F811
    docs = _docs(spark)
    rows = vocabulary(docs, top_k=100, n_salts=4).collect()
    assert rows[-1].cum_permille == 1000
    permilles = [r.cum_permille for r in rows]
    assert permilles == sorted(permilles)


def test_exact_percentiles_quantile_disc_semantics(spark):  # noqa: F811
    from cc_crawl_statistics_spark.operators.textstats import (
        exact_percentiles,
    )

    # group a: values 1..4 -> p500 = 2 (first val with cum*1000 >= 500*4),
    # p900 = 4, p990 = 4; group b: all equal -> every percentile = 7
    rows = spark.createDataFrame(
        [("a", v) for v in (1, 2, 3, 4)] + [("b", 7)] * 5,
        "lang string, n_chars int",
    )
    got = {r.grp: r for r in exact_percentiles(rows).collect()}
    assert (got["a"].p500, got["a"].p900, got["a"].p990) == (2, 4, 4)
    assert (got["b"].p500, got["b"].p900, got["b"].p990) == (7, 7, 7)
    assert got["a"].n_rows == 4 and got["b"].n_rows == 5


def _model_bpe(wordfreq, n_merges, min_pair_freq=2):
    """Independent pure-Python BPE trainer (greedy left-to-right merge,
    tie-break freq desc then pair asc) — the semantics
    textstats.bpe_merges must reproduce bit-for-bit."""
    state = [(tuple(w), f) for w, f in wordfreq.items()]
    merges = []
    for rank in range(n_merges):
        pc = {}
        for syms, f in state:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        (l, r), pf = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if pf < min_pair_freq:
            break
        merges.append((rank, l, r, l + r, pf))
        nxt = []
        for syms, f in state:
            out, pend = [], None
            for s in syms:
                if pend is None:
                    pend = s
                elif pend == l and s == r:
                    out.append(l + r)
                    pend = None
                else:
                    out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            nxt.append((tuple(out), f))
        state = nxt
    return merges


def test_bpe_merges_bit_for_bit_vs_model(spark):
    """Engineered corpus: overlap case ('aaaa' under (a,a) merges greedily
    left-to-right), a frequency tie broken by pair order, and a merged
    symbol that participates in a later merge."""
    from cc_crawl_statistics_spark.operators.textstats import bpe_merges

    words = {
        "aaaa": 3,      # overlapping pair (a,a): greedy -> [aa, aa]
        "abab": 2,
        "banana": 2,
        "bandana": 1,
        "cc": 5,        # tie-break candidate vs other freq-5 pairs
        "ca": 5,
    }
    rows = []
    doc = 0
    for w, f in words.items():
        for _ in range(f):
            rows.append((doc, w))
            doc += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_freq)
        for r in bpe_merges(docs, n_merges=8).collect()
    ]
    want = _model_bpe(words, n_merges=8)
    assert got == want
    assert len(got) >= 4  # the fixture genuinely exercises several merges


def test_bpe_merges_respects_min_pair_freq(spark):
    from cc_crawl_statistics_spark.operators.textstats import bpe_merges

    docs = spark.createDataFrame(
        [(0, "xy xy xy"), (1, "zq")], "doc_id long, text string"
    )
    got = bpe_merges(docs, n_merges=5, min_pair_freq=2).collect()
    # only (x,y) reaches freq 2; (z,q) has freq 1 and must not be learned
    assert [(r.left, r.right) for r in got] == [("x", "y")]


def test_vocab_coverage_hand_computed(spark):
    """Good-Turing accounting on a hand corpus: hapax/doubleton counts,
    N1/N missing mass, type-token ratio — per language, integer floor."""
    from cc_crawl_statistics_spark.operators.textstats import vocab_coverage

    rows = [
        (0, "en", "a a a b b c"),   # en: N=8, freq a=4,b=2,c=1,d=1
        (1, "en", "a d"),
        (2, "de", "x y"),           # de: N=2, both hapax
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {r.lang: r for r in vocab_coverage(docs).collect()}
    en = got["en"]
    assert (en.n_tokens, en.n_types, en.n_hapax, en.n_dis) == (8, 4, 2, 1)
    assert en.missing_mass_permille == 2 * 1000 // 8
    assert en.type_token_permille == 4 * 1000 // 8
    de = got["de"]
    assert (de.n_tokens, de.n_hapax, de.missing_mass_permille) == (2, 2, 1000)


def test_compression_ratio_semantics(spark):
    """zlib ratio: exact vs direct zlib, and the redundancy ordering —
    a highly repetitive doc compresses far below natural-ish prose,
    empty docs are excluded."""
    import zlib

    from cc_crawl_statistics_spark.operators.textstats import (
        compression_ratios,
    )

    rep = "spam " * 200
    prose = " ".join(f"w{i}x{i * 7 % 13}" for i in range(200))
    docs = spark.createDataFrame(
        [(0, rep), (1, prose), (2, "")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in compression_ratios(docs).collect()}
    assert set(got) == {0, 1}  # empty excluded
    for d, t in ((0, rep), (1, prose)):
        assert got[d].raw_bytes == len(t.encode())
        assert got[d].zlib_bytes == len(zlib.compress(t.encode(), 6))
        assert got[d].ratio_permille == (
            got[d].zlib_bytes * 1000 // got[d].raw_bytes
        )
    assert got[0].ratio_permille < got[1].ratio_permille // 4


def _model_bpe_apply(word, merges):
    """Independent greedy applier (same inner loop as _model_bpe's merge
    step) — the semantics bpe_apply_col's replace chain must match."""
    syms = list(word)
    for l, r in merges:
        out, pend = [], None
        for s in syms:
            if pend is None:
                pend = s
            elif pend == l and s == r:
                out.append(l + r)
                pend = None
            else:
                out.append(pend)
                pend = s
        if pend is not None:
            out.append(pend)
        syms = out
    return syms


def test_bpe_apply_replace_chain_matches_greedy_model(spark):
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.operators.textstats import bpe_apply_col

    merges = [("a", "a"), ("t", "h"), ("th", "e"), ("a", "b"), ("aa", "aa")]
    words = [
        "aaa", "aaaa", "aaaaa", "xab", "ab", "the", "then", "lathe",
        "banana", "aabaa", "t", "thethe", "aaaaaaaa",
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["toks"]
        for r in df.select(
            "word", bpe_apply_col(F.col("word"), merges).alias("toks")
        ).collect()
    }
    for w in words:
        assert got[w] == _model_bpe_apply(w, merges), w
        assert "".join(got[w]) == w  # tokenization never loses bytes


def test_bpe_encode_docs_concat_invariant(spark):
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.operators.textstats import (
        bpe_encode_docs,
    )

    docs = spark.createDataFrame(
        [(1, "the cat and the hat"), (2, "  spaced   out  ")],
        "doc_id int, text string",
    )
    out = bpe_encode_docs(docs, [("t", "h"), ("th", "e"), ("a", "n")])
    for r in out.collect():
        assert "".join(r["tokens"]) == r["text"].replace(" ", "")


def test_bpe_compression_counts_match_token_arrays(spark):
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.operators.textstats import (
        bpe_apply_col,
        bpe_compression,
    )

    merges = [("t", "h"), ("th", "e"), ("a", "n")]
    docs = spark.createDataFrame(
        [
            (1, "en", "the thane and the hat"),
            (2, "en", "then than the"),
            (3, "de", "das band an dem the"),
        ],
        "doc_id int, lang string, text string",
    )
    got = {
        r["lang"]: (r["n_words"], r["n_tokens"], r["tokens_per_1000_words"])
        for r in bpe_compression(docs, merges).collect()
    }
    # independent recount via the token-ARRAY path
    arr = (
        docs.select(
            "lang",
            F.explode(F.split("text", " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .select("lang", F.size(bpe_apply_col(F.col("w"), merges)).alias("n"))
        .groupBy("lang")
        .agg(F.count("*").alias("nw"), F.sum("n").alias("nt"))
        .collect()
    )
    want = {
        r["lang"]: (r["nw"], r["nt"], r["nt"] * 1000 // r["nw"]) for r in arr
    }
    assert got == want


def test_bpe_merges_warns_on_large_merge_count(spark):  # noqa: F811
    """bpe_merges warns above _BPE_MERGE_WARN merges (the ~2-jobs-per-
    merge driver scheduling cost documented in its docstring), and stays
    silent below it. The warning fires before any job runs, so the huge
    request is caught even though the loop breaks early on tiny input."""
    import warnings

    from cc_crawl_statistics_spark.operators.textstats import (
        _BPE_MERGE_WARN,
        bpe_merges,
    )

    docs = spark.createDataFrame([(1, "aa ab aa")], "doc_id long, text string")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bpe_merges(docs, n_merges=_BPE_MERGE_WARN + 1).collect()
    assert any("sequential Spark jobs" in str(w.message) for w in caught)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bpe_merges(docs, n_merges=4).collect()
    assert not any("sequential Spark jobs" in str(w.message) for w in caught)
