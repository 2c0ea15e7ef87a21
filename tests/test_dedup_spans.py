"""Exact-substring (span-level) dedup tests: duplicated_kgram_spans (exact
verifier) and cdc_duplicate_spans (content-defined-chunking scale path).

Anchors: a pure-Python reference chunker (bit-for-bit vs the numpy
implementation), planted-duplicate fixtures comparing the two flavors, and
alignment-independence of content-defined boundaries."""

from __future__ import annotations

import random

from cc_crawl_statistics_spark.operators import dedup as D

_B = 0x9E3779B97F4A7C15
_MIX = 0xFF51AFD7ED558CCD
_M = (1 << 64) - 1
_BINV = pow(_B, -1, 1 << 64)


def model_chunks(text: str, avg: int = 64, win: int = 16):
    """Independent single-threaded model of cdc_chunks (same constants):
    [(off_1based, clen, chash_int64)]."""
    c = text.encode("utf-8")
    n = len(c)
    if n == 0:
        return []
    P = [0] * (n + 1)
    pw = 1
    for t in range(n):
        P[t + 1] = (P[t] + c[t] * pw) & _M
        pw = (pw * _B) & _M
    pinv = [1] * (n + 1)
    for t in range(n):
        pinv[t + 1] = (pinv[t] * _BINV) & _M
    cuts = []
    for i in range(win, n + 1):
        h = ((P[i] - P[i - win]) * pinv[i - win]) & _M
        h = ((h ^ (h >> 33)) * _MIX) & _M
        h ^= h >> 29
        if (h & (avg - 1)) == 0 and i < n:
            cuts.append(i)
    bounds = [0] + cuts + [n]
    out = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        ch = ((P[e] - P[s]) * pinv[s]) & _M
        out.append((s + 1, e - s, ch - (1 << 64) if ch >= (1 << 63) else ch))
    return out


def _rnd_text(seed: int, n_words: int) -> str:
    rng = random.Random(seed)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    return " ".join(rng.choice(words) for _ in range(n_words))


PLANTED = (
    "the quick brown fox jumps over the lazy dog repeatedly and without pause "
    * 6
)  # 444 chars — >> 2·avg_chunk + min_len


def _corpus(spark):
    docs = [
        (1, _rnd_text(1, 40) + " " + PLANTED + " " + _rnd_text(2, 40), "web"),
        (2, _rnd_text(3, 55) + " " + PLANTED + " " + _rnd_text(4, 30), "web"),
        (3, "unique-" + "-".join(f"x{i}y" for i in range(60)), "books"),
        (4, "other-" + "-".join(f"p{i}q" for i in range(60)), "books"),
        (5, "", "books"),
        (6, "tiny", "books"),
    ]
    return spark.createDataFrame(docs, ["doc_id", "text", "source"])


def test_cdc_chunks_bit_for_bit_vs_model(spark):
    texts = [
        (1, _rnd_text(11, 120), "a"),
        (2, PLANTED, "a"),
        (3, "", "a"),
        (4, "shorter than the window", "a"),
        (5, "ünïcödé bytes — mixed width ✓ " * 20, "a"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text", "source"])
    got = {
        doc_id: sorted((r["off"], r["clen"], r["chash"]) for r in rows)
        for doc_id, rows in (
            (d, [r for r in D.cdc_chunks(df).collect() if r["doc_id"] == d])
            for d, *_ in texts
        )
    }
    for doc_id, text, _ in texts:
        assert got[doc_id] == sorted(model_chunks(text)), doc_id


def test_chunks_cover_text_exactly(spark):
    df = _corpus(spark)
    rows = D.cdc_chunks(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["off"], r["clen"]))
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    for doc_id, chunks in by_doc.items():
        chunks.sort()
        expect_off = 1
        for off, clen in chunks:
            assert off == expect_off  # contiguous, gap-free
            expect_off = off + clen
        assert expect_off - 1 == len(texts[doc_id].encode("utf-8"))
    assert 5 not in by_doc  # empty text → no chunks, no crash


def test_planted_duplicate_found_by_both_flavors(spark):
    df = _corpus(spark)
    exact = {
        r["doc_id"]: (r["span_start"], r["span_len"])
        for r in D.duplicated_kgram_spans(df, k=30).collect()
    }
    cdc = {
        r["doc_id"]: (r["span_start"], r["span_len"])
        for r in D.cdc_duplicate_spans(df, min_len=30).collect()
    }
    for flavor in (exact, cdc):
        assert set(flavor) == {1, 2}  # only the planted pair, no books hits
    for d in (1, 2):
        es, el = exact[d]
        # exact span covers the full planted region (±k-1 run-in)
        assert el >= len(PLANTED)
        cs, cl = cdc[d]
        # CDC span sits inside the exact span...
        assert es <= cs and cs + cl <= es + el
        # ...and misses at most the two cut chunks at the edges
        assert cl >= len(PLANTED) - 4 * 64


def test_cdc_alignment_independence(spark):
    # same passage at very different offsets → identical interior chunk
    # (clen, chash) sequences
    df = spark.createDataFrame(
        [
            (1, "A" + PLANTED, "s"),
            (2, _rnd_text(9, 200) + PLANTED, "s"),
        ],
        ["doc_id", "text", "source"],
    )
    rows = D.cdc_chunks(df).collect()
    sigs = {1: [], 2: []}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["off"])):
        sigs[r["doc_id"]].append((r["clen"], r["chash"]))
    interior1 = sigs[1][1:-1]
    assert len(interior1) >= 2
    # every interior chunk of doc 1's passage appears, in order, in doc 2
    s2 = sigs[2]
    idx = [i for i, sig in enumerate(s2) if sig == interior1[0]]
    assert idx, "first interior chunk not found in shifted copy"
    i0 = idx[0]
    assert s2[i0 : i0 + len(interior1)] == interior1


def test_two_separate_regions_give_two_spans(spark):
    blk_a = "first duplicated block of text that is long enough " * 2
    blk_b = "second duplicated block with different content here " * 2
    df = spark.createDataFrame(
        [
            (1, blk_a + _rnd_text(21, 40) + blk_b, "s"),
            (2, blk_b + _rnd_text(22, 40) + blk_a, "s"),
        ],
        ["doc_id", "text", "source"],
    )
    spans = D.duplicated_kgram_spans(df, k=30).collect()
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], 0)
        per_doc[r["doc_id"]] += 1
    assert per_doc == {1: 2, 2: 2}
