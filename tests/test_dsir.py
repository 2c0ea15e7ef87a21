"""DSIR hashed n-gram importance weighting: selection semantics, the
bucket-hash portability contract, and feature accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.operators import dsir as DS


def test_contrastive_ranking(spark):
    """Rank semantics (DSIR selects by rank, not an absolute cut): every
    document built from target-slice vocabulary outranks every raw-only
    document — the contrast the plain perplexity filter can't express."""
    rows = [
        (0, "good clean prose flows here"),
        (1, "good clean text reads well"),
        (2, "spam spam casino casino pills"),
        (3, "casino pills spam pills spam"),
        (4, "good clean prose reads well"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    target = docs.filter(F.col("doc_id").isin(0, 1))
    got = {r.doc_id: r for r in DS.dsir_weights(docs, target).collect()}
    assert max(got[2].logw_x1m, got[3].logw_x1m) < min(
        got[0].logw_x1m, got[1].logw_x1m, got[4].logw_x1m
    )
    # feature accounting: n words + (n-1) bigrams
    assert got[0].n_feats == 5 + 4


def test_bucket_hash_matches_md5_arithmetic(spark):
    """The Spark bucket column equals the reference arithmetic over
    md5's first three hex chars (the portability contract the DuckDB
    oracle relies on)."""
    import hashlib

    feats = ["alpha", "beta beta", "", "Ünïcode", "9"]
    df = spark.createDataFrame([(f,) for f in feats], ["feat"])
    got = {
        r.feat: r.b
        for r in df.select(
            "feat", DS.feature_bucket(F.col("feat"), 1024).alias("b")
        ).collect()
    }
    for f in feats:
        h = hashlib.md5(f.encode()).hexdigest()
        assert got[f] == int(h[:3], 16) % 1024, f


def test_weights_shift_with_target(spark):
    """Moving a document into the target slice raises its own weight."""
    rows = [(i, f"tok{i} tok{i} filler common") for i in range(6)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    w_out = {
        r.doc_id: r.logw_x1m
        for r in DS.dsir_weights(
            docs, docs.filter("doc_id = 0")
        ).collect()
    }
    w_in = {
        r.doc_id: r.logw_x1m
        for r in DS.dsir_weights(
            docs, docs.filter("doc_id IN (0, 3)")
        ).collect()
    }
    assert w_in[3] > w_out[3]


def test_bitext_language_variant_pairs(spark):
    """URL-matching bitext candidates: a 3-language group yields all 3
    unordered pairs, keys never collide across hosts, no-segment URLs
    drop, and duplicate rows collapse."""
    from cc_crawl_statistics_spark.operators.bitext import (
        language_variant_pairs,
    )

    urls = [
        "https://a.com/en/about.html",
        "https://a.com/de/about.html",
        "https://a.com/fr/about.html",
        "https://b.com/en/about.html",   # same path, other host: no mix
        "https://b.com/plain/page.html",  # no language segment
        "https://a.com/en/about.html",   # duplicate row
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {
        (r.key, r.lang_a, r.lang_b)
        for r in language_variant_pairs(df).collect()
    }
    assert got == {
        ("https://a.com/<lang>/about.html", "de", "en"),
        ("https://a.com/<lang>/about.html", "de", "fr"),
        ("https://a.com/<lang>/about.html", "en", "fr"),
    }


def test_xxhash64_flavor_same_shape_and_rank_sanity(spark):
    """The scale-flavor hasher must produce the same output contract and
    broadly the same selection behavior (identical doc set, same feature
    counts — bucket values differ, so scores differ numerically but the
    planted-contrast ordering signal survives)."""
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.operators.dsir import dsir_weights

    rows = [(i, "common words filler " * 3) for i in range(40)] + [
        (100 + i, "rare target phrase signal " * 3) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter("doc_id >= 100")
    md5 = dsir_weights(docs, target).collect()
    xx = dsir_weights(docs, target, hasher="xxhash64").collect()
    assert [r["doc_id"] for r in md5] == [r["doc_id"] for r in xx]
    assert [r["n_feats"] for r in md5] == [r["n_feats"] for r in xx]
    # both flavors rank every target-like doc above every raw-only doc
    for res in (md5, xx):
        scores = {r["doc_id"]: r["logw_x1m"] for r in res}
        assert min(scores[d] for d in scores if d >= 100) > max(
            scores[d] for d in scores if d < 100
        )
    # xxhash64 flavor is deterministic across partitionings
    xx2 = dsir_weights(
        docs.repartition(7), target, hasher="xxhash64"
    ).collect()
    assert [tuple(r) for r in xx] == [tuple(r) for r in xx2]
