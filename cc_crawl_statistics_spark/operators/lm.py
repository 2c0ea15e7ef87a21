"""CCNet-style n-gram language-model perplexity filtering.

The canonical webtext curation step downstream of the reference's
language counting (/root/reference/crawlstats.py primary-language fields):
train a smoothed bigram LM on a trusted reference slice of the corpus,
score every document's cross-entropy under it, and drop the
high-perplexity tail (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data" — there a KenLM 5-gram; here an
add-one-smoothed bigram model whose training AND scoring are pure
DataFrame aggregations, no ML runtime).

Everything is integer fixed-point: conditional log-probabilities are
``floor(1e6 * ln((c(w1,w2)+1) / (c(w1)+V)))`` (the same construction as
the Naive Bayes weights in textstats.py, measured bit-identical between
Spark's Math.log and DuckDB's libm), per-document scores are integer sums
of those, and the per-token cross-entropy is an integer ``div`` — so
every output is engine-exact and order-independent.

Scale shape: training is two map-side-combined aggregations over the
reference slice's bigrams (context counts + bigram counts — the slice is
a small fraction of the corpus by construction); scoring pre-aggregates
each document's bigrams to (doc_id, w1, w2, cnt) so each distinct pair
crosses the wire once, then joins the model. The model table is
vocabulary-sized, not corpus-sized — broadcast it when the reference
slice is small, let AQE pick the strategy otherwise (no hint pinned
here). The unseen-bigram / unseen-context penalties fall out of the same
smoothing formula with c2=0 / c1=0, so scoring is ONE formula over a
left join, not a backoff cascade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def _words(text_col: str) -> Column:
    """Whitespace tokens with empties removed (adjacency is defined over
    the FILTERED sequence, matching the DuckDB oracle's list_filter)."""
    return F.filter(
        F.split(F.col(text_col), " "), lambda x: x != F.lit("")
    )


def bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair. Documents with
    fewer than two tokens contribute nothing. Pure higher-order functions:
    the pairing happens inside one codegen projection, no self-join."""
    w = _words(text_col)
    n = F.size(w)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(w, 1, n - 1),
            F.slice(w, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return docs.select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", "p.w1", "p.w2")


def lm_train_bigram(ref_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Train the smoothed bigram model on the reference slice; returns
    (w1, w2, c_bigram, c_context, v, logp_x1m) where

      logp_x1m = floor(1e6 * ln((c_bigram + 1) / (c_context + V)))

    with V = distinct token count of the slice (all positions). The table
    has one row per OBSERVED bigram; unseen pairs score through the same
    formula with c_bigram=0 (and c_context=0 for unseen contexts), so no
    dense materialization is ever needed."""
    bg = bigrams(ref_docs, text_col)
    c2 = bg.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c_bigram")
    )
    c1 = bg.groupBy("w1").agg(F.count("*").cast("long").alias("c_context"))
    vocab = (
        ref_docs.select(F.explode(_words(text_col)).alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    return (
        c2.join(c1, "w1")
        .join(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            "c_bigram",
            "c_context",
            "v",
            F.floor(
                F.lit(SCALE)
                * F.log(
                    (F.col("c_bigram") + 1).cast("double")
                    / (F.col("c_context") + F.col("v")).cast("double")
                )
            )
            .cast("long")
            .alias("logp_x1m"),
        )
    )


def lm_cross_entropy(
    docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Score every document under the reference-slice bigram LM:
    (doc_id, n_bigrams, xent_mnat) with

      xent_mnat = (-sum_i ln P(w_i | w_{i-1})) / n_bigrams

    in integer milli-nats (floor). Documents with < 2 tokens carry
    n_bigrams = 0 and NULL xent_mnat (no evidence either way — the filter
    keeps them). Unseen bigrams/contexts go through the shared smoothing
    formula, not a separate penalty path.

    Join shape (measured at 1.3e8 bigram occurrences): the bigram stream
    joins the model DIRECTLY — no (doc_id, w1, w2) pre-aggregation. The
    pre-agg looked like map-side thrift but within-document bigram repeats
    are rare (~1.1x), so it was a full stream shuffle bought for nothing:
    dropping it measured 1.55x faster with identical output, and the
    per-doc sums still collapse map-side because a document's bigrams
    never leave their input partition until AFTER they are reduced to one
    partial row per doc. With ``broadcast_model=True`` (callers who KNOW
    the reference slice is small — e.g. the capped trusted slice) the
    stream is never shuffled at all: measured a further 1.8x (2.8x total).
    Default False: AQE picks broadcast vs shuffle from the model's runtime
    size, which is the right call for open-vocabulary reference slices
    whose bigram table can exceed broadcast limits."""
    # the model feeds THREE independent subplans (pair weights, context
    # counts, vocab scalar) — without a lineage cut each broadcast build
    # re-executes the whole training aggregation; the lazy localCheckpoint
    # runs training once and the other branches read the stored partitions
    # (measured: 9.2-10.2 s → 6.9-8.0 s per scoring pass at 1.3e8 bigram
    # occurrences, identical output)
    model = lm_train_bigram(ref_docs, text_col).localCheckpoint(eager=False)
    mdl = model.select("w1", "w2", "logp_x1m")
    ctx = model.select("w1", "c_context").distinct()
    vocab = model.select("v").distinct()
    if broadcast_model:
        mdl, ctx = F.broadcast(mdl), F.broadcast(ctx)
    scored = (
        bigrams(docs, text_col)
        .join(mdl, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            F.coalesce(
                F.col("logp_x1m"),
                F.floor(
                    F.lit(SCALE)
                    * F.log(
                        F.lit(1.0)
                        / (
                            F.coalesce(F.col("c_context"), F.lit(0))
                            + F.col("v")
                        ).cast("double")
                    )
                ).cast("long"),
            ).alias("lp"),
        )
    )
    sums = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("lp").cast("long").alias("s"),
    )
    return (
        docs.select("doc_id")
        .join(sums, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("long")
            .alias("n_bigrams"),
            F.when(
                F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                F.expr("(-s) div (n_bigrams * 1000)"),
            )
            .cast("long")
            .alias("xent_mnat"),
        )
    )


def lm_quality_partition(
    docs: DataFrame,
    ref_docs: DataFrame,
    threshold_mnat: int,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """The CCNet head/tail split as per-group counts: documents at or
    under the cross-entropy threshold are kept (plus the no-evidence
    n_bigrams=0 docs), the rest dropped. Returns (group, kept, dropped)
    — the aggregate view a 100-TB run reports per language/bucket."""
    xent = lm_cross_entropy(docs, ref_docs, text_col)
    keep = F.col("xent_mnat").isNull() | (
        F.col("xent_mnat") <= threshold_mnat
    )
    return (
        docs.select("doc_id", F.col(group_col).alias("grp"))
        .join(xent, "doc_id")
        .groupBy("grp")
        .agg(
            F.sum(keep.cast("long")).alias("kept"),
            F.sum((~keep).cast("long")).alias("dropped"),
        )
        .orderBy("grp")
    )
