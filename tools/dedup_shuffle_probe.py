"""Measure shuffle volume of the text-dedup plans (r2 'slim the joins'
verification): runs minhash_lsh_pairs / ngram_jaccard_pairs against a
scaled document corpus alongside the r1-shaped variants (shingle arrays
riding the band explode; uncapped inverted index) and reports total
shuffle write bytes per plan from the Spark event log.

Usage: python tools/dedup_shuffle_probe.py [scale_factor]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.operators import dedup as D
from cc_crawl_statistics_spark.session import get_spark


def old_minhash(docs, n_hashes=64, bands=16, jaccard_threshold=0.5):
    """r1 shape: shingle arrays ride the ×bands explode and bucket join."""
    rows = n_hashes // bands
    sig = (
        D.with_word_shingles(docs, "text", 3)
        .select("doc_id", "sh")
        .filter(F.size("sh") > 0)
        .withColumn("sig", D.minhash_signature(F.col("sh"), n_hashes))
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
        "band", "bucket", F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    right = banded.select(
        "band", "bucket", F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return cand.select(
        "doc_a", "doc_b", inter.alias("inter"), union.alias("uni")
    ).filter(F.col("inter") >= F.lit(jaccard_threshold) * F.col("uni"))


def shuffle_bytes_since(log_glob: str, marker: float) -> int:
    total = 0
    paths = []
    for p in glob.glob(log_glob):
        if os.path.isdir(p):
            paths += [os.path.join(p, f) for f in os.listdir(p)]
        else:
            paths.append(p)
    for path in paths:
        if os.path.getmtime(path) < marker - 5 or path.endswith("appstatus"):
            continue
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    for acc in si.get("Accumulables", []):
                        if acc.get("Name") == "internal.metrics.shuffle.write.bytesWritten":
                            total += int(acc.get("Value", 0))
    return total


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    import shutil

    per_plan = {}
    for name, fn_name in (
        ("minhash_r2_ids_only", "new"),
        ("ngram_r2_capped", "ngram"),
        ("minhash_r1_arrays_through_bands", "old"),
    ):
        logdir = tempfile.mkdtemp(prefix="dedup_evlog_")
        spark = get_spark(
            app_name=f"probe-{fn_name}",
            cores=32,
            shuffle_partitions=32,
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
                "spark.eventLog.dir": logdir,
                "spark.ui.showConsoleProgress": "false",
            },
        )
        docs = (
            spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
            .repartition(64)
            .selectExpr(
                f"explode(sequence(0, {factor - 1})) AS i", "doc_id", "text"
            )
            .selectExpr(f"doc_id * {factor} + i AS doc_id", "text")
        )
        docs.cache().count()
        marker = time.time()
        try:
            if fn_name == "new":
                n = D.minhash_lsh_pairs(docs).count()
            elif fn_name == "old":
                n = old_minhash(docs).count()
            else:
                n = D.ngram_jaccard_pairs(docs).count()
            err = None
        except Exception as e:  # the r1 shape OOMs beyond small factors
            n, err = None, str(e).split("\n")[0][:120]
        t = time.time() - marker
        spark.stop()
        time.sleep(2)
        sb = shuffle_bytes_since(os.path.join(logdir, "*"), 0)
        per_plan[name] = {
            "pairs": n,
            "sec": round(t, 1),
            "shuffle_write_bytes": sb,
        }
        if err:
            per_plan[name]["failed"] = err
        shutil.rmtree(logdir, ignore_errors=True)
    print(
        json.dumps(
            {"factor": factor, "docs": 5000 * factor, "plans": per_plan},
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
