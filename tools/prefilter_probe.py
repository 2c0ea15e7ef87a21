"""Sharded-vs-legacy prefilter A/B (r4, VERDICT #1 'Done' evidence):
build time and membership-filter throughput at a seen-set size where the
prefilter actually engages (default 5M keys — past the scheduler's
bloom_min_seen envelope at sandbox scale), plus the driver-resident
object sizes that motivated the sharding. Prints one JSON line.

    python tools/prefilter_probe.py [n_keys] [n_probe]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from cc_crawl_statistics_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_probe = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark(app_name="prefilter-probe")
    scratch = tempfile.mkdtemp(
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    seen_path = os.path.join(scratch, "seen")
    spark.range(n_keys).select(
        F.xxhash64(F.col("id").cast("string")).alias("seen_key")
    ).repartition(32).write.mode("overwrite").parquet(seen_path)
    seen = spark.read.parquet(seen_path)
    # half the probes are true members (ids below n_keys), half are novel
    # — so one pass measures recall (must be total) AND the FP rate
    probes = spark.range(
        n_keys - n_probe // 2, n_keys + n_probe // 2
    ).select(
        F.xxhash64(F.col("id").cast("string")).alias("seen_key"),
        (F.col("id") < n_keys).alias("is_member"),
    )
    n_true = n_probe // 2
    out = {"n_keys": n_keys, "n_probe": n_probe}

    from cc_crawl_statistics_spark.frontier import bloom as BL
    from cc_crawl_statistics_spark.frontier import shardedfilter as SH

    # legacy: driver-merged blob + broadcast membership. This strawman
    # lives ONLY here, as the probe's A/B comparator — the engine's
    # driver-OR build path was deleted in round 5 (legacy stores migrate
    # on touch, SnapshotStore.migrate_prefilter), so the probe carries
    # its own copy of the retired design to keep measuring against it.
    import math as _math

    import numpy as _np
    import pandas as _pd

    def _legacy_build_bloom(seen_df, bits_per_key=10):
        n = seen_df.count()
        m = max(64, n * bits_per_key)
        k = max(1, round(bits_per_key * _math.log(2)))
        n_bytes = (m + 7) // 8

        def per_partition(batches):
            bits = _np.zeros(n_bytes, dtype=_np.uint8)
            for pdf in batches:
                keys = pdf["seen_key"].to_numpy(dtype=_np.int64)
                if len(keys) == 0:
                    continue
                idx = BL._indices(keys, m, k).ravel()
                _np.bitwise_or.at(
                    bits, idx >> 3,
                    _np.uint8(1) << (idx & 7).astype(_np.uint8),
                )
            yield _pd.DataFrame({"bits": [bits.tobytes()]})

        partials = (
            seen_df.select("seen_key")
            .mapInPandas(per_partition, "bits binary")
            .collect()
        )
        merged = _np.zeros(n_bytes, dtype=_np.uint8)
        for r in partials:
            merged |= _np.frombuffer(r.bits, dtype=_np.uint8)
        return {"bits": merged, "m": m, "k": k}

    def _legacy_might_udf(spark, blob):
        from pyspark.sql.functions import pandas_udf

        b = spark.sparkContext.broadcast(
            (blob["bits"].tobytes(), blob["m"], blob["k"])
        )

        @pandas_udf("boolean")
        def _might(keys: _pd.Series) -> _pd.Series:
            bits_bytes, m, k = b.value
            bits = _np.frombuffer(bits_bytes, dtype=_np.uint8)
            arr = keys.to_numpy(dtype=_np.int64)
            if len(arr) == 0:
                return _pd.Series([], dtype=bool)
            idx = BL._indices(arr, m, k)
            hit = (bits[idx >> 3] >> (idx & 7).astype(_np.uint8)) & 1
            return _pd.Series(hit.all(axis=1).astype(bool))

        return _might

    t0 = time.time()
    blob = _legacy_build_bloom(seen)
    out["legacy_build_sec"] = round(time.time() - t0, 2)
    out["legacy_blob_bytes"] = int(blob["bits"].nbytes)
    might_legacy = _legacy_might_udf(spark, blob)
    t0 = time.time()
    row = (
        probes.withColumn("m", might_legacy(F.col("seen_key")))
        .agg(
            F.sum(F.when(F.col("is_member") & F.col("m"), 1).otherwise(0)),
            F.sum(F.when(~F.col("is_member") & F.col("m"), 1).otherwise(0)),
        )
        .first()
    )
    out["legacy_filter_sec"] = round(time.time() - t0, 2)
    out["legacy_recall_total"] = bool(row[0] == n_true)
    out["legacy_fp_permille"] = int(row[1]) * 1000 // n_true

    # sharded: executor-built shard files, lazy-loading membership
    d = os.path.join(scratch, "bloom.d")
    t0 = time.time()
    header = SH.build_sharded_bloom(seen, d)
    out["sharded_build_sec"] = round(time.time() - t0, 2)
    out["n_shards"] = header["n_shards"]
    out["shard_bytes"] = header["shard_bytes"]
    might_sharded = SH.might_contain_udf(spark, d)
    t0 = time.time()
    row = (
        probes.withColumn("m", might_sharded(F.col("seen_key")))
        .agg(
            F.sum(F.when(F.col("is_member") & F.col("m"), 1).otherwise(0)),
            F.sum(F.when(~F.col("is_member") & F.col("m"), 1).otherwise(0)),
        )
        .first()
    )
    out["sharded_filter_sec"] = round(time.time() - t0, 2)
    out["sharded_recall_total"] = bool(row[0] == n_true)
    out["sharded_fp_permille"] = int(row[1]) * 1000 // n_true
    # warm (shard cache populated) second pass — the steady-state cost
    t0 = time.time()
    probes.filter(might_sharded(F.col("seen_key"))).count()
    out["sharded_filter_warm_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
