"""Materialized Bloom prefilter over the URL-seen key set.

The exact seen anti-join stays the source of truth; the Bloom only
PREFILTERS: a candidate key the Bloom rejects is *definitely not* in the
compacted base, so it can skip the base anti-join entirely (it still
anti-joins the small post-compaction deltas). A "maybe" key goes through
the full exact anti-join — results are bit-identical with or without the
Bloom (tested).

Representation: an m-bit array (numpy uint8, packed), k index functions
via double hashing over two splitmix64-style mixes of the 64-bit seen
key. Build is partition-parallel (mapInPandas emits one packed partial
bloom per partition, OR-merged on the driver — the treeAggregate shape);
membership is an Arrow-batched pandas UDF over the broadcast bit array.
No per-row Python anywhere (input_hint: vectorized pandas/Arrow UDFs).

Sizing: bits_per_key=10 ≈ 1% FPR with k=7; at 10^10 keys that is
~12.5 GB total — sharded per range partition in a real deployment (the
store keeps one bloom per compacted base here, one file per store at
sandbox scale)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray, c: np.uint64) -> np.ndarray:
    """splitmix64-style avalanche over uint64 (vectorized, wrap-around)."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(30))
        x = x * c
        x = x ^ (x >> np.uint64(27))
        x = x * _C2
        return x ^ (x >> np.uint64(31))


def _indices(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(keys), k) bit indices by double hashing h1 + i*h2 mod m."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = _mix(u, _C1)
    h2 = _mix(u ^ _C2, _C1) | np.uint64(1)  # odd → full period
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(
            np.int64
        )


def _params(n_keys: int, bits_per_key: int) -> tuple[int, int]:
    m = max(64, n_keys * bits_per_key)
    k = max(1, round(bits_per_key * math.log(2)))
    return m, k


def build_bloom(
    seen: DataFrame, key_col: str = "seen_key", bits_per_key: int = 10
) -> dict:
    """Build the packed bloom from a seen-key DataFrame. Partition-
    parallel: each partition sets its keys' bits into a local packed
    array; the driver ORs the partials."""
    n_keys = seen.count()
    m, k = _params(n_keys, bits_per_key)
    n_bytes = (m + 7) // 8

    def per_partition(batches):
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            if len(keys) == 0:
                continue
            idx = _indices(keys, m, k).ravel()
            np.bitwise_or.at(
                bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8)
            )
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = (
        seen.select(key_col)
        .mapInPandas(per_partition, "bits binary")
        .collect()
    )
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for row in partials:
        merged |= np.frombuffer(row.bits, dtype=np.uint8)
    return {"bits": merged, "m": m, "k": k, "n_keys": n_keys}


def save_bloom(bloom: dict, path: str) -> None:
    header = np.array([bloom["m"], bloom["k"], bloom["n_keys"]], dtype=np.int64)
    with open(path, "wb") as f:
        np.save(f, header)
        np.save(f, bloom["bits"])


def load_bloom(path: str) -> dict:
    with open(path, "rb") as f:
        header = np.load(f)
        bits = np.load(f)
    return {
        "bits": bits,
        "m": int(header[0]),
        "k": int(header[1]),
        "n_keys": int(header[2]),
    }


def might_contain_udf(spark, bloom: dict):
    """Arrow-batched membership test: True = maybe in set, False =
    definitely not. The bit array rides to executors as a Spark broadcast
    (one copy per executor, not per task)."""
    b = spark.sparkContext.broadcast(
        (bloom["bits"].tobytes(), bloom["m"], bloom["k"])
    )

    @pandas_udf("boolean")
    def _might(keys: pd.Series) -> pd.Series:
        bits_bytes, m, k = b.value
        bits = np.frombuffer(bits_bytes, dtype=np.uint8)
        arr = keys.to_numpy(dtype=np.int64)
        if len(arr) == 0:
            return pd.Series([], dtype=bool)
        idx = _indices(arr, m, k)
        hit = (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1).astype(bool))

    return _might
