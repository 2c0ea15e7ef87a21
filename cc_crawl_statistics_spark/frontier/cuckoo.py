"""Partitioned cuckoo filter over the URL-seen key set — the deletable
sibling of the Bloom prefilter (frontier/bloom.py), completing the north
rule's "bloom/cuckoo URL-seen" pair at the same seam.

Same contract as the Bloom: the exact seen anti-join stays the source of
truth; this only PREFILTERS (False = definitely not in the compacted
base). What the cuckoo adds is **deletion**: when the recrawl scheduler
(operators/recrawl.py) re-opens URLs for refetch, their keys can be
removed from the prefilter in place — a Bloom would have to be rebuilt
or would permanently over-filter. Standard partial-key cuckoo hashing
(Fan et al., CoNEXT'14, public): 16-bit fingerprints, 4 slots/bucket,
bucket pair i1 and i2 = i1 XOR hash(fp), so membership and deletion need
only the stored fingerprint.

Partitioned build (the north rule's "partitioned bloom/cuckoo"): keys
route to one of ``n_tables`` independent tables by a hash of the key;
each Spark partition builds the tables for its routed keys with a
VECTORIZED two-pass placement (rank-within-bucket via argsort) and only
the rare overflow tail goes through the sequential eviction loop. At
10^10 keys the tables shard naturally — one per seen-set range
partition — and each is built where its keys live.

Membership is an Arrow-batched pandas UDF over broadcast tables,
signature-identical to bloom.might_contain_udf, so the scheduler's
size-gated prefilter seam (scheduler.py:581-599) accepts either.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .bloom import _C1, _C2, _mix

_C3 = np.uint64(0xD6E8FEB86659FD93)
SLOTS = 4
_MAX_KICKS = 500


def _route(u: np.ndarray, n_tables: int) -> np.ndarray:
    return (_mix(u, _C3) % np.uint64(n_tables)).astype(np.int64)


def _fingerprint(u: np.ndarray) -> np.ndarray:
    fp = (_mix(u, _C2) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _bucket1(u: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_mix(u, _C1) & np.uint64(n_buckets - 1)).astype(np.int64)


def _alt_bucket(b: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    h = _mix(fp.astype(np.uint64), _C1) & np.uint64(n_buckets - 1)
    return (b ^ h.astype(np.int64)) & (n_buckets - 1)


def _n_buckets_for(keys_per_table: int, load_target: float) -> int:
    # size against a routing-variance upper bound, not the mean: a table
    # receives Binomial(n, 1/n_tables) keys, so pad ~6 sigma + slack —
    # negligible relative inflation at scale, decisive at small n
    upper = keys_per_table + int(np.ceil(6 * np.sqrt(keys_per_table))) + 16
    need = max(1, int(np.ceil(upper / (SLOTS * load_target))))
    return 1 << int(np.ceil(np.log2(need)))


def _place_pass(
    table: np.ndarray,
    fill: np.ndarray,
    buckets: np.ndarray,
    fps: np.ndarray,
    pending: np.ndarray,
) -> None:
    """Vectorized placement: every pending key whose candidate bucket has
    a free slot lands there; within-batch collisions resolved by ranking
    keys within equal-bucket runs (argsort), so no slot is written twice."""
    idx = np.flatnonzero(pending)
    if idx.size == 0:
        return
    b = buckets[idx]
    order = np.argsort(b, kind="stable")
    bs = b[order]
    first = np.r_[True, bs[1:] != bs[:-1]]
    group_start = np.maximum.accumulate(
        np.where(first, np.arange(bs.size), 0)
    )
    rank = np.arange(bs.size) - group_start
    slot = fill[bs] + rank
    ok = slot < SLOTS
    placed = idx[order[ok]]
    table[bs[ok], slot[ok]] = fps[placed]
    np.add.at(fill, bs[ok], 1)
    pending[placed] = False


def _insert_keys(
    table: np.ndarray, fill: np.ndarray, u: np.ndarray, n_buckets: int
) -> None:
    fps = _fingerprint(u)
    b1 = _bucket1(u, n_buckets)
    b2 = _alt_bucket(b1, fps, n_buckets)
    pending = np.ones(len(u), dtype=bool)
    _place_pass(table, fill, b1, fps, pending)
    _place_pass(table, fill, b2, fps, pending)
    # sequential eviction tail (rare below ~0.9 load)
    for i in np.flatnonzero(pending):
        fp, b = int(fps[i]), int(b1[i])
        for kick in range(_MAX_KICKS):
            row = table[b]
            free = np.flatnonzero(row == 0)
            if free.size:
                table[b, free[0]] = fp
                fill[b] += 1
                break
            # deterministic but bucket/fp-varied victim slot (a fixed
            # cycling order can ping-pong between two buckets forever)
            victim = (kick + fp + b) % SLOTS
            fp, table[b, victim] = int(table[b, victim]), fp
            alt = _alt_bucket(
                np.array([b]), np.array([fp], dtype=np.uint16), n_buckets
            )
            b = int(alt[0])
        else:
            raise RuntimeError(
                "cuckoo build failed after max kicks — lower load_target"
            )


def build_cuckoo(
    seen: DataFrame,
    key_col: str = "seen_key",
    n_tables: int = 8,
    load_target: float = 0.8,
) -> dict:
    """Partition-parallel build: keys repartition by routed table id (all
    of a table's keys land in one Spark partition), each partition builds
    its tables vectorized, the driver assembles the table dict."""
    n_keys = seen.count()
    keys_per_table = max(1, (n_keys + n_tables - 1) // n_tables)
    n_buckets = _n_buckets_for(keys_per_table, load_target)

    # routing must use the SAME mix as the lookup UDF — compute it in
    # pandas, not Spark SQL, to keep one hash definition
    route_udf = pandas_udf(
        lambda s: pd.Series(
            _route(s.to_numpy(dtype=np.int64).view(np.uint64), n_tables)
        ),
        "long",
    )
    routed = seen.select(F.col(key_col).alias("k")).withColumn(
        "_tbl", route_udf(F.col("k"))
    )

    def per_partition(batches):
        tables: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for tbl, grp in pdf.groupby("_tbl"):
                if tbl not in tables:
                    tables[tbl] = (
                        np.zeros((n_buckets, SLOTS), dtype=np.uint16),
                        np.zeros(n_buckets, dtype=np.int64),
                    )
                table, fill = tables[tbl]
                u = grp["k"].to_numpy(dtype=np.int64).view(np.uint64)
                _insert_keys(table, fill, u, n_buckets)
        if tables:
            yield pd.DataFrame(
                {
                    "tbl": list(tables),
                    "buckets": [t.tobytes() for t, _ in tables.values()],
                }
            )

    parts = (
        routed.repartition(n_tables, "_tbl")
        .mapInPandas(per_partition, "tbl long, buckets binary")
        .collect()
    )
    tables = [
        np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        for _ in range(n_tables)
    ]
    for row in parts:
        tables[row.tbl] = np.frombuffer(
            row.buckets, dtype=np.uint16
        ).reshape(n_buckets, SLOTS).copy()
    return {
        "tables": tables,
        "n_buckets": n_buckets,
        "n_tables": n_tables,
        "n_keys": n_keys,
    }


def contains(f: dict, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership over int64 keys (True = maybe present)."""
    u = keys.astype(np.int64).view(np.uint64)
    tbl = _route(u, f["n_tables"])
    fps = _fingerprint(u)
    b1 = _bucket1(u, f["n_buckets"])
    b2 = _alt_bucket(b1, fps, f["n_buckets"])
    out = np.zeros(len(keys), dtype=bool)
    for t in np.unique(tbl):
        m = tbl == t
        table = f["tables"][t]
        hit1 = (table[b1[m]] == fps[m][:, None]).any(axis=1)
        hit2 = (table[b2[m]] == fps[m][:, None]).any(axis=1)
        out[m] = hit1 | hit2
    return out


def delete_keys(f: dict, keys: np.ndarray) -> int:
    """Remove keys in place (one fingerprint slot each); returns how many
    were found. Only ever called with keys that were inserted (recrawl
    re-open lists, bounded per round), per cuckoo-filter semantics —
    deleting a never-inserted key could evict a colliding sibling."""
    u = keys.astype(np.int64).view(np.uint64)
    tbl = _route(u, f["n_tables"])
    fps = _fingerprint(u)
    b1 = _bucket1(u, f["n_buckets"])
    b2 = _alt_bucket(b1, fps, f["n_buckets"])
    removed = 0
    for i in range(len(keys)):
        table = f["tables"][tbl[i]]
        for b in (b1[i], b2[i]):
            slots = np.flatnonzero(table[b] == fps[i])
            if slots.size:
                table[b, slots[0]] = 0
                removed += 1
                break
    return removed


def save_cuckoo(f: dict, path: str) -> None:
    header = np.array(
        [f["n_tables"], f["n_buckets"], f["n_keys"]], dtype=np.int64
    )
    with open(path, "wb") as fh:
        np.save(fh, header)
        np.save(fh, np.stack(f["tables"]))


def load_cuckoo(path: str) -> dict:
    with open(path, "rb") as fh:
        header = np.load(fh)
        stacked = np.load(fh)
    return {
        "tables": [stacked[i].copy() for i in range(int(header[0]))],
        "n_tables": int(header[0]),
        "n_buckets": int(header[1]),
        "n_keys": int(header[2]),
    }


def might_contain_udf(spark, f: dict):
    """Arrow-batched membership test, signature-identical to
    bloom.might_contain_udf — the scheduler's prefilter seam takes
    either. Tables ride as one broadcast per executor."""
    b = spark.sparkContext.broadcast(
        (
            np.stack(f["tables"]).tobytes(),
            f["n_tables"],
            f["n_buckets"],
        )
    )

    @pandas_udf("boolean")
    def _might(keys: pd.Series) -> pd.Series:
        blob, n_tables, n_buckets = b.value
        tables = np.frombuffer(blob, dtype=np.uint16).reshape(
            n_tables, n_buckets, SLOTS
        )
        arr = keys.to_numpy(dtype=np.int64)
        if len(arr) == 0:
            return pd.Series([], dtype=bool)
        local = {
            "tables": [tables[i] for i in range(n_tables)],
            "n_tables": n_tables,
            "n_buckets": n_buckets,
        }
        return pd.Series(contains(local, arr))

    return _might
