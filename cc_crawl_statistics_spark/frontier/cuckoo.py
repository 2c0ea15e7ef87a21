"""Partial-key cuckoo-filter kernels for the sharded URL-seen prefilter
— the deletable sibling of the Bloom (frontier/bloom.py), completing the
north rule's "bloom/cuckoo URL-seen" pair at the same seam.

Same contract as the Bloom: the exact seen anti-join stays the source of
truth; the prefilter only short-circuits definitely-absent keys. What
the cuckoo adds is **deletion**: when the recrawl scheduler
(operators/recrawl.py) re-opens URLs for refetch, their keys can be
removed from the prefilter in place — a Bloom would have to be rebuilt
or would permanently over-filter. Standard partial-key cuckoo hashing
(Fan et al., CoNEXT'14, public): 16-bit fingerprints, 4 slots/bucket,
bucket pair i1 and i2 = i1 XOR hash(fp), so membership and deletion need
only the stored fingerprint.

This module holds only the vectorized per-table math: fingerprint/bucket
mixes, the two-pass argsort placement kernel (only the rare overflow
tail goes through the sequential eviction loop), and in-memory
membership. Everything stateful — build, storage, membership UDF,
deletion as a Spark job — lives in frontier/shardedfilter.py, where the
filter exists ONLY as independent key-range shard files: there is
deliberately no code anywhere that builds, loads, or broadcasts a whole
filter as one object (legacy single-blob stores migrate on touch,
SnapshotStore.migrate_prefilter).
"""

from __future__ import annotations

import numpy as np

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
