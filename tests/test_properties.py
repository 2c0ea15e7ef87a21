"""Property-based tests (hypothesis) for the pure-Python compat codecs —
the reference's MultiCount run-length compression semantics
(/root/reference/crawlstats.py:388-435) and the HLL union algebra. These
pin the algebraic laws the distributed merges rely on: any partitioning of
the inputs must merge to the same result."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cc_crawl_statistics_spark.sources.compat import (
    compress_counts,
    expand_counts,
    merge_compressed,
)
from cc_crawl_statistics_spark.sources.hll_compat import RefHLL

counts_vec = st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=6)


@given(counts_vec)
def test_compress_expand_roundtrip(v):
    assert expand_counts(compress_counts(v), len(v)) == v


@given(counts_vec)
def test_compress_idempotent_shape(v):
    c = compress_counts(v)
    if isinstance(c, list):
        # compressed lists never end with a repeated trailing value
        assert len(c) >= 2 and c[-1] != c[-2]
    else:
        assert all(x == v[0] for x in v)


@given(st.lists(counts_vec, min_size=2, max_size=5))
def test_merge_equals_elementwise_sum(vs):
    width = max(len(v) for v in vs)
    expected = [
        sum(expand_counts(compress_counts(v), width)[i] for v in vs)
        for i in range(width)
    ]
    got = merge_compressed([compress_counts(v) for v in vs])
    assert expand_counts(got, width) == expected


@given(st.lists(counts_vec, min_size=2, max_size=5))
def test_merge_associative_any_split(vs):
    """Merging in two stages (any split point) equals one-shot merge —
    the map-side-combine law."""
    comp = [compress_counts(v) for v in vs]
    one_shot = merge_compressed(comp)
    for k in range(1, len(comp)):
        left = merge_compressed(comp[:k]) if k > 1 else comp[0]
        right = merge_compressed(comp[k:]) if len(comp) - k > 1 else comp[k]
        assert merge_compressed([left, right]) == one_shot


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=4),
)
def test_hll_union_partition_invariant(values, n_parts):
    """Union of per-partition sketches equals the single-sketch build for
    ANY partitioning of the input — the property that makes the sketch safe
    to compute distributed."""
    whole = RefHLL(0.05)
    parts = [RefHLL(0.05) for _ in range(n_parts)]
    for i, v in enumerate(values):
        whole.add(v)
        parts[i % n_parts].add(v)
    merged = parts[0]
    for p in parts[1:]:
        merged.update(p)
    assert merged.M == whole.M


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=20), max_size=200))
def test_hll_insensitive_to_duplicates_and_order(values):
    a, b = RefHLL(0.05), RefHLL(0.05)
    for v in values:
        a.add(v)
    for v in reversed(values + values):
        b.add(v)
    assert a.M == b.M


# ---------------------------------------------------------------------------
# cuckoo filter insert/contains/delete kernel (pure numpy, no Spark)
# ---------------------------------------------------------------------------

int64_keys = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    min_size=1,
    max_size=400,
    unique=True,
)


def _fresh_table(n_keys):
    from cc_crawl_statistics_spark.frontier import cuckoo as CK

    n_buckets = CK._n_buckets_for(n_keys, 0.8)
    import numpy as np

    return (
        np.zeros((n_buckets, CK.SLOTS), dtype=np.uint16),
        np.zeros(n_buckets, dtype=np.int64),
        n_buckets,
    )


@settings(max_examples=40, deadline=None)
@given(int64_keys)
def test_cuckoo_no_false_negatives_property(keys):
    import numpy as np

    from cc_crawl_statistics_spark.frontier import cuckoo as CK

    arr = np.array(keys, dtype=np.int64)
    table, fill, n_buckets = _fresh_table(len(arr))
    CK._insert_keys(table, fill, arr.view(np.uint64), n_buckets)
    f = {"tables": [table], "n_tables": 1, "n_buckets": n_buckets}
    assert CK.contains(f, arr).all()


@settings(max_examples=25, deadline=None)
@given(int64_keys)
def test_cuckoo_delete_keeps_remaining_property(keys):
    """The vectorized deletion kernel removes every inserted victim and
    never disturbs the remaining keys' no-false-negative guarantee —
    and is bit-identical to the sequential per-key reference loop."""
    import numpy as np

    from cc_crawl_statistics_spark.frontier import cuckoo as CK
    from cc_crawl_statistics_spark.frontier import shardedfilter as SH

    arr = np.array(keys, dtype=np.int64)
    table, fill, n_buckets = _fresh_table(len(arr))
    CK._insert_keys(table, fill, arr.view(np.uint64), n_buckets)
    victims, rest = arr[: len(arr) // 2], arr[len(arr) // 2 :]

    ref = table.copy()
    u = victims.view(np.uint64)
    fps = CK._fingerprint(u)
    b1 = CK._bucket1(u, n_buckets)
    b2 = CK._alt_bucket(b1, fps, n_buckets)
    ref_removed = 0
    for i in range(len(victims)):
        for b in (b1[i], b2[i]):
            slots = np.flatnonzero(ref[b] == fps[i])
            if slots.size:
                ref[b, slots[0]] = 0
                ref_removed += 1
                break

    got = SH._delete_from_table(table, u, n_buckets)
    assert got == ref_removed == len(victims)
    assert np.array_equal(table, ref)
    if len(rest):
        f = {"tables": [table], "n_tables": 1, "n_buckets": n_buckets}
        assert CK.contains(f, rest).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=120,
        unique=True,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_vectorized_delete_bit_identical_with_duplicates(keys, dup_factor):
    """Adversarial flavor of the r5 deletion-kernel property: the victim
    list REPEATS keys (dup_factor concatenated copies), forcing shared
    candidate pairs into the ordered fallback path; the result must stay
    bit-identical to the sequential reference loop — table bytes AND
    removed count — even though duplicate deletions beyond a key's
    inserted copies clear fingerprint-colliding residue."""
    import numpy as np

    from cc_crawl_statistics_spark.frontier import cuckoo as CK
    from cc_crawl_statistics_spark.frontier import shardedfilter as SH

    arr = np.array(keys, dtype=np.int64)
    table, fill, n_buckets = _fresh_table(len(arr))
    CK._insert_keys(table, fill, arr.view(np.uint64), n_buckets)
    victims = np.concatenate([arr[: max(1, len(arr) // 2)]] * dup_factor)
    u = victims.view(np.uint64)

    ref = table.copy()
    fps = CK._fingerprint(u)
    b1 = CK._bucket1(u, n_buckets)
    b2 = CK._alt_bucket(b1, fps, n_buckets)
    ref_removed = 0
    for i in range(len(u)):
        for b in (b1[i], b2[i]):
            slots = np.flatnonzero(ref[b] == fps[i])
            if slots.size:
                ref[b, slots[0]] = 0
                ref_removed += 1
                break

    got = SH._delete_from_table(table, u, n_buckets)
    assert got == ref_removed
    assert np.array_equal(table, ref)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=300,
        unique=True,
    ),
    st.integers(min_value=2, max_value=16),
)
def test_shard_route_total_and_stable(keys, n_shards):
    """The shard router is a total function onto [0, n_shards) and
    deterministic — the property both the build (each key written to
    exactly one shard) and membership (the same shard consulted) rest
    on; a missing shard therefore proves absence."""
    import numpy as np

    from cc_crawl_statistics_spark.frontier import shardedfilter as SH

    arr = np.array(keys, dtype=np.int64)
    r1 = SH._route(arr, n_shards)
    r2 = SH._route(arr.copy(), n_shards)
    assert (r1 == r2).all()
    assert ((r1 >= 0) & (r1 < n_shards)).all()
