"""Reference-format HLL codec: accuracy, mergeability, JSON roundtrip,
wire-line shape (SURVEY.md §7 hard part 1)."""

from __future__ import annotations

import json

from cc_crawl_statistics_spark.sources.hll_compat import (
    RefHLL,
    decode_size_estimate_line,
    encode_size_estimate_line,
)


def test_reference_precision_settings():
    hll = RefHLL(0.01)  # HYPERLOGLOG_ERROR = .01 (crawlstats.py:22)
    assert hll.p == 14 and hll.m == 16384
    assert 0.72 < hll.alpha < 0.7214


def test_cardinality_within_error():
    hll = RefHLL(0.01)
    n = 50_000
    for i in range(n):
        hll.add(f"http://site{i % 997}.example/page/{i}")
    assert abs(len(hll) - n) / n < 0.02  # 2 sigma at 1% RSE


def test_small_range_exact_ish():
    hll = RefHLL(0.01)
    for i in range(100):
        hll.add(f"u{i}")
    assert abs(len(hll) - 100) <= 2


def test_union_merge_equals_combined():
    a, b, ab = RefHLL(0.01), RefHLL(0.01), RefHLL(0.01)
    for i in range(10_000):
        (a if i % 2 else b).add(f"v{i}")
        ab.add(f"v{i}")
    a.update(b)
    assert a.M == ab.M  # register-wise max is exactly the combined sketch
    assert len(a) == len(ab)


def test_json_roundtrip_and_wire_line():
    hll = RefHLL(0.01)
    for i in range(5000):
        hll.add(f"d{i}")
    line = encode_size_estimate_line("url", "CC-MAIN-2024-10", hll)
    key, val = line.split("\t", 1)
    assert json.loads(key) == ["size_estimate", "url", "CC-MAIN-2024-10"]
    d = json.loads(val)
    assert d["__type__"] == "HyperLogLog"
    assert set(d) == {"__type__", "card", "p", "M", "m", "alpha"}
    item_type, crawl, back = decode_size_estimate_line(line)
    assert (item_type, crawl) == ("url", "CC-MAIN-2024-10")
    assert back.M == hll.M and back.card() == hll.card()


def test_determinism():
    a, b = RefHLL(0.01), RefHLL(0.01)
    for i in range(1000):
        a.add(f"x{i}")
        b.add(f"x{i}")
    assert a.to_json_dict() == b.to_json_dict()
