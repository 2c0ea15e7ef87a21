"""Portable integer hash — one definition both Spark and DuckDB can
evaluate bit-for-bit.

The sketch operators (operators/sketches.py, dedup.py) hash with
``xxhash64``, which no other engine reproduces, so their queries are
rows-only at the driver's oracle gate. This module provides the
*verification* hash that upgrades the sketch class to exact hash-match
(VERDICT r3 "Next round" #5): a polynomial rolling hash over ASCII
codes, folded modulo a prime after every step so the accumulator never
leaves int64 in either engine::

    h(s)        = fold_{c in s} (31·acc + ascii(c)) mod P,   P = 10^9+7
    h_i(s)      = (A_i·h(s) + B_i) mod P                     (seeded family)

Both engines evaluate it with their native higher-order functions —
Spark ``aggregate(transform(split(...)))``, DuckDB
``list_reduce(list_prepend(0, list_transform(string_split(...))))`` —
all-integer, no UDF, no float. Empty fragments are filtered on both
sides (Spark's ``split`` on the empty pattern emits trailing empties,
DuckDB's doesn't). Scope: ASCII keys (the fixture's hosts/urls/tokens);
the production operators keep xxhash64 — this hash exists so the SAME
sketch construction code can be driven through an exact cross-engine
oracle.

Bounds: h < P ≈ 2^30, so A_i·h < 2^60 and 31·acc + 255 < 2^35 — every
intermediate stays far inside int64 in both engines (oracle rule:
integer chains must be overflow-free, not merely usually-small).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007
#: seeded-family constants (fixed arbitrary multipliers/offsets < P);
#: seed 0 is the identity so h_0 == h
A = (1, 769_060_771, 533_000_401, 362_437_283,
     915_219_539, 604_411_007, 238_734_113, 718_933_441)
B = (0, 104_395_301, 982_451_653, 57_885_161,
     715_827_883, 179_424_673, 32_452_843, 512_927_377)


def porthash(col) -> Column:
    """Spark column: the portable polynomial hash of a string column."""
    c = col if isinstance(col, Column) else F.col(col)
    chars = F.filter(
        F.split(c.cast("string"), ""), lambda x: x != F.lit("")
    )
    return F.aggregate(
        F.transform(chars, F.ascii),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + ch.cast("long")) % F.lit(P),
    )


def porthash_seeded(col, seed: int) -> Column:
    """Seeded family member h_i = (A_i·h + B_i) mod P (Spark side)."""
    return (porthash(col) * F.lit(A[seed]) + F.lit(B[seed])) % F.lit(P)


def porthash_sql(expr: str) -> str:
    """DuckDB SQL for porthash(expr) — same fold, same constants."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(CAST({expr} AS VARCHAR), ''), "
        "x -> CAST(ascii(x) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {P})"
    )


def porthash_seeded_sql(expr: str, seed: int) -> str:
    """DuckDB SQL for porthash_seeded(expr, seed)."""
    return f"(({porthash_sql(expr)}) * {A[seed]} + {B[seed]}) % {P}"
