"""Fetcher-fleet capacity planning: consistent-hash host sharding and
round-makespan estimation for the frontier scheduler.

A distributed crawl runs many fetcher processes, but politeness is a
per-host contract (robots.txt Crawl-delay — frontier/robots.py), so every
scheduled URL of a host must land on the SAME fetcher: the delay is then
enforced with node-local state, no cross-node coordination. The classic
assignments are a plain host-hash modulo (Nutch's partition.url.by.host —
resizing the fleet remaps almost every host, invalidating every fetcher's
local robots/DNS cache) or a static ring (Heritrix). Here the shard map is
CONSISTENT HASHING with virtual nodes: growing the fleet from N to N+1
fetchers moves only the hosts whose ring successor became one of the new
fetcher's points (expected |hosts|/(N+1)); every moved host moves TO the
new fetcher, never between survivors — pinned exactly by
tests/test_capacity.py::test_fleet_resize_moves_hosts_only_to_new_fetcher.

Reference tie: the scheduled rows being sharded are the output of the
host-bucketed priority queue (scheduler.host_bucketed_topk, reference
semantics cited there); the per-host politeness budget comes from the
parsed robots ledger (scheduler.host_ledger).

Cross-engine hash (same construct both engines, so the DuckDB oracle
replays the exact ring): ``point(s)`` = first 8 hex chars of md5(s) as an
integer — Spark ``conv(substr(md5(s),1,8),16,10)``, DuckDB
``CAST('0x' || substr(md5(s),1,8) AS BIGINT)``, Python
``int(md5(s).hexdigest()[:8], 16)``.

Scale shape: the ring is CONFIG-derived (n_fetchers × vnodes entries from
two integers — not data), so it is built driver-side and embedded as a
sorted literal array; successor lookup is one O(|ring|) higher-order-
function scan per HOST (dimension cardinality, never per URL). URL-level
rows get their fetcher through a broadcast hash join against the
host→fetcher map. Nothing here shuffles on anything wider than host.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point32(col: F.Column) -> F.Column:
    """32-bit ring point of a string column (md5-prefix hash, cross-engine:
    see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _py_point32(s: str) -> int:
    return int(hashlib.md5(s.encode("ascii")).hexdigest()[:8], 16)


def ring_points(n_fetchers: int, vnodes: int) -> list[tuple[int, int]]:
    """The ring as a sorted [(point, fetcher)] list. Entry i of the raw
    sequence is fetcher ``i % n_fetchers``, vnode ``i // n_fetchers``,
    keyed ``vn:<fetcher>:<vnode>``; 32-bit point collisions (≈|ring|²/2³³)
    resolve deterministically to the smallest fetcher id."""
    best: dict[int, int] = {}
    for i in range(n_fetchers * vnodes):
        f, v = i % n_fetchers, i // n_fetchers
        p = _py_point32(f"vn:{f}:{v}")
        if p not in best or f < best[p]:
            best[p] = f
    return sorted(best.items())


def assign_fetchers(
    hosts: DataFrame,
    n_fetchers: int = 4,
    vnodes: int = 16,
    key_col: str = "host",
) -> DataFrame:
    """Map each row's ``key_col`` to its fetcher: the fetcher owning the
    smallest ring point ≥ point(key), wrapping to the ring's first point.
    Adds a ``fetcher`` int column; input should be host-cardinality (join
    the result back to URL-level rows, broadcast)."""
    ring = ring_points(n_fetchers, vnodes)
    pts = F.array(*[F.lit(p) for p, _ in ring])
    fts = [f for _, f in ring]
    hp = point32(F.col(key_col))
    # count of ring points strictly below the key's point == 0-based index
    # of the successor in the sorted ring; == |ring| means wrap to entry 0.
    below = F.size(F.filter(pts, lambda p: p < hp))
    fetcher = F.element_at(
        F.array(*[F.lit(f) for f in fts + [fts[0]]]), below + 1
    )
    return hosts.withColumn("fetcher", fetcher.cast("int"))


def fetcher_load(
    schedule: DataFrame, n_fetchers: int = 4, vnodes: int = 16
) -> DataFrame:
    """Per-fetcher load rollup of a round schedule (host, url rows):
    distinct hosts, scheduled URLs, and the fetcher's integer-permille
    share of the round — the balance table an operator watches when sizing
    the fleet. Aggregates at host grain first (one shuffle on host — the
    schedule is already budget-bounded), then rolls the host-cardinality
    table up per fetcher."""
    per_host = schedule.groupBy("host").agg(F.count("*").alias("n_urls"))
    asg = assign_fetchers(per_host, n_fetchers, vnodes)
    per_fetcher = asg.groupBy("fetcher").agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.sum("n_urls").cast("long").alias("n_urls"),
    )
    total = per_fetcher.agg(F.sum("n_urls").alias("_tot"))
    return (
        per_fetcher.crossJoin(F.broadcast(total))
        .select(
            F.col("fetcher").cast("long").alias("fetcher"),
            "n_hosts",
            "n_urls",
            F.floor(F.col("n_urls") * 1000 / F.col("_tot")).alias(
                "load_permille"
            ),
        )
        .orderBy("fetcher")
    )


def round_makespan(
    schedule: DataFrame,
    ledger: DataFrame,
    n_fetchers: int = 4,
    vnodes: int = 16,
    round_ms: int = 60_000,
) -> DataFrame:
    """Capacity estimate for one scheduling round under the single-
    connection fetcher model: a host's URLs form a serial chain spaced by
    its Crawl-delay (ledger budget ``max_per_round`` = round_ms/delay, so
    delay_ms = floor(round_ms / budget)); a fetcher's busy time is the sum
    of its hosts' chains (politeness waits on one host overlap fetches on
    another, so the sum is the single-connection upper bound and the
    per-host max the concurrency-∞ lower bound). Emits one row per
    fetcher: busy_ms, its longest single-host chain, and ``critical`` on
    the fleet's makespan-defining straggler — the number that answers
    "does this round fit in the round budget, and which shard is the
    bottleneck". Shuffles on host then fetcher only."""
    per_host = (
        schedule.groupBy("host")
        .agg(F.count("*").alias("n_urls"))
        .join(F.broadcast(ledger.select("host", "max_per_round")), "host")
        .withColumn(
            "chain_ms",
            F.col("n_urls")
            * F.floor(F.lit(round_ms) / F.col("max_per_round")),
        )
    )
    asg = assign_fetchers(per_host, n_fetchers, vnodes)
    per_fetcher = asg.groupBy("fetcher").agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.sum("n_urls").cast("long").alias("n_urls"),
        F.sum("chain_ms").cast("long").alias("busy_ms"),
        F.max("chain_ms").cast("long").alias("max_chain_ms"),
    )
    fleet_max = per_fetcher.agg(F.max("busy_ms").alias("_mb"))
    return (
        per_fetcher.crossJoin(F.broadcast(fleet_max))
        .select(
            F.col("fetcher").cast("long").alias("fetcher"),
            "n_hosts",
            "n_urls",
            "busy_ms",
            "max_chain_ms",
            (F.col("busy_ms") == F.col("_mb")).alias("critical"),
        )
        .orderBy("fetcher")
    )


def maxmin_fair_allocation(
    demands: DataFrame,
    budget: int,
    partition_col: str | None = "fetcher",
    demand_col: str = "demand",
    key_col: str = "host",
) -> DataFrame:
    """Exact integer max-min fair (water-filling) split of a per-shard
    fetch ``budget`` across competing hosts: every demand below the water
    level is fully satisfied, the rest share the remainder equally, and
    the integer remainder goes one-each to the first hosts in
    deterministic (demand, key) order — so Σalloc == min(budget, Σdemand)
    per shard, exactly. This is the allocation a round planner applies
    between the priority queue (which orders WITHIN a host) and the
    fetcher fleet (whose shard is the capacity unit): no host can starve
    the shard, and slack from small hosts redistributes to big ones.

    Closed form, no iteration: with demands ascending (d_1..d_k, prefix
    sums S_i), a prefix row i is fully satisfiable iff
    ``S_i + d_i*(k-i) <= B`` (give 1..i their demand and everyone later
    at least d_i) — the predicate is monotone, so the satisfied prefix is
    ``j = Σ[full_i]``, the water remainder ``R = B - S_j`` splits over
    the ``m = k-j`` capped hosts as ``R div m`` (+1 for the first
    ``R mod m``). All window functions over ``partition_col`` — the shard
    keeps host cardinality bounded (|hosts|/n_fetchers), and shards
    compute in parallel; pass ``partition_col=None`` only for bounded
    dimensions (the global window is a single task).

    Adds ``alloc``; preserves input columns. Returns one row per input
    row, ordered by (shard, demand desc, key) — biggest allocations
    first, ties broken deterministically."""
    from pyspark.sql import Window

    part = [partition_col] if partition_col else []
    w_ord = Window.partitionBy(*part).orderBy(demand_col, key_col)
    w_all = (
        Window.partitionBy(*part)
        .orderBy(demand_col, key_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    d = F.col(demand_col).cast("long")
    i = F.row_number().over(w_ord)
    s_i = F.sum(d).over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    k = F.count("*").over(w_all)
    with_pred = demands.withColumns(
        {
            "_i": i,
            "_full": (s_i + d * (k - i)) <= F.lit(budget),
            "_s_i": s_i,
        }
    )
    j = F.sum(F.col("_full").cast("long")).over(w_all)
    s_j = F.coalesce(
        F.max(F.when(F.col("_full"), F.col("_s_i"))).over(w_all), F.lit(0)
    )
    m = F.greatest(F.count("*").over(w_all) - j, F.lit(1))
    r = F.lit(budget) - s_j
    # BIGINT div/% (not a double floor) — exact at any budget magnitude
    # and identical to the oracle's `//`/`%`
    staged = with_pred.withColumns(
        {"_r": r.cast("long"), "_m": m.cast("long"), "_j": j}
    )
    base = F.expr("_r div _m")
    extra = (F.col("_i") - F.col("_j")) <= F.expr("_r % _m")
    alloc = F.when(F.col("_full"), d).otherwise(
        F.least(d, base + F.when(extra, 1).otherwise(0))
    )
    order = part + [F.col(demand_col).desc(), key_col]
    return (
        staged.withColumn("alloc", alloc.cast("long"))
        .drop("_i", "_full", "_s_i", "_r", "_m", "_j")
        .orderBy(*order)
    )


def fair_budget_allocation(
    schedule_hosts: DataFrame,
    budget_per_fetcher: int,
    n_fetchers: int = 4,
    vnodes: int = 16,
) -> DataFrame:
    """Round budget planner: per-host demands → consistent-hash fetcher
    shard (assign_fetchers) → exact max-min fair allocation of each
    shard's fetch budget. Input: (host, demand) rows; output adds
    (fetcher, alloc)."""
    asg = assign_fetchers(schedule_hosts, n_fetchers, vnodes)
    return maxmin_fair_allocation(
        asg, budget_per_fetcher, partition_col="fetcher"
    ).select(
        F.col("fetcher").cast("long").alias("fetcher"),
        "host",
        F.col("demand").cast("long").alias("demand"),
        "alloc",
    )


def schedule_fairness(
    schedule: DataFrame, n_fetchers: int = 4, vnodes: int = 16
) -> DataFrame:
    """Jain's fairness index (×1000, integer floor) of one round's
    allocation, at two grains: across HOSTS (is the politeness budget
    starving some sites?) and across FETCHER shards (is the fleet
    balanced?). J = (Σx)² / (n·Σx²) ∈ (1/n, 1]; 1000 = perfectly equal,
    and J·n is the effective number of equally-served parties. One row:
    (n_hosts, jain_host_x1000, n_fetchers_used, jain_fetcher_x1000).

    Exactness: the quadratic terms are computed in DECIMAL(38,0) (Spark)
    / HUGEINT (DuckDB) — (Σx)² overflows a 64-bit long once Σx exceeds
    ~3×10⁹ scheduled URLs, which a production round can reach. Shapes:
    host-grain aggregation (the schedule is budget-bounded), fleet-grain
    rollup, two 1-row aggregates broadcast-crossed."""
    per_host = schedule.groupBy("host").agg(F.count("*").alias("x"))
    per_fetcher = (
        assign_fetchers(per_host, n_fetchers, vnodes)
        .groupBy("fetcher")
        .agg(F.sum("x").alias("x"))
    )

    def jain(df: DataFrame, n_col: str, j_col: str) -> DataFrame:
        dec = "decimal(38,0)"
        return df.agg(
            F.count("*").cast("long").alias(n_col),
            F.floor(
                F.lit(1000)
                * F.sum("x").cast(dec)
                * F.sum("x").cast(dec)
                / (
                    F.count("*").cast(dec)
                    * F.sum(F.col("x").cast(dec) * F.col("x").cast(dec))
                )
            )
            .cast("long")
            .alias(j_col),
        )
    return jain(per_host, "n_hosts", "jain_host_x1000").crossJoin(
        F.broadcast(
            jain(per_fetcher, "n_fetchers_used", "jain_fetcher_x1000")
        )
    )
