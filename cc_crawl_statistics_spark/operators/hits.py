"""Integer-exact HITS (Kleinberg, JACM 1999) — hubs & authorities over
the crawl link graph: the mutual-reinforcement class of link analysis
(an authority is pointed at by good hubs; a hub points at good
authorities), complementing the repo's random-walk classes (pagerank,
trustrank, OPIC) and distance class (harmonic). Crawl use: authority
scores rank fetch priority within a topic neighborhood; hub scores rank
which pages are worth re-parsing for fresh outlinks.

Exactness design (same posture as pagerank.py): scores are fixed-point
BIGINTs. HITS requires per-iteration normalization (the raw recurrence
grows geometrically); the float algorithm's L2 norm is replaced by
MAX-normalization — ``x' = x · SCALE div max(x)`` — which preserves the
RANKING (what a scheduler consumes) and keeps every step integer. The
max is one scalar aggregate per half-iteration — a bounded driver
decision, the same class as bpe_merges' argmax and OPIC's dangling
pool. Overflow bound: the normalization product ``raw · SCALE`` must
stay under 2^63, i.e. max in-degree < 2^63/SCALE² ≈ 9.2·10^6 at the
default SCALE — true for host-level graphs up to ~10^7 distinct
in-neighbors; rank at a coarser politeness unit (domain) or drop SCALE
to 10^4 beyond that.

Per iteration:
    h_raw(v) = Σ_{v→w} a(w)       (join edges to authority, sum per src)
    h(v)     = h_raw(v) · SCALE div max_v(h_raw)   (0 for no-outlink v)
    a_raw(v) = Σ_{u→v} h(u)
    a(v)     = a_raw(v) · SCALE div max_v(a_raw)

Scale shape: two groupBy shuffles per iteration (one per direction) on
the edge relation joined to the node-sized score relation — twice a
PageRank iteration's cost, same asymptotics; localCheckpoint cuts
lineage per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def hits(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    n_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, hub_fp, auth_fp) after ``n_iter`` exact max-normalized
    iterations. Parallel links count twice, like pagerank."""
    if n_iter < 1:
        raise ValueError("hits needs n_iter >= 1 (hub is loop-defined)")
    src, dst = F.col(src_col), F.col(dst_col)
    if nodes is None:
        nodes = (
            edges.select(src.alias("node"))
            .union(edges.select(dst.alias("node")))
            .distinct()
        )
    nodes = nodes.select("node").localCheckpoint(eager=True)
    e = edges.select(src.alias("src"), dst.alias("dst")).localCheckpoint(
        eager=True
    )
    auth = nodes.select("node", F.lit(SCALE).cast("long").alias("auth_fp"))
    hub = None
    for _ in range(n_iter):
        h_raw = (
            e.join(auth, e.dst == auth.node)
            .groupBy("src")
            .agg(F.sum("auth_fp").alias("raw"))
        )
        h_max = h_raw.agg(F.max("raw")).first()[0] or 1
        hub = (
            nodes.join(h_raw, nodes.node == h_raw.src, "left")
            .select(
                "node",
                F.expr(
                    f"coalesce(raw, 0L) * {SCALE}L div {h_max}L"
                ).alias("hub_fp"),
            )
            .localCheckpoint(eager=True)
        )
        a_raw = (
            e.join(hub, e.src == hub.node)
            .groupBy("dst")
            .agg(F.sum("hub_fp").alias("raw"))
        )
        a_max = a_raw.agg(F.max("raw")).first()[0] or 1
        auth = (
            nodes.join(a_raw, nodes.node == a_raw.dst, "left")
            .select(
                "node",
                F.expr(
                    f"coalesce(raw, 0L) * {SCALE}L div {a_max}L"
                ).alias("auth_fp"),
            )
            .localCheckpoint(eager=True)
        )
    return nodes.join(hub, "node").join(auth, "node").select(
        "node", "hub_fp", "auth_fp"
    )


def hits_top(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    n_iter: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k by authority (the fetch-priority feed), deterministic
    tie-break; hub score carried for the outlink-refresh consumer."""
    return (
        hits(edges, nodes, n_iter)
        .orderBy(F.desc("auth_fp"), F.desc("hub_fp"), F.asc("node"))
        .limit(k)
    )
