"""Integer-exact PageRank over the crawl link graph — the classic
crawl-priority score feeding the frontier's priority queue (north_star:
"a priority queue (host-bucketed min-heap over depth/score) driving fetch
ordering"; PageRank is the standard producer of that score in production
crawlers, alongside depth).

Exactness design: distributed float summation is order-nondeterministic,
so ranks are fixed-point BIGINTs (SCALE = 10^6) and every step is integer
division — sums of integers commute exactly, making the result bit-for-bit
reproducible across partitionings, core counts, and retries (same posture
as the repo's integer-permille rule for oracle-compared ratios). A
pure-Python model in tests/test_pagerank.py pins the exact values.

Per iteration (damping d = 85/100, all integer ops):
    contrib(e)  = rank_fp(src) DIV outdeg(src)          (per edge)
    rank_fp'(v) = (SCALE*(100-D)) DIV 100  +  (D * Σ contrib) DIV 100

Dangling nodes (no outlinks) keep receiving the base term and their mass
is dropped, the common crawler simplification (total mass shrinks; the
ORDER — which is what the scheduler consumes — is unaffected).

Scale shape (10^10 nodes, 1000 executors): one shuffle per iteration
(groupBy dst), plus an equi-join of the node-sized rank relation to the
edge relation on src — both relations hash-partition on the join key, no
broadcast of anything edge-sized. Lineage is cut per iteration with
localCheckpoint (same pattern as dedup.connected_components); iterations
are FIXED-count, so the job graph is static and resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
DAMP_PCT = 85  # d = 0.85 as an integer percentage


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """(node, rank_fp) after ``n_iter`` exact fixed-point iterations.

    ``edges``: (src, dst) link rows (duplicates are real parallel links and
    count twice, like repeated hyperlinks). ``nodes`` optionally supplies
    isolated vertices; defaults to every endpoint seen in ``edges``.

    ``weight_col`` switches to WEIGHTED PageRank — the form host-level
    ranking actually uses, where one (src_host, dst_host) edge carries
    ``n_links`` parallel hyperlinks (linkgraph.host_link_graph):

        contrib(e) = (rank_fp(src) · w(e)) DIV Σ_w(src)

    Exact integers throughout (the product bounds rank_fp·w < 2^63 —
    w up to ~9·10^9 at fixture/host scales); ``weight_col=None`` keeps
    the unweighted recurrence bit-for-bit identical to before (which IS
    the weighted one at w≡1 up to remainder placement: the unweighted
    path divides once by outdeg, so it stays its own branch)."""
    src, dst = F.col(src_col), F.col(dst_col)
    if nodes is None:
        nodes = (
            edges.select(src.alias("node"))
            .union(edges.select(dst.alias("node")))
            .distinct()
        )
    nodes = nodes.select(F.col("node")).localCheckpoint(eager=True)
    if weight_col is None:
        e = edges.select(src.alias("src"), dst.alias("dst"))
        outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
        links = (
            e.join(outdeg, "src")
            .select("src", "dst", "outdeg")
            .localCheckpoint(eager=True)
        )
        contrib_expr = "rank_fp div outdeg"
    else:
        e = edges.select(
            src.alias("src"),
            dst.alias("dst"),
            F.col(weight_col).cast("long").alias("w"),
        )
        wout = e.groupBy("src").agg(F.sum("w").alias("wout"))
        links = (
            e.join(wout, "src")
            .select("src", "dst", "w", "wout")
            .localCheckpoint(eager=True)
        )
        contrib_expr = "(rank_fp * w) div wout"

    base = (SCALE * (100 - DAMP_PCT)) // 100
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank_fp"))
    for _ in range(n_iter):
        contrib = (
            links.join(ranks, links.src == ranks.node)
            .select(
                "dst",
                # `div`: true BIGINT division — a double detour would lose
                # bits past 2^53 on hub nodes at 10^10-node scale
                F.expr(contrib_expr).alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"(coalesce(mass, 0L) * {DAMP_PCT}) div 100"
                    )
                ).alias("rank_fp"),
            )
            .localCheckpoint(eager=True)  # cut per-iteration lineage
        )
    return ranks


def pagerank_top(
    edges: DataFrame, k: int = 20, n_iter: int = 10, **kw
) -> DataFrame:
    """Top-k nodes by rank, ties broken by node id — the deterministic
    priority feed. Bounded two-phase: per-partition top-k candidates never
    exceed partitions·k rows into the final ordering."""
    r = pagerank(edges, n_iter=n_iter, **kw)
    return r.orderBy(F.col("rank_fp").desc(), F.col("node").asc()).limit(k)


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    nodes: DataFrame | None = None,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer-exact TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB
    2004) — PageRank with the teleport vector restricted to a vetted SEED
    set: trust flows out of known-good pages along links and decays with
    distance, so an unreachable link farm scores ~0 however densely it
    links to itself. Production crawlers use it (and its complement,
    spam mass ≈ rank − trust share) to keep frontier budget away from
    spam neighborhoods.

    Same recurrence, base term and integer posture as ``pagerank`` —
    ONLY the base vector differs:

        trust'(v) = [v ∈ seeds] · (SCALE·(100−D)) DIV 100
                  + (D · Σ contrib_in(v)) DIV 100

    Non-seed nodes get base 0, so all trust originates at seeds. The
    seed base (and the initial trust) is scaled by N DIV |S| — the
    paper's normalized static score distribution — so total trust mass
    is commensurate with PageRank's total rank mass and the spam-mass
    ratio reads near 0 on trusted nodes instead of reflecting seed
    sparsity. Seeds are a host-curated dimension (thousands of rows) —
    broadcast-joined as a flag onto the node relation; everything else
    is the pagerank plan shape: one groupBy(dst) shuffle + node-edge
    equi-join per iteration, localCheckpoint lineage cuts.

    Returns (node, trust_fp)."""
    src, dst = F.col(src_col), F.col(dst_col)
    if nodes is None:
        nodes = (
            edges.select(src.alias("node"))
            .union(edges.select(dst.alias("node")))
            .distinct()
        )
    seed_flags = seeds.select(
        F.col("node"), F.lit(True).alias("is_seed")
    ).distinct()
    nodes = (
        nodes.select("node")
        .join(F.broadcast(seed_flags), "node", "left")
        .select(
            "node", F.coalesce("is_seed", F.lit(False)).alias("is_seed")
        )
        .localCheckpoint(eager=True)
    )
    e = edges.select(src.alias("src"), dst.alias("dst"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    links = (
        e.join(outdeg, "src")
        .select("src", "dst", "outdeg")
        .localCheckpoint(eager=True)
    )
    # normalized static score distribution: two dimension scalars
    n_nodes = nodes.count()
    n_seeds = nodes.filter("is_seed").count()
    if n_seeds == 0:
        raise ValueError("trustrank needs at least one seed node")
    base = ((SCALE * (100 - DAMP_PCT)) // 100) * n_nodes // n_seeds
    init = SCALE * n_nodes // n_seeds
    seed_base = F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
    ranks = nodes.select(
        "node",
        "is_seed",
        F.when(F.col("is_seed"), F.lit(init))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("trust_fp"),
    )
    for _ in range(n_iter):
        contrib = (
            links.join(ranks, links.src == ranks.node)
            .select("dst", F.expr("trust_fp div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                "is_seed",
                (
                    seed_base.cast("long")
                    + F.expr(
                        f"(coalesce(mass, 0L) * {DAMP_PCT}) div 100"
                    )
                ).alias("trust_fp"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "trust_fp")


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    nodes: DataFrame | None = None,
    n_iter: int = 10,
    **kw,
) -> DataFrame:
    """(node, rank_fp, trust_fp, spam_mass_permille) — the Gyöngyi 2004
    spam-mass read: how much of a node's PageRank arrives WITHOUT passing
    a trusted seed. Integer permille of rank not covered by trust
    (trust is clamped into [0, rank] first: the two fixed-point systems
    have different total mass, so the ratio is a screen, not a proof —
    exactly how the paper uses it). One extra node-keyed join over the
    two propagation results."""
    # weight_col applies to the RANK side only: trustrank has no weighted
    # flavor (trust deliberately propagates unweighted — the paper's
    # uniform split-out-of-seeds model), so pop it instead of forwarding
    # a kwarg trustrank would reject (ADVICE r3).
    kw_tr = {k: v for k, v in kw.items() if k != "weight_col"}
    pr = pagerank(edges, nodes=nodes, n_iter=n_iter, **kw)
    tr = trustrank(edges, seeds, nodes=nodes, n_iter=n_iter, **kw_tr)
    return (
        pr.join(tr, "node")
        .select(
            "node",
            "rank_fp",
            "trust_fp",
            # BIGINT div end to end (module rule: a double detour loses
            # bits past 2^53) — matches the oracle's `//` exactly. The
            # 1000× product bounds rank_fp < 2^63/1000 ≈ 9.2·10^15,
            # i.e. ~9·10^9 nodes at SCALE=10^6; both engines fail loudly
            # (no silent rounding) beyond it.
            F.expr(
                "((rank_fp - least(trust_fp, rank_fp)) * 1000L)"
                " div rank_fp"
            )
            .cast("long")
            .alias("spam_mass_permille"),
        )
    )
