"""Integer-exact OPIC — On-line Page Importance Computation (Abiteboul,
Preda & Cobéna, WWW 2003) — the ADAPTIVE crawl-priority that production
crawlers (e.g. Nutch's OPIC scoring filter) use instead of batch
PageRank: importance accumulates WHILE crawling, so the frontier can
rank pages it has only just discovered, without waiting for a full
link-graph iteration epoch.

Model: every page carries ``cash`` (importance in transit) and ``hist``
(importance banked). When a page is fetched in a round, its cash is
banked into hist and distributed equally along its outlinks; dangling
pages pay into a virtual root whose pool is redistributed uniformly next
round. A page's current importance estimate is ``hist + cash``.

Exactness design (same posture as operators/pagerank.py): all state is
fixed-point BIGINT. Integer division leaves remainders, and every
remainder has a deterministic home — a fetched page keeps
``cash mod outdeg``, the virtual root keeps ``pool mod N`` as carry — so
total cash is EXACTLY conserved round over round
(Σcash + root_carry == N·SCALE, pinned in tests/test_opic.py) and the
result is bit-for-bit reproducible across partitionings and retries.

Per round (fetched set = caller-supplied predicate — in the engine this
is "the schedule the frontier actually fetched"; the registry query uses
a round-robin arithmetic predicate so the DuckDB oracle can replay it):

    hist'(v)  = hist + [fetched(v)] · cash(v)
    contrib   = cash(src) div outdeg(src)            per edge, fetched src
    pool      = Σ_{fetched dangling} cash + root_carry
    cash'(v)  = [fetched(v)] · (has_out(v) ? cash mod outdeg : 0)
              + [¬fetched(v)] · cash(v)
              + Σ contrib_in(v)  +  pool div N
    carry'    = pool mod N

Scale shape (10^10 nodes): one groupBy(dst) shuffle per round plus the
node-sized equi-join to edges on src — identical to a PageRank iteration;
the dangling pool is ONE scalar aggregate (bounded driver decision, the
same class as bpe_merges' argmax). localCheckpoint cuts per-round
lineage. Rounds are the crawl's own scheduling rounds, so OPIC adds no
extra epochs — the crawler was doing these passes anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def opic(
    edges: DataFrame,
    nodes: DataFrame,
    n_rounds: int,
    fetched_sql: "callable[[int], str]",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, cash_fp, hist_fp, importance_fp) after ``n_rounds`` exact
    OPIC rounds. ``fetched_sql(r)`` returns a boolean SQL expression over
    ``node`` selecting the pages fetched in round r (dialect-neutral so
    oracles can replay it).

    TRUSTED-LITERAL CONTRACT: the returned string is interpolated into
    ``F.expr`` verbatim and evaluated as raw SQL each round, so it must
    be a code-authored literal (like the callables passed to ``filter``),
    NEVER built from data or external input — a caller that assembles it
    from row values is evaluating attacker-controlled SQL (ADVICE r3).
    Keep expressions to the portable subset (node arithmetic/comparison)
    so the DuckDB oracle can replay them unchanged."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    links = (
        e.join(outdeg, "src")
        .select("src", "dst", "outdeg")
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # dimension scalar, parquet-footer cheap
    state = (
        nodes.select("node")
        .join(outdeg, nodes.node == outdeg.src, "left")
        .select(
            "node",
            F.lit(SCALE).cast("long").alias("cash_fp"),
            F.lit(0).cast("long").alias("hist_fp"),
            F.col("outdeg"),
        )
        .localCheckpoint(eager=True)
    )
    root_carry = 0
    for r in range(n_rounds):
        fetched = F.expr(fetched_sql(r))
        # scalar: the round's dangling pool (bounded driver decision)
        pool = (
            state.filter(fetched & F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("cash_fp"), F.lit(0)))
            .first()[0]
            + root_carry
        )
        share, root_carry = pool // n_nodes, pool % n_nodes
        contrib = (
            state.filter(fetched & F.col("outdeg").isNotNull())
            .select("node", "cash_fp")
            .join(links, F.col("node") == links.src)
            .select("dst", F.expr("cash_fp div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("gain"))
        )
        state = (
            state.join(contrib, state.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.when(
                        fetched,
                        F.when(
                            F.col("outdeg").isNotNull(),
                            F.expr("cash_fp % outdeg"),
                        ).otherwise(F.lit(0)),
                    ).otherwise(F.col("cash_fp"))
                    + F.coalesce(F.col("gain"), F.lit(0))
                    + F.lit(share)
                ).cast("long").alias("cash_fp"),
                (
                    F.col("hist_fp")
                    + F.when(fetched, F.col("cash_fp")).otherwise(F.lit(0))
                ).cast("long").alias("hist_fp"),
                "outdeg",
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "node",
        "cash_fp",
        "hist_fp",
        (F.col("cash_fp") + F.col("hist_fp")).alias("importance_fp"),
    )


def opic_top(
    edges: DataFrame,
    nodes: DataFrame,
    n_rounds: int,
    fetched_sql: "callable[[int], str]",
    k: int = 50,
) -> DataFrame:
    """Top-k frontier priorities by accumulated OPIC importance,
    deterministic tie-break — the rows the priority queue consumes."""
    return (
        opic(edges, nodes, n_rounds, fetched_sql)
        .orderBy(F.desc("importance_fp"), F.asc("node"))
        .limit(k)
    )
