"""Redirect-chain resolution: follow 3xx edges to the final target.

A crawler must collapse redirect chains before dedup/scheduling (the
reference's CDX rows carry 301/302 fetches as first-class records —
crawlstats.py status histograms — and WAT metadata records the hop);
training pipelines need the terminal URL as the canonical document key.

Operator shape: the redirect mapping is FUNCTIONAL (one Location per
source URL), so resolution is pointer-jumping over a (src, dst) edge
table — the same bounded-iteration join pattern as
dedup.connected_components, keyed on the current cursor each hop.
Chains in the wild are short (browsers cap ~20); ``max_hops`` bounds
both work and cycle exposure, and a chain still pointing at another
redirect after the bound is reported unresolved (resolved=0) — cycles
land there deterministically instead of spinning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """(src, dst) redirect edges → (url, final_url, hops, resolved).

    hops = edges followed (≥1); resolved = 1 iff final_url is not itself
    a redirect source within the bound. Each iteration is one equi-join
    of the still-moving cursors against the edge table + localCheckpoint
    (lineage cut); rows stop moving the hop their cursor leaves the
    redirect domain, so the join side shrinks monotonically."""
    nxt = edges.select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    )
    walk = edges.select(
        F.col("src").alias("url"),
        F.col("dst").alias("final_url"),
        F.lit(1).alias("hops"),
    ).localCheckpoint(eager=True)
    for _ in range(max_hops - 1):
        stepped = (
            walk.join(nxt, walk.final_url == nxt._s, "left")
            .select(
                "url",
                F.coalesce("_d", "final_url").alias("final_url"),
                F.when(F.col("_d").isNotNull(), F.col("hops") + 1)
                .otherwise(F.col("hops"))
                .alias("hops"),
                F.col("_d").isNotNull().alias("_moved"),
            )
        )
        n_moved = stepped.agg(F.sum(F.col("_moved").cast("int"))).first()[0]
        walk = stepped.drop("_moved").localCheckpoint(eager=True)
        if not n_moved:
            break
    srcs = (
        edges.select(F.col("src").alias("final_url"))
        .distinct()
        .withColumn("_is_src", F.lit(1))
    )
    return (
        walk.join(F.broadcast(srcs), "final_url", "left")
        .select(
            "url",
            "final_url",
            F.col("hops").cast("long").alias("hops"),
            F.when(F.col("_is_src").isNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("resolved"),
        )
        .orderBy("url")
    )
