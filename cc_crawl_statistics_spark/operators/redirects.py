"""Redirect-chain resolution: follow 3xx edges to the final target.

A crawler must collapse redirect chains before dedup/scheduling (the
reference's CDX rows carry 301/302 fetches as first-class records —
crawlstats.py status histograms — and WAT metadata records the hop);
training pipelines need the terminal URL as the canonical document key.

Operator shape: the redirect mapping is FUNCTIONAL (one Location per
source URL), so resolution is bounded hop-stepping over a (src, dst)
edge table — the same bounded-iteration join pattern as
dedup.connected_components, keyed on the current cursor each hop,
with settled rows banked out so the join side shrinks.
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
    a redirect source within the bound. Each iteration equi-joins ONLY
    the still-moving cursors against the edge table (+ localCheckpoint
    lineage cut); a row whose cursor finds no outgoing edge is settled —
    its final_url is permanently outside the redirect domain (the edge
    table is static), so it is banked with resolved=1 and never rejoins.
    The join side therefore genuinely shrinks each hop (chains in the
    wild are short), and only the leftover still-moving rows after the
    bound need the final is-it-a-source membership join — a plain join
    against the distinct sources, NOT a broadcast: at crawl scale the
    source set is frontier-sized and must never transit the driver."""
    nxt = edges.select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    )
    moving = edges.select(
        F.col("src").alias("url"),
        F.col("dst").alias("final_url"),
        F.lit(1).alias("hops"),
    ).localCheckpoint(eager=True)
    settled = []
    for _ in range(max_hops - 1):
        stepped = (
            moving.join(nxt, moving.final_url == nxt._s, "left")
            .select(
                "url",
                F.coalesce("_d", "final_url").alias("final_url"),
                F.when(F.col("_d").isNotNull(), F.col("hops") + 1)
                .otherwise(F.col("hops"))
                .alias("hops"),
                F.col("_d").isNotNull().alias("_moved"),
            )
            .localCheckpoint(eager=True)
        )
        settled.append(stepped.filter(~F.col("_moved")).drop("_moved"))
        moving = stepped.filter(F.col("_moved")).drop("_moved")
        if moving.isEmpty():
            break
    srcs = (
        edges.select(F.col("src").alias("final_url"))
        .distinct()
        .withColumn("_is_src", F.lit(1))
    )
    leftover = moving.join(srcs, "final_url", "left").select(
        "url",
        "final_url",
        "hops",
        F.when(F.col("_is_src").isNull(), 1).otherwise(0).alias("_res"),
    )
    banked = [
        s.select("url", "final_url", "hops", F.lit(1).alias("_res"))
        for s in settled
    ]
    walk = leftover
    for part in banked:
        walk = walk.unionByName(part)
    return walk.select(
        "url",
        "final_url",
        F.col("hops").cast("long").alias("hops"),
        F.col("_res").cast("long").alias("resolved"),
    ).orderBy("url")
