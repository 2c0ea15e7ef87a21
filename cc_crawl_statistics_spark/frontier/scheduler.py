"""URL-frontier + fetch scheduler (the north_rule engine).

A brand-new Spark-native design — no reference counterpart exists
(/root/reference is a batch statistics pipeline); what it inherits from the
reference is the *counting semantics* each round emits (crawlstats.py
size/host/domain/tld/mime/language/status statistics, see operators/).

One scheduling round is one declarative DataFrame job:

  pending frontier
    ⨝ host_ledger (broadcast)            -- politeness gate: robots + budget
    → blocked rows (robots 403) retired
    → host-bucketed priority             -- two-phase top-B per host (skew-safe)
    → schedule (rank ≤ per-host budget)
    → link expansion (discovered children)
    → anti-join url_seen                 -- the URL-seen filter
    → commit snapshot: frontier', url_seen', schedule, metrics

Determinism (bit-for-bit reproducible ordering, BASELINE.json): priority is
the total order (depth ASC, score DESC, url ASC) — every tie broken by url;
no timestamps, no partition-order dependence anywhere.

Scale design (10^10-URL frontier, 1000 executors):
  - host_ledger is a small dimension (≤ ~10^8 hosts) → broadcast join; the
    frontier side never shuffles for the gate;
  - per-host ranking would shuffle by host and a hot host (10^7 pending
    URLs) would pin one task. Budgets are small (≤ hundreds), so ranking is
    two-phase: partial top-B within (host, salt = xxhash64(url) % S) — a
    map-side-friendly window over S-way split hosts — then final top-B per
    host over ≤ S·B_max survivor rows per host. Shuffle volume after phase 1
    is O(hosts · S · B_max), independent of frontier size;
  - url_seen is hash-keyed (xxhash64 of the canonical SURT URL — murmur/xx
    family per north_star; 64-bit keyspace, collision P < 3·10^-3 at 10^10
    keys even before partition scoping) and range-partitioned; the exact
    anti-join is preceded at scale by Spark's runtime Bloom-filter join
    (spark.sql.optimizer.runtime.bloomFilter.enabled) so frontier partitions
    only shuffle candidates whose hash might be seen;
  - frontier snapshots are written repartitionByRange("surt_key") → range
    clustering keeps each host/domain in few partitions for the next scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import counts as C
from ..sources.tables import pages_df
from .state import SnapshotStore

FRONTIER_COLS = ("url", "surt_key", "host", "depth", "score", "state")


def seen_key(col):
    """64-bit URL-seen key over the canonical SURT form (north_star:
    'canonicalized+murmur3-hashed SURT URLs' — xxhash64 is Spark's built-in
    vectorized 64-bit hash; fn choice is an implementation detail of the
    same design)."""
    return F.xxhash64(col)


def url_universe(pages: DataFrame) -> DataFrame:
    """Deterministic URL universe derived from the pages table: one row per
    distinct URL with its doc_id (the link-graph key), host and surt_key."""
    return pages.groupBy("url").agg(
        F.first("surt_key").alias("surt_key"),
        F.first("host").alias("host"),
        F.min("doc_id").alias("doc_id"),
    )


def seed_frontier(universe: DataFrame) -> DataFrame:
    """Seed list: every 7th document's URL at depth 0 with a deterministic
    score (FIXTURES.md §4)."""
    return universe.filter(F.col("doc_id") % 7 == 0).select(
        "url",
        "surt_key",
        "host",
        F.lit(0).alias("depth"),
        ((F.col("doc_id") * 37) % 100).alias("score"),
        F.lit("pending").alias("state"),
    )


def host_ledger(universe: DataFrame) -> DataFrame:
    """Per-host politeness ledger (FIXTURES.md §5), derived deterministically
    from the host name: site_id drives robots status and per-round budget
    (budget ≈ floor(round_len / crawl_delay) in a real deployment)."""
    site_id = F.regexp_extract(F.col("host"), "site([0-9]+)", 1).cast("int")
    return (
        universe.select("host")
        .distinct()
        .select(
            "host",
            F.when(site_id % 12 == 7, 403).otherwise(200).alias("robots_status"),
            (F.lit(1) + site_id % 4).alias("max_per_round"),
        )
    )


def expand_links(scheduled: DataFrame, universe: DataFrame, n_docs: int) -> DataFrame:
    """Deterministic link expansion: fetching doc d discovers docs
    (2d+1) mod N and (3d+7) mod N. Children inherit depth+1 and the
    child's own deterministic score. At production scale this stage is the
    HTML outlink parse (vectorized Arrow UDF over html binary)."""
    kids = scheduled.select(
        F.explode(
            F.array(
                (F.col("doc_id") * 2 + 1) % n_docs,
                (F.col("doc_id") * 3 + 7) % n_docs,
            )
        ).alias("child_doc_id"),
        (F.col("depth") + 1).alias("depth"),
    )
    # one row per (child url, min depth); dedup before the seen anti-join
    kids = kids.groupBy("child_doc_id").agg(F.min("depth").alias("depth"))
    return kids.join(
        universe, kids.child_doc_id == universe.doc_id, "inner"
    ).select(
        "url",
        "surt_key",
        "host",
        "depth",
        ((F.col("doc_id") * 37) % 100).alias("score"),
        F.lit("pending").alias("state"),
    )


def host_bucketed_topk(
    candidates: DataFrame, budget_col: str = "max_per_round", n_salts: int = 8
) -> DataFrame:
    """Two-phase per-host priority selection (the skew-safe 'host-bucketed
    min-heap'). Phase 1 ranks within (host, salt) and keeps only rows that
    could still win; phase 2 ranks survivors per host. Output: rank ≤ budget,
    in the total priority order."""
    order = (F.col("depth").asc(), F.col("score").desc(), F.col("url").asc())
    max_budget = 4  # static upper bound of ledger budgets (1 + site_id % 4)
    w1 = Window.partitionBy("host", "salt").orderBy(*order)
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        candidates.withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(n_salts)))
        .withColumn("salt_rank", F.row_number().over(w1))
        .filter(F.col("salt_rank") <= max_budget)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= F.col(budget_col))
        .drop("salt", "salt_rank")
    )


def round_statistics(scheduled_pages: DataFrame) -> DataFrame:
    """The reference's statistics for one round's fetched pages, as one
    long-format DataFrame (SURVEY.md §1.4 stats model): unique URL / host /
    domain / TLD counts + MIME / language / status histograms
    (crawlstats.py counting semantics over the round's slice)."""
    p = scheduled_pages

    def kv(df, typ, key_col):
        return df.select(
            F.lit(typ).alias("type"),
            F.col(key_col).cast("string").alias("key"),
            F.col("pages").cast("long").alias("pages"),
            F.col("urls").cast("long").alias("urls"),
        )

    size = p.agg(
        F.count("*").alias("pages"),
        F.countDistinct("url").alias("urls"),
        F.countDistinct("host").alias("hosts"),
        F.countDistinct("domain").alias("domains"),
        F.countDistinct("tld").alias("tlds"),
    ).select(
        F.lit("size").alias("type"),
        F.lit("global").alias("key"),
        F.col("pages").cast("long"),
        F.col("urls").cast("long"),
    )
    dims = [
        ("host", "host"),
        ("domain", "domain"),
        ("tld", "tld"),
        ("mimetype", "mime_detected"),
        ("primary_language", "primary_language"),
        ("http_status", "status"),
    ]
    out = size
    pp = p.withColumn(
        "primary_language", F.split(F.col("languages"), ",").getItem(0)
    )
    for typ, col in dims:
        agg = pp.groupBy(col).agg(
            F.count("*").alias("pages"), F.countDistinct("url").alias("urls")
        )
        out = out.unionByName(kv(agg, typ, col))
    return out


def first_round_schedule(pages: DataFrame) -> DataFrame:
    """Round-1 schedule as a pure DataFrame query (no state store): seeds →
    politeness gate → host-bucketed priority. Used by the oracle-checked
    ``frontier_schedule`` query; run_round executes the same operators
    against snapshot state."""
    universe = url_universe(pages)
    seeds = seed_frontier(universe)
    ledger = host_ledger(universe)
    eligible = seeds.join(F.broadcast(ledger), "host").filter(
        F.col("robots_status") != 403
    )
    return (
        host_bucketed_topk(eligible)
        .select(
            "url",
            "host",
            F.col("depth").cast("long").alias("depth"),
            F.col("score").cast("long").alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("host", "rank")
    )


def run_round(
    spark: SparkSession,
    store: SnapshotStore,
    sf_dir: str,
    n_salts: int = 8,
    n_partitions: int = 4,
    pages: DataFrame | None = None,
) -> dict:
    """Execute the next scheduling round from the latest committed snapshot
    and commit round+1. Returns the round metrics (computed from the
    written snapshot, not by re-executing the round's lineage).

    ``pages`` overrides the default sf_dir-derived pages table (bench path
    injects a scaled universe here)."""
    if pages is None:
        pages = pages_df(spark, sf_dir)
    universe = url_universe(pages).cache()
    n_docs = universe.count()  # scalar dimension size, not url-level collect
    ledger = host_ledger(universe)

    latest = store.latest_round()
    if latest is None:
        frontier = seed_frontier(universe)
        seen_delta = frontier.select(seen_key(F.col("url")).alias("seen_key"))
        store.commit(
            0,
            {
                "frontier": frontier.repartitionByRange(
                    n_partitions, "surt_key"
                ),
                "url_seen_delta": seen_delta.repartitionByRange(
                    n_partitions, "seen_key"
                ),
                "host_ledger": ledger,
            },
            lambda read: {"round": 0, "n_seeded": read("frontier").count()},
        )
        latest = 0

    rnd = latest + 1
    frontier = store.read(spark, latest, "frontier")
    seen = store.read_seen(spark, latest)
    ledger = store.read(spark, latest, "host_ledger")

    pending = frontier.filter(F.col("state") == "pending")
    gated = pending.join(F.broadcast(ledger), "host")
    blocked = gated.filter(F.col("robots_status") == 403)
    eligible = gated.filter(F.col("robots_status") != 403)

    sched = (
        host_bucketed_topk(eligible, n_salts=n_salts)
        .join(universe.select("url", "doc_id"), "url")
        .select(
            F.lit(rnd).alias("round"),
            "url",
            "surt_key",
            "host",
            "depth",
            "score",
            "rank",
            "doc_id",
        )
        .localCheckpoint(eager=True)  # cut lineage: everything below reuses it
    )

    discovered = expand_links(sched, universe, n_docs)
    new_urls = discovered.join(
        seen,
        seen_key(discovered.url) == seen.seen_key,
        "left_anti",
    ).localCheckpoint(eager=True)

    new_frontier = (
        frontier.join(sched.select("url"), "url", "left_anti")
        .join(blocked.select("url"), "url", "left_anti")
        .select(*FRONTIER_COLS)
        .unionByName(new_urls.select(*FRONTIER_COLS))
    )

    # round statistics over the fetched slice (reference counting semantics);
    # checkpointed because round_statistics fans out into 7 aggregation
    # branches — without it the pages ⨝ schedule join recomputes per branch
    fetched_pages = (
        pages.select(
            "url",
            "host",
            "domain",
            "tld",
            "mime_detected",
            "languages",
            "status",
        )
        .join(sched.select("url"), "url")
        .localCheckpoint(eager=False)
    )
    stats = round_statistics(fetched_pages)

    def metrics_from_snapshot(read) -> dict:
        return {
            "round": rnd,
            "n_scheduled": read("schedule").count(),
            "n_blocked": read("blocked").count(),
            "n_discovered_new": read("url_seen_delta").count(),
            "n_frontier_pending": read("frontier")
            .filter(F.col("state") == "pending")
            .count(),
            "n_seen": store.read_seen(spark, rnd).count(),
        }

    metrics = store.commit(
        rnd,
        {
            "frontier": new_frontier.repartitionByRange(
                n_partitions, "surt_key"
            ),
            "url_seen_delta": new_urls.select(
                seen_key(F.col("url")).alias("seen_key")
            ).repartitionByRange(n_partitions, "seen_key"),
            "host_ledger": ledger,
            "schedule": sched.select(
                "round", "url", "host", "depth", "score", "rank"
            ),
            "blocked": blocked.select("url", "host"),
            "round_stats": stats,
        },
        metrics_from_snapshot,
    )
    universe.unpersist()
    return metrics
