"""Adaptive recrawl scheduling: estimate per-URL change rates from digest
history and bucket URLs into refresh tiers.

The reference repo measures exactly the inputs this needs — per-crawl
digests and cross-crawl URL overlap (crawlstats.py digest/new-items
machinery, crawl_overlap) — but stops at statistics; a crawler closes the
loop by turning "how often did this URL's content change when we fetched
it" into "when should we fetch it next" (Cho & Garcia-Molina 2003's
frequency estimator, simplified to the integer-exact form used here).

Semantics (all integer, oracle-exact):
  - observations: one row per (url, crawl) — repeat fetches within a crawl
    collapse to the LAST digest of that crawl (max fetch_ts);
  - a change = digest differs from the previous crawl's digest, counted
    over the url's crawl-ordered history (window per url, bounded by the
    ≤126-crawl registry — never corpus-wide);
  - change_permille = 1000·changes / (observations−1) for ≥2 observations;
    single-observation URLs have unknown rate and go to the 'new' tier;
  - tiers: hot ≥ 500‰, warm ≥ 100‰, cold < 100‰, new = unknown.

Scale shape: one shuffle on url (the groupBy/window key), aggregates are
map-side-combinable, the crawl-dimension window is per-url and bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def url_change_rates(pages: DataFrame) -> DataFrame:
    """(url, n_obs, n_changes, change_permille) per URL — change_permille
    null for single-observation URLs."""
    obs = pages.groupBy("url", "crawl_id").agg(
        F.max_by("digest", "fetch_ts").alias("digest")
    )
    w = Window.partitionBy("url").orderBy("crawl_id")
    changed = obs.withColumn(
        "chg",
        F.when(F.lag("digest").over(w).isNull(), 0)
        .when(F.col("digest") != F.lag("digest").over(w), 1)
        .otherwise(0),
    )
    return changed.groupBy("url").agg(
        F.count("*").alias("n_obs"),
        F.sum("chg").cast("long").alias("n_changes"),
    ).select(
        "url",
        "n_obs",
        "n_changes",
        # BIGINT division (floor) — matches the oracle's // exactly
        F.when(
            F.col("n_obs") >= 2,
            F.expr("(1000 * n_changes) div (n_obs - 1)"),
        ).alias("change_permille"),
    )


def recrawl_tiers(pages: DataFrame) -> DataFrame:
    """Refresh-tier assignment per URL: (url, tier, change_permille)."""
    rates = url_change_rates(pages)
    return rates.select(
        "url",
        "n_obs",
        "n_changes",
        "change_permille",
        F.when(F.col("change_permille").isNull(), "new")
        .when(F.col("change_permille") >= 500, "hot")
        .when(F.col("change_permille") >= 100, "warm")
        .otherwise("cold")
        .alias("tier"),
    )


def revalidation_classes(
    pages: DataFrame, validator_col: str = "has_validator"
) -> DataFrame:
    """URL-grain fetch-mode classification — (url, host, cls) with cls in
    {conditional, risky, unconditional}; the building block
    revalidation_plan rolls up and refresh-round planners join against
    (see revalidation_plan for semantics)."""
    rates = url_change_rates(pages)
    latest = pages.groupBy("url").agg(
        F.max_by(F.col(validator_col), F.col("fetch_ts")).alias("validator"),
        F.min("host").alias("host"),
    )
    return latest.join(rates, "url").select(
        "url",
        "host",
        F.when(~F.col("validator"), "unconditional")
        .when(F.col("change_permille").isNull(), "unconditional")
        .when(F.col("n_changes") == 0, "conditional")
        .when(F.col("change_permille") < 500, "risky")
        .otherwise("unconditional")
        .alias("cls"),
    )


def revalidation_plan(
    pages: DataFrame, validator_col: str = "has_validator"
) -> DataFrame:
    """Conditional-fetch (HTTP revalidation) planning per host — the
    bandwidth half of the refresh loop: a recrawl of a URL whose latest
    capture advertised a cache validator (ETag / Last-Modified) can be an
    If-None-Match / If-Modified-Since GET, and when the content is
    unchanged the server answers 304 with no body. Nutch's protocol layer
    does exactly this; at Common-Crawl scale (~100 TB fetched per crawl,
    BASELINE.md) the never-changing cohort dominates, so the plan says
    where conditional fetches convert bytes into headers.

    Classes per URL (integer-exact, from url_change_rates' digest
    history + the LATEST capture's validator):
      conditional   validator present, ≥2 observations, 0 changes —
                    expected 304
      risky         validator present, ≥2 observations, changed in fewer
                    than half the transitions — conditional still pays
                    off in expectation
      unconditional no validator, unknown history (single capture), or
                    fast-changing content

    Output per host: class counts + ``conditional_permille`` (share of
    the host's URLs that skip body transfer on an unchanged recrawl) —
    the number a fetch-budget planner multiplies against the host's byte
    volume. Scale shape: one url-grain shuffle (shared with
    url_change_rates), then a host-grain rollup; nothing corpus-wide."""
    cls = revalidation_classes(pages, validator_col).select("host", "cls")
    return (
        cls.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.sum(F.when(F.col("cls") == "conditional", 1).otherwise(0))
            .cast("long")
            .alias("n_conditional"),
            F.sum(F.when(F.col("cls") == "risky", 1).otherwise(0))
            .cast("long")
            .alias("n_risky"),
            F.sum(F.when(F.col("cls") == "unconditional", 1).otherwise(0))
            .cast("long")
            .alias("n_unconditional"),
        )
        .withColumn(
            "conditional_permille",
            # BIGINT div end to end (matches the oracle's //); the double
            # detour of floor(x*1000/y) is exact only below 2^53
            F.expr("((n_conditional + n_risky) * 1000) div n_urls"),
        )
        .orderBy("host")
    )


def refresh_round_plan(
    pages: DataFrame,
    budget_per_fetcher: int,
    n_fetchers: int = 4,
    vnodes: int = 16,
    validator_col: str = "has_validator",
) -> DataFrame:
    """The refresh ROUND PLANNER — the composition that closes the
    adaptive-recrawl loop end to end: change-rate tiers say in WHICH
    ORDER URLs are due (hot first, then never-observed, then warm, then
    cold — cold pages still refresh when budget remains, and they are
    precisely the fetches that go out as cheap conditional GETs), max-min
    fair water-filling of each fetcher shard's budget says HOW MANY per
    host, and the revalidation classes say HOW to fetch them
    (conditional GET vs full body). Every stage is an existing exact
    operator (recrawl_tiers, capacity.assign_fetchers +
    maxmin_fair_allocation, revalidation_classes) — this plan just wires
    them, so its oracle checks the composition itself.

    Output per host: fetcher shard, due demand, fair allocation,
    scheduled count (== allocation by construction) and how many of the
    scheduled fetches can be conditional. Scale shape: the url-grain
    shuffle is shared by tiers+classes; the per-host selection window
    ranks only a host's due URLs (politeness-bounded cardinality); the
    allocation windows partition by shard."""
    from pyspark.sql import Window

    from ..frontier.capacity import assign_fetchers, maxmin_fair_allocation

    tiers = recrawl_tiers(pages).select("url", "tier")
    cls = revalidation_classes(pages, validator_col)
    due = tiers.join(cls, "url").withColumn(
        "tier_rank",
        F.when(F.col("tier") == "hot", 0)
        .when(F.col("tier") == "new", 1)
        .when(F.col("tier") == "warm", 2)
        .otherwise(3),
    )
    demands = due.groupBy("host").agg(F.count("*").alias("demand"))
    alloc = maxmin_fair_allocation(
        assign_fetchers(demands, n_fetchers, vnodes), budget_per_fetcher
    ).select("host", "fetcher", "demand", "alloc")
    w = Window.partitionBy("host").orderBy("tier_rank", "url")
    sched = (
        due.join(alloc.select("host", "alloc"), "host")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.col("alloc"))
    )
    counts = sched.groupBy("host").agg(
        F.count("*").cast("long").alias("n_scheduled"),
        F.sum(F.when(F.col("cls") != "unconditional", 1).otherwise(0))
        .cast("long")
        .alias("n_conditional"),
    )
    # LEFT join keeps hosts the water-fill zeroed out: a consumer must
    # be able to tell "no budget this round" (demand carries over) from
    # "host unknown"
    return (
        alloc.join(counts, "host", "left")
        .select(
            "host",
            F.col("fetcher").cast("long").alias("fetcher"),
            F.col("demand").cast("long").alias("n_due"),
            F.col("alloc").cast("long").alias("alloc"),
            F.coalesce("n_scheduled", F.lit(0))
            .cast("long")
            .alias("n_scheduled"),
            F.coalesce("n_conditional", F.lit(0))
            .cast("long")
            .alias("n_conditional"),
        )
        .orderBy("host")
    )


def observed_host_gaps(
    pages: DataFrame, min_fetches: int = 3, floor_s: int = 1
) -> DataFrame:
    """Adaptive politeness from the fetch log: per host, the observed
    inter-fetch gap distribution and the crawl-delay a polite scheduler
    should adopt — the empirical complement to the declared
    robots.txt Crawl-delay the ledger already parses (frontier/robots.py).

    A production crawler tunes per-host rate from what the host actually
    tolerated (Heritrix's politeness "delay factor" works off observed
    response times); the statistics side is the same min/percentile-over-
    gaps aggregation the reference family computes for counts. Output per
    host with ≥ min_fetches successful fetches:

      n_fetches, min_gap_s, median_gap_s (exact lower median),
      suggested_delay_s = greatest(floor_s, min_gap_s) — the fastest
      pace this host has already demonstrably sustained.

    Scale shape: gaps need consecutive fetch ordering, so ONE window
    partitioned by host ordered by fetch_ts — per-host row counts are
    politeness-budget-bounded by construction of any real crawl (a host
    fetched at 1 req/s for a month is ~2.6M rows, comfortably one task;
    the unbounded dimension is hosts, which is the partition key, not the
    frame). The median is EXACT (lower median: the gap ranked (n+1)//2 in
    the per-host sorted multiset, via a second host-bounded window) —
    percentile_approx would be cheaper but breaks cross-engine oracle
    equality."""
    w = Window.partitionBy("host").orderBy("fetch_ts", "url")
    gaps = (
        pages.filter(F.col("status") == 200)
        .select("host", "fetch_ts", "url")
        .withColumn("_gap", F.col("fetch_ts") - F.lag("fetch_ts").over(w))
        .filter(F.col("_gap").isNotNull())
        .select("host", F.col("_gap").cast("long").alias("gap_s"))
    )
    wr = Window.partitionBy("host").orderBy("gap_s")
    ranked = gaps.withColumn("_r", F.row_number().over(wr)).withColumn(
        "_n", F.count("*").over(Window.partitionBy("host"))
    )
    per = ranked.groupBy("host").agg(
        (F.max("_n") + 1).cast("long").alias("n_fetches"),
        F.min("gap_s").cast("long").alias("min_gap_s"),
        F.max(
            F.when(
                F.col("_r") == F.floor((F.col("_n") + 1) / 2),
                F.col("gap_s"),
            )
        )
        .cast("long")
        .alias("median_gap_s"),
    )
    return (
        per.filter(F.col("n_fetches") >= min_fetches)
        .select(
            "host",
            "n_fetches",
            "min_gap_s",
            "median_gap_s",
            F.greatest(F.lit(floor_s), F.col("min_gap_s"))
            .cast("long")
            .alias("suggested_delay_s"),
        )
        .orderBy("host")
    )


def failure_backoff(
    pages: DataFrame, base_s: int = 300, max_delay_s: int = 86400
) -> DataFrame:
    """Retry/backoff policy from the fetch log (Nutch's retry-interval,
    Heritrix's fetch-retries): per URL, the run of consecutive FAILURES
    (status ≥ 500 — server errors retry; 4xx are permanent verdicts)
    since the last success, and the exponential next-attempt delay
    ``min(max_delay_s, base_s · 2^(fails−1))`` (0 when the last attempt
    succeeded). Completes the refresh-signal triad: change-rate tiers
    (url_change_rates) say WHEN to refresh content, observed gaps
    (observed_host_gaps) say HOW FAST a host tolerates, this says WHAT
    to do with errors.

    Integer-exact (shiftleft + least — no float powers), so the oracle
    matches bit-for-bit. Scale: one url-partitioned window (bounded by
    the ≤126-crawl registry — the same bound as url_change_rates' window)
    then one url-keyed aggregate."""
    w = Window.partitionBy("url")
    obs = pages.select(
        "url",
        "fetch_ts",
        (F.col("status") >= 500).alias("_fail"),
    ).withColumn(
        "_last_ok",
        F.max(F.when(~F.col("_fail"), F.col("fetch_ts"))).over(w),
    )
    per = obs.groupBy("url").agg(
        F.count("*").cast("long").alias("n_attempts"),
        F.sum(
            F.when(
                F.col("_fail")
                & (
                    F.col("_last_ok").isNull()
                    | (F.col("fetch_ts") > F.col("_last_ok"))
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("consecutive_failures"),
    )
    # shift amount clamped to 20: JVM shifts wrap mod 64 (the crawl-set
    # lesson) and base_s<<20 already exceeds any sane max_delay_s cap
    delay = F.when(F.col("consecutive_failures") == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(max_delay_s).cast("long"),
            F.expr(
                f"shiftleft(CAST({base_s} AS BIGINT), "
                "CAST(least(consecutive_failures - 1, 20) AS INT))"
            ),
        )
    )
    return per.select(
        "url",
        "n_attempts",
        "consecutive_failures",
        delay.cast("long").alias("retry_delay_s"),
    ).orderBy("url")


def stale_captures(
    entries: DataFrame, captures: DataFrame, min_lag_s: int = 1
) -> DataFrame:
    """Sitemap-driven refresh detection: join the ADVERTISED state of a
    site (its sitemap's <lastmod> per URL) against the crawl's latest
    capture; a URL is stale when the site advertises an edit at least
    ``min_lag_s`` newer than our capture — or was never captured at all.
    This is the third refresh signal next to the digest-history recrawl
    tiers and the observed-gap politeness: the site TELLS us what
    changed, so the scheduler re-enqueues exactly those URLs first.

    entries: (host, url, lastmod) — parse_sitemaps output.
    captures: any frame with (url, fetch_ts).
    Output per advertised URL: (host, url, advertised_ts, last_fetch_ts,
    lag_s, stale). Never-captured URLs carry last_fetch_ts NULL, lag NULL,
    stale true.

    Scale shape: one url-keyed max aggregation over the capture log, one
    equi-join keyed on url — both hash-partition evenly (url is unique
    high-cardinality); the sitemap side is politeness-bounded per host."""
    cap = captures.groupBy("url").agg(
        F.max("fetch_ts").cast("long").alias("last_fetch_ts")
    )
    j = entries.select(
        "host", "url", F.col("lastmod").cast("long").alias("advertised_ts")
    ).join(cap, "url", "left")
    lag = F.col("advertised_ts") - F.col("last_fetch_ts")
    return j.select(
        "host",
        "url",
        "advertised_ts",
        "last_fetch_ts",
        lag.cast("long").alias("lag_s"),
        (
            F.col("last_fetch_ts").isNull() | (lag >= min_lag_s)
        ).alias("stale"),
    )
