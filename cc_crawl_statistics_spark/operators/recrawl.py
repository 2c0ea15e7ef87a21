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
