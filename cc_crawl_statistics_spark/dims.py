"""Dimension tables: crawl name ↔ id ↔ date, TLD classification, continent.

The reference embeds these as Python dicts (MonthlyCrawl at
/root/reference/crawlstats.py:35-202; top_level_domain.py; tld_by_continent
.py). Engine-side they are broadcast dimension DataFrames built at plan
time — every lookup is a broadcast hash join, never a UDF.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession


def crawl_date(crawl_name: str) -> dt.date:
    """'CC-MAIN-YYYY-WW' → Monday of ISO week WW (the reference's date
    derivation, crawlstats.py:181-194)."""
    _, _, year, week = crawl_name.split("-")
    return dt.date.fromisocalendar(int(year), int(week), 1)


def crawl_dim(spark: SparkSession, crawl_names: list[str]) -> DataFrame:
    """(crawl, crawl_id, date) — ids are the sort order by (year, week).
    (The reference's ids are historical registration order; for bitmask
    semantics only ordering stability matters.)"""
    rows = [
        (name, i, crawl_date(name))
        for i, name in enumerate(sorted(set(crawl_names)))
    ]
    return spark.createDataFrame(rows, "crawl string, crawl_id int, date date")


# TLD type classification — a compact vendored slice of the IANA table the
# reference embeds (top_level_domain.py); production regenerates from IANA.
TLD_TYPES = {
    "com": "gTLD",
    "org": "gTLD",
    "net": "gTLD",
    "info": "gTLD",
    "biz": "gTLD",
    "edu": "sTLD",
    "gov": "sTLD",
    "mil": "sTLD",
    "io": "ccTLD",
    "de": "ccTLD",
    "jp": "ccTLD",
    "uk": "ccTLD",
    "fr": "ccTLD",
    "es": "ccTLD",
    "it": "ccTLD",
    "nl": "ccTLD",
    "pl": "ccTLD",
    "ru": "ccTLD",
    "cn": "ccTLD",
    "br": "ccTLD",
    "au": "ccTLD",
    "dev": "new-gTLD",
    "app": "new-gTLD",
}

TLD_CONTINENTS = {
    "de": "EU",
    "fr": "EU",
    "es": "EU",
    "it": "EU",
    "nl": "EU",
    "pl": "EU",
    "uk": "EU",
    "ru": "EU",
    "jp": "AS",
    "cn": "AS",
    "br": "SA",
    "au": "OC",
}


def tld_dim(spark: SparkSession) -> DataFrame:
    rows = [
        (tld, typ, TLD_CONTINENTS.get(tld, "-")) for tld, typ in TLD_TYPES.items()
    ]
    return spark.createDataFrame(rows, "tld string, tld_type string, continent string")
