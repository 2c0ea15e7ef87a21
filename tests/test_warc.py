"""WARC source tests (sources/warc.py): file-level record splitting via
the custom text delimiter (uncompressed: splittable inside one file;
gzip: Common-Crawl-style one-task-per-file), byte-exact roundtrip, and
malformed-record tolerance."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cc_crawl_statistics_spark.sources import warc as W
from cc_crawl_statistics_spark.sources.tables import pages_df

SF = "/root/testdata/sf0.001"


def _expected(pages):
    return pages.select(
        "url",
        "status",
        "mime",
        F.concat(
            F.lit("<!doctype html><title>"),
            F.col("url"),
            F.lit("</title><p>"),
            F.col("digest"),
            F.lit("</p>"),
        ).alias("payload"),
    )


@pytest.mark.parametrize("compression", [None, "gzip"])
def test_file_roundtrip(spark, tmp_path, compression):
    pages = pages_df(spark, SF).repartition(4)
    out = str(tmp_path / ("warc_gz" if compression else "warc"))
    W.write_warc(pages, out, compression=compression)
    if compression:
        parts = [f for f in os.listdir(out) if f.endswith(".gz")]
        assert len(parts) == 4  # one gzip member per partition (CC layout)
    parsed = W.parse_warc_records(W.read_warc_records(spark, out))
    assert parsed.filter(~F.col("is_valid")).count() == 0
    got = parsed.select("url", "status", "mime", "payload")
    want = _expected(pages)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_content_length_is_exact(spark, tmp_path):
    pages = pages_df(spark, SF)
    out = str(tmp_path / "warc")
    W.write_warc(pages, out)
    parsed = W.parse_warc_records(W.read_warc_records(spark, out))
    rebuilt = F.concat(
        F.lit("HTTP/1.1 "),
        F.col("status").cast("string"),
        F.lit(" -\r\nContent-Type: "),
        F.col("mime"),
        F.lit("\r\n\r\n"),
        F.col("payload"),
    )
    assert parsed.filter(F.length(rebuilt) != F.col("content_length")).count() == 0


def test_malformed_records_tolerated(spark):
    recs = spark.createDataFrame(
        [
            ("WARC-Type: response\r\nNo-Uri: x\r\n\r\nHTTP/1.1 200 -\r\n\r\nbody",),
            ("WARC-Type: response\r\nWARC-Target-URI: http://a/\r\n\r\ngarbage",),
            ("",),
        ],
        ["value"],
    )
    parsed = W.parse_warc_records(recs)
    assert parsed.count() == 3
    assert parsed.filter("is_valid").count() == 0  # none fully valid


def test_splittable_single_file(spark, tmp_path):
    """One uncompressed WARC part must still parallelize: force tiny
    maxPartitionBytes and assert the scan of a single file produces more
    than one task's worth of partitions with no record loss."""
    pages = pages_df(spark, SF)
    out = str(tmp_path / "warc1")
    W.write_warc(pages.coalesce(1), out)
    n = pages.count()
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "32768")
        rec = W.read_warc_records(spark, out)
        assert rec.rdd.getNumPartitions() > 1  # split inside the one file
        assert rec.count() == n  # no record lost or duplicated at splits
        parsed = W.parse_warc_records(rec)
        assert parsed.filter("is_valid").count() == n
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
