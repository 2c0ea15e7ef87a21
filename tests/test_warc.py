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


# --- WET / WAT derived formats ---------------------------------------------


def test_wet_file_roundtrip(spark, tmp_path):
    """WARC → WET files → re-parse: text equals the byte-identical
    extraction of the response payload (url||digest for the deterministic
    body), refers_to preserved."""
    pages = pages_df(spark, SF).repartition(3)
    warc_dir = str(tmp_path / "warc")
    W.write_warc(pages, warc_dir)
    parsed = W.parse_warc_records(W.read_warc_records(spark, warc_dir))
    conv = W.wet_from_warc(parsed)
    wet_dir = str(tmp_path / "wet")
    W.write_wet(conv, wet_dir)
    back = W.parse_wet_records(W.read_warc_records(spark, wet_dir))
    assert back.filter(F.col("warc_type") != "conversion").count() == 0
    want = pages.select(
        "url", F.concat(F.col("url"), F.col("digest")).alias("text")
    )
    got = back.select("url", "text")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # refers_to round-trips the originating record ids
    ids = parsed.select(F.col("record_id").alias("refers_to"))
    assert back.select("refers_to").exceptAll(ids).count() == 0


def test_wet_golden_record_bytes(spark):
    """One pinned WET record, byte for byte."""
    conv = spark.createDataFrame(
        [("https://a.com/x", "<urn:uuid:abc>", "hello world")],
        "url string, refers_to string, text string",
    )
    val = W.render_wet_records(conv).collect()[0].value
    assert val == (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: https://a.com/x\r\n"
        "WARC-Refers-To: <urn:uuid:abc>\r\n"
        "Content-Type: text/plain\r\n"
        "Content-Length: 11\r\n"
        "\r\n"
        "hello world\r\n"
    )


def test_wat_outlinks_and_json(spark, tmp_path):
    """WAT rows carry the payload's raw hrefs and a parseable JSON
    payload; file write/read preserves the JSON."""
    import json

    pages = pages_df(spark, SF).withColumn(
        "body",
        F.concat(
            F.lit('<html><a href="https://b.org/1"></a>'),
            F.lit('<a href="/rel.html"></a></html>'),
        ),
    )
    warc_dir = str(tmp_path / "warc_wat")
    W.render_warc_records(pages, body_col="body").write.mode(
        "overwrite"
    ).text(warc_dir)
    parsed = W.parse_warc_records(W.read_warc_records(spark, warc_dir))
    wat = W.wat_from_warc(parsed)
    row = wat.limit(1).collect()[0]
    assert row.outlinks == ["https://b.org/1", "/rel.html"]
    doc = json.loads(row.wat_json)
    assert doc["url"] == row.url and doc["outlinks"] == row.outlinks
    wat_dir = str(tmp_path / "wat")
    W.write_wat(wat, wat_dir)
    back = W.parse_wet_records(W.read_warc_records(spark, wat_dir))
    # metadata records: payload is the JSON line
    n = back.filter(F.col("warc_type") == "metadata").count()
    assert n == pages.count()
    one = json.loads(back.limit(1).collect()[0].text)
    assert set(one) == {"url", "status", "mime", "outlinks", "payload_chars"}


def test_cdx_index_addresses_physical_bytes(spark, tmp_path):
    """write_warc_with_index lays out one file per warc_filename in
    (fetch_ts, url) order; every index row's (offset, length) must slice
    the PHYSICAL file bytes to exactly one record that re-parses to the
    indexed url/status/digest."""
    pages = pages_df(spark, SF)
    # keep the test I/O small: two warc files' worth of records
    keep = pages.filter(
        F.col("warc_filename").rlike("part-[03]\\.warc\\.gz$")
        & F.col("warc_filename").rlike("/warc/")
    )
    out = str(tmp_path / "warc_layout")
    idx = W.write_warc_with_index(keep, out).toPandas()
    assert len(idx) == keep.count()

    # locate the single part file per partition directory
    import urllib.parse

    def file_for(filename: str) -> str:
        d = os.path.join(
            out, "warc_filename=" + urllib.parse.quote(filename, safe="")
        )
        parts = [f for f in os.listdir(d) if f.startswith("part-")]
        assert len(parts) == 1, (filename, parts)
        return os.path.join(d, parts[0])

    blobs = {
        fn: open(file_for(fn), "rb").read()
        for fn in idx["warc_filename"].unique()
    }
    checked = 0
    for row in idx.itertuples(index=False):
        blob = blobs[row.warc_filename]
        span = blob[
            row.warc_record_offset : row.warc_record_offset
            + row.warc_record_length
        ]
        assert span.startswith(b"WARC/1.0\r\n")
        assert span.endswith(b"\r\n\n")  # record CRLF + writer row terminator
        rec = span.decode("utf-8")[len(W.RECORD_SEP) :]
        one = W.parse_warc_records(
            spark.createDataFrame([(rec,)], "value string")
        ).collect()[0]
        assert one.is_valid
        assert one.url == row.url
        assert one.status == row.status
        assert row.digest in one.payload
        checked += 1
    # offsets tile each file exactly: total span == file size
    for fn, blob in blobs.items():
        sub = idx[idx["warc_filename"] == fn]
        assert (
            sub["warc_record_length"].sum() == len(blob)
        ), f"{fn}: index does not tile the file"
    assert checked == len(idx)


def test_revisit_records_semantics(spark):
    """First capture per (crawl, digest) is the response; later fetches are
    revisits pointing at exactly that capture."""
    rows = [
        # crawl A, digest d1: three fetches, earliest ts wins; tie on ts
        # broken by url
        ("http://a/2", 200, "A", "d1"),
        ("http://a/1", 100, "A", "d1"),
        ("http://a/3", 100, "A", "d1"),  # ts tie with /1 -> /1 first
        # crawl B same digest: dedup is per-crawl, so B gets its own response
        ("http://b/1", 500, "B", "d1"),
        # unique digest: single response, no revisits
        ("http://a/solo", 50, "A", "d9"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, fetch_ts long, crawl string, digest string"
    )
    got = {
        (r.crawl, r.url): r
        for r in W.revisit_records(pages).collect()
    }
    assert got[("A", "http://a/1")].warc_type == "response"
    assert got[("A", "http://a/1")].refers_to_url is None
    for u in ("http://a/2", "http://a/3"):
        r = got[("A", u)]
        assert r.warc_type == "revisit"
        assert r.refers_to_url == "http://a/1"
        assert r.refers_to_ts == 100
    assert got[("B", "http://b/1")].warc_type == "response"
    assert got[("A", "http://a/solo")].warc_type == "response"


def test_warc_gzip_members_address_compressed_bytes(spark, tmp_path):
    """The per-record-gzip layout (CC's real one): every index row's
    (offset, length) slices the .gz file to ONE complete gzip member
    whose decompressed bytes re-parse to the indexed record; members
    tile each file exactly."""
    import gzip

    pages = pages_df(spark, SF)
    keep = pages.filter(
        F.col("warc_filename").rlike("part-[03]\\.warc\\.gz$")
        & F.col("warc_filename").rlike("/warc/")
    )
    out = str(tmp_path / "warc_gz")
    idx = W.write_warc_gzip(keep, out).toPandas()
    assert len(idx) == keep.count()

    blobs = {
        fn: open(os.path.join(out, fn.replace("/", "_")), "rb").read()
        for fn in idx["warc_filename"].unique()
    }
    spans = {fn: [] for fn in blobs}
    for row in idx.itertuples(index=False):
        blob = blobs[row.warc_filename]
        span = blob[
            row.warc_record_offset : row.warc_record_offset
            + row.warc_record_length
        ]
        assert span[:2] == b"\x1f\x8b"  # gzip magic at every offset
        rec = gzip.decompress(span).decode("utf-8")
        assert rec.startswith("WARC/1.0\r\n") and rec.endswith("\n")
        one = W.parse_warc_records(
            spark.createDataFrame(
                [(rec[len(W.RECORD_SEP):],)], "value string"
            )
        ).collect()[0]
        assert one.url == row.url and one.is_valid
        spans[row.warc_filename].append(
            (row.warc_record_offset, row.warc_record_length)
        )
    for fn, ss in spans.items():
        ss.sort()
        assert ss[0][0] == 0
        for (o1, l1), (o2, _) in zip(ss, ss[1:]):
            assert o1 + l1 == o2  # members tile with no gaps
        assert ss[-1][0] + ss[-1][1] == len(blobs[fn])
