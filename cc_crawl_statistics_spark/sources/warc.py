"""WARC source/sink — the container format Common Crawl actually ships.

The reference repo consumes CDX index lines (its WARC handling lives
upstream in the crawler); an engine meant to replace it at the storage
layer needs to read the WARC files themselves. This module renders pages
rows as spec-shaped WARC/1.0 response records and parses them back with
pure codegen expressions (split/substring/regexp_extract — no UDFs).

Scale design:
  - records are split by the TEXT reader's custom record delimiter
    (``lineSep="WARC/1.0\\r\\n"``): Hadoop's TextInputFormat handles
    delimiter-spanning block boundaries, so ONE large uncompressed WARC
    file still splits across executors;
  - Common Crawl's real layout is ~64k gzip members per crawl
    (``*.warc.gz``): gzip is not splittable, but the unit of parallelism
    is the file — one task per .gz, exactly how the reference's fleet
    processes CDX shards. Both paths are exercised in tests/test_warc.py;
  - parsing is header-order-agnostic (anchored regexp per field) and
    malformed-tolerant: records missing the target URI or HTTP block get
    ``is_valid = false`` and survive to a counter instead of killing the
    job (same posture as cdx.parse_cdx_lines, cdx.py:42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SEP = "WARC/1.0\r\n"

_CRLF2 = "\r\n\r\n"


def render_warc_records(pages: DataFrame) -> DataFrame:
    """pages rows → one spec-shaped WARC response record string per fetch
    (column ``value``). The payload is a deterministic HTML body derived
    from the row, so byte integrity is checkable end-to-end."""
    body = F.concat(
        F.lit("<!doctype html><title>"),
        F.col("url"),
        F.lit("</title><p>"),
        F.col("digest"),
        F.lit("</p>"),
    )
    http_block = F.concat(
        F.lit("HTTP/1.1 "),
        F.col("status").cast("string"),
        F.lit(" -\r\nContent-Type: "),
        F.col("mime"),
        F.lit(_CRLF2),
        body,
    )
    return pages.select(
        F.concat(
            F.lit(RECORD_SEP),
            F.lit("WARC-Type: response\r\n"),
            F.lit("WARC-Target-URI: "),
            F.col("url"),
            F.lit("\r\n"),
            F.lit("WARC-Record-ID: <urn:uuid:"),
            F.md5(F.concat(F.col("url"), F.col("fetch_ts").cast("string"))),
            F.lit(">\r\n"),
            F.lit("WARC-Filename: "),
            F.col("warc_filename"),
            F.lit("\r\n"),
            F.lit("Content-Type: application/http; msgtype=response\r\n"),
            F.lit("Content-Length: "),
            F.length(http_block).cast("string"),
            F.lit(_CRLF2),  # header line end + the blank line
            http_block,
            F.lit("\r\n"),
        ).alias("value")
    )


def write_warc(pages: DataFrame, path: str, compression: str | None = None):
    """Write pages as WARC part files (one WARC stream per partition;
    ``compression='gzip'`` gives the Common-Crawl-style .gz-per-file
    layout whose parallelism unit is the file)."""
    w = render_warc_records(pages).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def read_warc_records(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → one raw record string per row (leading magic stripped
    by the delimiter; the empty pre-first-record element is dropped)."""
    raw = spark.read.option("lineSep", RECORD_SEP).text(path)
    return raw.filter(F.trim(F.col("value")) != "")


def parse_warc_records(records: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw record strings → typed rows. All-codegen: the record splits on
    the first two blank lines (WARC header / HTTP header / payload), each
    field is an anchored regexp over its block. ``is_valid`` is false for
    records missing the URI or HTTP block (counted, not fatal)."""
    v = F.col(value_col)
    warc_hdr = F.substring_index(v, _CRLF2, 1)
    rest = v.substr(F.length(warc_hdr) + 5, F.length(v))
    http_hdr = F.substring_index(rest, _CRLF2, 1)
    payload = F.regexp_replace(
        rest.substr(F.length(http_hdr) + 5, F.length(rest)), "[\\r\\n]+$", ""
    )

    def hfield(block, name: str) -> F.Column:
        return F.regexp_extract(block, f"(?m)^{name}: (.*?)\r?$", 1)

    parsed = records.select(
        hfield(warc_hdr, "WARC-Type").alias("warc_type"),
        hfield(warc_hdr, "WARC-Target-URI").alias("url"),
        hfield(warc_hdr, "WARC-Record-ID").alias("record_id"),
        hfield(warc_hdr, "WARC-Filename").alias("warc_filename"),
        hfield(warc_hdr, "Content-Length").try_cast("int").alias("content_length"),
        F.regexp_extract(http_hdr, r"^HTTP/1\.1 ([0-9]+)", 1)
        .try_cast("int")
        .alias("status"),
        hfield(http_hdr, "Content-Type").alias("mime"),
        payload.alias("payload"),
    )
    return parsed.withColumn(
        "is_valid",
        (F.col("url") != "") & F.col("status").isNotNull(),
    )
