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


def render_warc_records(pages: DataFrame, body_col: str | None = None) -> DataFrame:
    """pages rows → one spec-shaped WARC response record string per fetch
    (column ``value``). The payload defaults to a deterministic HTML body
    derived from the row, so byte integrity is checkable end-to-end;
    ``body_col`` substitutes a real html string column (e.g. the linked
    fixture pages, for WAT link extraction)."""
    if body_col is not None:
        body = F.col(body_col)
    else:
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


# ---------------------------------------------------------------------------
# WET / WAT — Common Crawl's derived companion formats
# (WET = extracted-text conversion records; WAT = per-record metadata JSON
# incl. outlinks). The reference's stats run downstream of these; producing
# them closes the WARC->WET/WAT derivation the CC pipeline performs.
# ---------------------------------------------------------------------------


def wet_from_warc(parsed: DataFrame) -> DataFrame:
    """Parsed WARC response records → WET conversion rows (url, refers_to,
    text). Extraction is the engine's byte-identical Arrow UDF
    (functions/extract.py) over the payload bytes — the same code path the
    frontier's fetch stage uses, so the north-rule invariant covers WET
    output too."""
    from ..functions.extract import extract_text

    return parsed.filter(F.col("is_valid")).select(
        "url",
        F.col("record_id").alias("refers_to"),
        extract_text(F.encode(F.col("payload"), "UTF-8")).alias("text"),
    )


def render_wet_records(conv: DataFrame) -> DataFrame:
    """(url, refers_to, text) → spec-shaped WARC/1.0 conversion records."""
    return conv.select(
        F.concat(
            F.lit(RECORD_SEP),
            F.lit("WARC-Type: conversion\r\n"),
            F.lit("WARC-Target-URI: "), F.col("url"), F.lit("\r\n"),
            F.lit("WARC-Refers-To: "), F.col("refers_to"), F.lit("\r\n"),
            F.lit("Content-Type: text/plain\r\n"),
            F.lit("Content-Length: "),
            F.length("text").cast("string"),
            F.lit(_CRLF2),
            F.col("text"),
            F.lit("\r\n"),
        ).alias("value")
    )


def write_wet(conv: DataFrame, path: str, compression: str | None = None):
    w = render_wet_records(conv).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def parse_wet_records(records: DataFrame, value_col: str = "value") -> DataFrame:
    """WET record strings → (warc_type, url, refers_to, text). Conversion
    records have ONE blank line (no HTTP block): header, then payload."""
    v = F.col(value_col)
    hdr = F.substring_index(v, _CRLF2, 1)
    text = F.regexp_replace(
        v.substr(F.length(hdr) + 5, F.length(v)), "[\\r\\n]+$", ""
    )

    def hfield(name: str) -> F.Column:
        return F.regexp_extract(hdr, f"(?m)^{name}: (.*?)\r?$", 1)

    return records.select(
        hfield("WARC-Type").alias("warc_type"),
        hfield("WARC-Target-URI").alias("url"),
        hfield("WARC-Refers-To").alias("refers_to"),
        text.alias("text"),
    )


def wat_from_warc(parsed: DataFrame) -> DataFrame:
    """Parsed WARC response records → WAT metadata rows: envelope fields
    plus the outlink hrefs parsed from the payload (codegen — the same
    extraction the link-graph operators use). ``wat_json`` is the
    CC-WAT-style JSON payload string."""
    from ..functions.links import parse_outlinks_str_col

    meta = parsed.filter(F.col("is_valid")).select(
        "url",
        F.col("record_id").alias("refers_to"),
        "status",
        "mime",
        parse_outlinks_str_col(F.col("payload")).alias("outlinks"),
        F.length("payload").cast("long").alias("payload_chars"),
    )
    return meta.withColumn(
        "wat_json",
        F.to_json(
            F.struct("url", "status", "mime", "outlinks", "payload_chars")
        ),
    )


def render_wat_records(wat: DataFrame) -> DataFrame:
    """WAT rows → spec-shaped WARC/1.0 metadata records (JSON payload)."""
    return wat.select(
        F.concat(
            F.lit(RECORD_SEP),
            F.lit("WARC-Type: metadata\r\n"),
            F.lit("WARC-Target-URI: "), F.col("url"), F.lit("\r\n"),
            F.lit("WARC-Refers-To: "), F.col("refers_to"), F.lit("\r\n"),
            F.lit("Content-Type: application/json\r\n"),
            F.lit("Content-Length: "),
            F.length("wat_json").cast("string"),
            F.lit(_CRLF2),
            F.col("wat_json"),
            F.lit("\r\n"),
        ).alias("value")
    )


def write_wat(wat: DataFrame, path: str, compression: str | None = None):
    w = render_wat_records(wat).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)
