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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RECORD_SEP = "WARC/1.0\r\n"

_CRLF2 = "\r\n\r\n"


def warc_record_expr(body_col: str | None = None) -> F.Column:
    """The rendered WARC/1.0 response record as a Column expression over
    pages fields — shared by the record sink (`render_warc_records`) and
    the CDX index builder (`cdx_index_from_pages`), so the index's length
    arithmetic can never drift from what the sink writes."""
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
    return F.concat(
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
    )


def render_warc_records(pages: DataFrame, body_col: str | None = None) -> DataFrame:
    """pages rows → one spec-shaped WARC response record string per fetch
    (column ``value``). The payload defaults to a deterministic HTML body
    derived from the row, so byte integrity is checkable end-to-end;
    ``body_col`` substitutes a real html string column (e.g. the linked
    fixture pages, for WAT link extraction)."""
    return pages.select(warc_record_expr(body_col).alias("value"))


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


# ---------------------------------------------------------------------------
# CDX index generation (the cc-index build step: WARC layout → per-record
# (filename, offset, length) index) and fetch-time digest dedup (WARC
# `revisit` records). The reference repo CONSUMES cdx files
# (/root/reference/crawlstats.py:549-595) produced upstream by exactly
# this indexing step; closing it makes the engine self-hosting:
# pages → WARC files → CDX index → the whole stats layer.
# ---------------------------------------------------------------------------


def cdx_index_from_pages(
    pages: DataFrame, body_col: str | None = None
) -> DataFrame:
    """Per-fetch CDX index entry: the byte address (``warc_filename``,
    ``warc_record_offset``, ``warc_record_length``) of the rendered WARC
    record, for the layout ``write_warc_with_index`` writes (records in
    (fetch_ts, url) order per file, one ``\\n`` row terminator per record
    — included in the span, so offsets are physical file positions).

    Scale shape: lengths come straight off the shared record expression
    (``warc_record_expr`` — pure codegen, byte-exact vs the sink), and the
    offset is one running sum windowed per warc_filename. The window
    partition is bounded by construction: a crawl's WARC files are
    size-capped (~1 GB / tens of thousands of records each, the real
    Common Crawl layout of ~64k files per crawl), so no
    unbounded-cardinality window exists here.

    Offsets address the uncompressed stream; the gzip-per-file layout's
    unit of random access is the whole member (file), as in CC's
    one-task-per-.gz processing model.
    """
    rec_len = (F.octet_length(warc_record_expr(body_col)) + F.lit(1)).cast(
        "long"
    )
    w = Window.partitionBy("warc_filename").orderBy("fetch_ts", "url")
    idx = pages.select(
        "url",
        "surt_key",
        "fetch_ts",
        "status",
        "digest",
        "crawl",
        "warc_filename",
        rec_len.alias("warc_record_length"),
    )
    return idx.withColumn(
        "warc_record_offset",
        F.coalesce(
            F.sum("warc_record_length").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    )


def write_warc_with_index(pages: DataFrame, path: str) -> DataFrame:
    """Write the WARC layout the index addresses: one physical file per
    ``warc_filename`` (``partitionBy`` + hash repartition on the filename
    puts each file's records in exactly one task → exactly one part file
    per directory), records in (fetch_ts, url) order within the file.
    Returns the matching ``cdx_index_from_pages`` frame; byte-exactness of
    (offset, length) against the written files is pinned in
    tests/test_warc.py::test_cdx_index_addresses_physical_bytes."""
    ordered = pages.repartition("warc_filename").sortWithinPartitions(
        "warc_filename", "fetch_ts", "url"
    )
    recs = ordered.select(
        "warc_filename", warc_record_expr().alias("value")
    )
    recs.write.mode("overwrite").partitionBy("warc_filename").text(path)
    return cdx_index_from_pages(pages)


def revisit_records(pages: DataFrame) -> DataFrame:
    """Fetch-time digest dedup — WARC ``revisit`` records (WARC/1.0 §6.7.2,
    the dedup policy Common Crawl's crawler applies at write time): the
    first capture of a payload digest within a crawl is stored as the
    ``response`` record; every later fetch of the same digest becomes a
    ``revisit`` record pointing at the original capture
    (``refers_to_url`` / ``refers_to_ts`` ≅ WARC-Refers-To-Target-URI /
    WARC-Refers-To-Date). "First" is total-ordered by (fetch_ts, url).

    One sort-based window keyed by (crawl, digest) — high-cardinality
    partitioning key, so the shuffle spreads; a pathologically hot digest
    (e.g. the empty page) concentrates one group in one task, which AQE
    skew handling splits at the preceding exchange.
    """
    w = Window.partitionBy("crawl", "digest").orderBy("fetch_ts", "url")
    rn = F.row_number().over(w)
    first_url = F.first("url").over(w)
    first_ts = F.first("fetch_ts").over(w)
    is_first = rn == 1
    return pages.select(
        "url",
        "fetch_ts",
        "crawl",
        "digest",
        F.when(is_first, F.lit("response"))
        .otherwise(F.lit("revisit"))
        .alias("warc_type"),
        F.when(is_first, F.lit(None).cast("string"))
        .otherwise(first_url)
        .alias("refers_to_url"),
        F.when(is_first, F.lit(None).cast("long"))
        .otherwise(first_ts)
        .alias("refers_to_ts"),
    )


def warc_gzip_members(
    pages: DataFrame, body_col: str | None = None
) -> DataFrame:
    """Per-RECORD gzip members — the layout Common Crawl actually ships:
    each WARC record is an independent gzip member, so the cc-index
    (offset, length) addresses COMPRESSED bytes and a ranged GET + one
    gunzip yields exactly one record (warc.paul.us layout; the
    gzip-per-file flavor above is the one-task-per-file processing
    model). Returns one row per record:

      (warc_filename, url, surt_key, fetch_ts, status, digest, crawl,
       member binary, warc_record_length, warc_record_offset)

    with offsets into the concatenated member stream of each file —
    byte-addressed against what write_warc_gzip writes (pinned in
    tests/test_warc.py).

    Scale shape: the record renders via the shared codegen
    ``warc_record_expr``; the per-record gzip is the one genuinely
    non-SQL step, done in an Arrow-batched pandas UDF with
    ``mtime=0`` so member bytes are deterministic; offsets are the same
    bounded per-file running-sum window as ``cdx_index_from_pages``
    (WARC files are size-capped by construction)."""
    import gzip as _gzip

    @F.pandas_udf("binary")
    def _member(recs: pd.Series) -> pd.Series:
        return recs.map(
            lambda r: _gzip.compress(
                (r + "\n").encode("utf-8"), compresslevel=6, mtime=0
            )
        )

    m = pages.select(
        "warc_filename",
        "url",
        "surt_key",
        "fetch_ts",
        "status",
        "digest",
        "crawl",
        _member(warc_record_expr(body_col)).alias("member"),
    ).withColumn(
        "warc_record_length", F.octet_length("member").cast("long")
    )
    w = Window.partitionBy("warc_filename").orderBy("fetch_ts", "url")
    return m.withColumn(
        "warc_record_offset",
        F.coalesce(
            F.sum("warc_record_length").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    )


def write_warc_gzip(pages: DataFrame, path: str) -> DataFrame:
    """Write the per-record-gzip layout: one physical ``.gz`` file per
    ``warc_filename`` (members appended in (fetch_ts, url) order —
    executor-local streaming write, same single-writer-per-file pattern
    as zipnum.write_zipnum), return the member index whose
    (offset, length) address the written compressed bytes."""
    import os

    os.makedirs(path, exist_ok=True)
    # pin the member lineage: consumed by both the file write and the
    # returned index; recomputing per-record gzip twice would double the
    # compression cost and risk divergent bytes
    members = warc_gzip_members(pages).persist()
    ordered = members.repartition(F.col("warc_filename")).sortWithinPartitions(
        "warc_filename", "fetch_ts", "url"
    )

    def write_partition(rows) -> None:
        fh, current = None, None
        try:
            for row in rows:
                if row.warc_filename != current:
                    if fh is not None:
                        fh.close()
                    current = row.warc_filename
                    fname = os.path.join(
                        path, current.replace("/", "_")
                    )
                    fh = open(fname, "wb")
                fh.write(bytes(row.member))
        finally:
            if fh is not None:
                fh.close()

    ordered.select("warc_filename", "fetch_ts", "url", "member").foreachPartition(
        write_partition
    )
    # materialize the slim index BEFORE dropping the pinned members —
    # a lazy idx would silently recompute the whole gzip pass after
    # unpersist
    idx = members.drop("member").localCheckpoint(eager=True)
    members.unpersist()
    return idx
