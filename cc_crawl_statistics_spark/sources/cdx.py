"""CDX index-line ingest: the reference's raw input format
(/root/reference/crawlstats.py:776-798; README.md:24-35) parsed into the
engine's pages schema.

One text line per fetch: ``<surt_domain>)<path> <timestamp14> <json>``.
Parsing is fully declarative: split-with-limit for the three zones,
``from_json`` with an all-nullable schema for the metadata blob (missing
keys tolerated, like the reference's dict.get), malformed JSON rows carried
as ``_corrupt`` for the skip-and-count behavior (crawlstats.py:799-801).

Scale: ``spark.read.text`` over ``cdx-*.gz`` keeps gzip members
non-splittable (one task per file — the same physical property the
reference forces via split.minsize, crawlstats.py:1024-1025); for splittable
throughput at 100 TB the ingest job transcodes to parquet/zstd once and all
downstream queries read that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.psl import split_host
from ..functions.urlkit import host_of, scheme_of

CDX_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("mime-detected", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("languages", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("length", T.StringType()),
    ]
)


def parse_cdx_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Text lines → typed pages rows. Returns all rows; filter
    ``is_valid`` for the clean set and count ``~is_valid`` for the
    reference's malformed-line counter."""
    v = F.col(value_col)
    zones = F.split(v, " ", 3)
    key = zones.getItem(0)
    meta = F.from_json(zones.getItem(2), CDX_META_SCHEMA)
    parsed = lines.select(
        F.substring_index(key, ")", 1).alias("surt_domain"),
        key.alias("surt_key"),
        zones.getItem(1).alias("timestamp14"),
        meta.alias("m"),
        (meta.isNotNull() & meta.getField("url").isNotNull()).alias("is_valid"),
    )
    host = host_of(F.col("m.url"))
    typed = parsed.select(
        "surt_domain",
        "surt_key",
        "timestamp14",
        "is_valid",
        F.col("m.url").alias("url"),
        scheme_of(F.col("m.url")).alias("scheme"),
        host.alias("host"),
        F.col("m.status").cast("int").alias("status"),
        F.col("m.mime").alias("mime"),
        F.col("m.mime-detected").alias("mime_detected"),
        F.col("m.charset").alias("charset"),
        F.col("m.languages").alias("languages"),
        F.col("m.digest").alias("digest"),
        F.col("m.filename").alias("warc_filename"),
    )
    # (domain, tld) via full-PSL longest-match broadcast joins
    return split_host(typed, "host")


def read_cdx(spark: SparkSession, path: str, crawl: str) -> DataFrame:
    """Read a cdx file/glob into valid pages rows tagged with the crawl id."""
    raw = spark.read.text(path)
    parsed = parse_cdx_lines(raw)
    return parsed.filter(F.col("is_valid")).withColumn("crawl", F.lit(crawl))
