"""The input_hint-literal pages table (BASELINE.json): columns exactly
``(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)``.

Derived deterministically from the synthesized crawl pages view joined to
the document payloads: ``html`` is the deterministic page generator
(functions/extract.synth_html) and ``text`` the extraction oracle for it,
so ``extract_text(html) == text`` holds byte-for-byte on every row — the
per-row invariant the engine re-checks in every scheduling round
(scheduler.fetch_extract) and in tests/test_extract.py.

At production scale this is the Iceberg table the engine reads; here the
same schema materializes from the driver's testdata. Payload columns are
kept separate from metadata so parquet column pruning skips blob IO for
metadata-only queries (see operators/multimodal.py scale notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.extract import synth_html
from .tables import load_table, pages_df


def cc_pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_df(spark, sf_dir).select(
        "url", "doc_id", "fetch_ts", "languages"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return pages.join(docs, "doc_id").select(
        "url",
        F.timestamp_seconds(F.col("fetch_ts")).alias("warc_ts"),
        synth_html(F.col("text")).alias("html"),
        "text",
        F.split(F.col("languages"), ",").getItem(0).alias("lang"),
    )
