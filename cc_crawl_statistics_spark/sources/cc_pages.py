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
from ..functions.links import synth_linked_html
from ..functions.rep import synth_rep_html
from ..synth import (
    child_url_sql,
    outlink_child_ids_sql,
    rep_anchor_nofollow_sql,
    rep_canonical_sql,
    rep_meta_robots_sql,
)
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


def cc_pages_linked_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same input_hint schema, html now carrying deterministic outlink
    anchors: two absolute cross-host links (the expand_links child formula,
    frontier/scheduler.py:152-158) and one root-relative same-host link —
    so outlink PARSING (operators/linkgraph.py) has arithmetic ground truth
    the DuckDB oracle recomputes without ever seeing the html bytes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # parquet-footer metadata count — no scan; the child formula needs the
    # universe size N exactly as expand_links does
    n_docs = docs.count()
    pages = pages_df(spark, sf_dir).select(
        "url", "doc_id", "fetch_ts", "languages"
    )
    c1, c2, c3 = outlink_child_ids_sql(n_docs)
    hrefs = F.array(
        F.expr(child_url_sql(c1)),
        F.expr(child_url_sql(c2)),
        F.expr(f"'/page/' || CAST({c3} AS STRING) || '.html'"),
    )
    return pages.join(docs, "doc_id").select(
        "url",
        F.timestamp_seconds(F.col("fetch_ts")).alias("warc_ts"),
        synth_linked_html(F.col("text"), hrefs).alias("html"),
        "text",
        F.split(F.col("languages"), ",").getItem(0).alias("lang"),
    )


def cc_pages_rep_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint schema + REP page directives embedded in the html:
    meta robots (rep_meta_robots_sql), rel=canonical
    (rep_canonical_sql) and per-anchor rel=nofollow flags on the same
    three outlink anchors as the linked flavor — every directive an
    arithmetic function of doc_id, so the DuckDB oracles recompute the
    expected parse results without ever seeing the html bytes, while
    Spark must re-extract them from markup (functions/rep.py). The
    extraction invariant ``extract_text(html) == text`` still holds:
    all REP markup is head tags or empty-bodied anchors."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    pages = pages_df(spark, sf_dir).select(
        "url", "doc_id", "fetch_ts", "languages"
    )
    c1, c2, c3 = outlink_child_ids_sql(n_docs)
    hrefs = F.array(
        F.expr(child_url_sql(c1)),
        F.expr(child_url_sql(c2)),
        F.expr(f"'/page/' || CAST({c3} AS STRING) || '.html'"),
    )
    nofollow = F.array(
        *[F.expr(rep_anchor_nofollow_sql("doc_id", i)) for i in range(3)]
    )
    return pages.join(docs, "doc_id").select(
        "url",
        F.timestamp_seconds(F.col("fetch_ts")).alias("warc_ts"),
        synth_rep_html(
            F.col("text"),
            hrefs,
            nofollow,
            F.expr(rep_meta_robots_sql("doc_id")),
            F.expr(rep_canonical_sql("doc_id")),
        ).alias("html"),
        "text",
        F.split(F.col("languages"), ",").getItem(0).alias("lang"),
    )
