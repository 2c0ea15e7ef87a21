"""Byte-identical extracted-text invariant (BASELINE.json input_hint):
the Arrow UDF must equal the single-row specification on every row, and
round-trip synthesized pages exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.functions.extract import (
    extract_text,
    extract_text_bytes,
    synth_html,
    synth_html_bytes,
)
from cc_crawl_statistics_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_roundtrip_byte_identical(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    out = docs.select(
        "doc_id",
        "text",
        extract_text(synth_html(F.col("text"))).alias("extracted"),
    )
    mismatched = out.filter(
        ~(F.col("extracted") == F.col("text"))
    ).count()
    assert mismatched == 0
    assert out.count() == docs.count()


def test_udf_matches_specification_per_row(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(50)
    rows = docs.collect()
    html_df = docs.select(
        "doc_id", synth_html(F.col("text")).alias("html")
    )
    spark_out = {
        r["doc_id"]: r["t"]
        for r in html_df.select(
            "doc_id", extract_text(F.col("html")).alias("t")
        ).collect()
    }
    for r in rows:
        model = extract_text_bytes(synth_html_bytes(r["text"]))
        assert spark_out[r["doc_id"]] == model  # byte-identical per url


def test_entities_and_whitespace():
    t = 'a <b> & "c" \'d\'  \n e'
    assert extract_text_bytes(synth_html_bytes(t)) == "a <b> & \"c\" 'd' e"


def test_no_per_row_python_in_plan(spark):
    """The extraction stage must be ArrowEvalPython (vectorized), never
    BatchEvalPython (per-row pickled Python)."""
    docs = load_table(spark, SF, "documents").select("text")
    plan = (
        docs.select(extract_text(synth_html(F.col("text"))).alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
