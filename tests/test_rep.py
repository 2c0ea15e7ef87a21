"""REP page directives (functions/rep.py, operators/rep_gate.py): parse
semantics on pinned literals, the extraction byte-identity invariant on
REP-annotated fixtures, and gate composition. Oracle exactness for the
three registry queries (meta_robots, nofollow_graph, canonical_dedup) is
covered by test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.functions.extract import extract_text_bytes
from cc_crawl_statistics_spark.functions.rep import (
    parse_meta_robots_col,
    parse_outlinks_rel_col,
    parse_rel_canonical_col,
    robots_nofollow_col,
    robots_noindex_col,
    synth_rep_html_bytes,
)
from cc_crawl_statistics_spark.operators.linkgraph import (
    page_outlinks,
    page_outlinks_rel,
)
from cc_crawl_statistics_spark.operators.rep_gate import (
    indexable_pages,
    with_rep_flags,
)
from cc_crawl_statistics_spark.sources.cc_pages import cc_pages_rep_df
from tests.conftest import SF_SMOKE


def _flags(spark, content_or_html):
    if isinstance(content_or_html, bytes):
        df = spark.createDataFrame([(content_or_html,)], "html binary")
        meta = parse_meta_robots_col(F.col("html"))
    else:
        df = spark.createDataFrame([(content_or_html,)], "c string")
        meta = F.col("c")
    return df.select(
        robots_noindex_col(meta).alias("ni"),
        robots_nofollow_col(meta).alias("nf"),
    ).first()


def test_directive_token_semantics(spark):
    assert tuple(_flags(spark, "noindex")) == (True, False)
    assert tuple(_flags(spark, "nofollow")) == (False, True)
    assert tuple(_flags(spark, "noindex, nofollow")) == (True, True)
    # 'none' is the spec alias for both; whitespace/case tolerated
    assert tuple(_flags(spark, "NONE")) == (True, True)
    assert tuple(_flags(spark, "  NoIndex ,  follow ")) == (True, False)
    # no-op lists and absence (NULL) mean index,follow
    assert tuple(_flags(spark, "index, follow")) == (False, False)
    assert tuple(_flags(spark, "all")) == (False, False)
    assert tuple(_flags(spark, None)) == (False, False)


def test_parse_from_html_bytes(spark):
    html = synth_rep_html_bytes(
        "body text", ["https://a.example/x"], [True],
        "noindex, nofollow", "https://a.example/canon",
    )
    row = (
        spark.createDataFrame([(html,)], "html binary")
        .select(
            parse_meta_robots_col(F.col("html")).alias("meta"),
            parse_rel_canonical_col(F.col("html")).alias("canon"),
            parse_outlinks_rel_col(F.col("html")).alias("anchors"),
        )
        .first()
    )
    assert row["meta"] == "noindex, nofollow"
    assert row["canon"] == "https://a.example/canon"
    assert [a.asDict() for a in row["anchors"]] == [
        {"href": "https://a.example/x", "nofollow": True}
    ]


def test_absent_tags_parse_null(spark):
    html = synth_rep_html_bytes("plain", [], [], None, None)
    row = (
        spark.createDataFrame([(html,)], "html binary")
        .select(
            parse_meta_robots_col(F.col("html")).alias("meta"),
            parse_rel_canonical_col(F.col("html")).alias("canon"),
        )
        .first()
    )
    assert row["meta"] is None
    assert row["canon"] is None


def test_extraction_invariant_on_rep_fixture():
    # REP markup is head tags + empty anchors: extract_text must still
    # recover the text byte-for-byte (single-row specification model)
    html = synth_rep_html_bytes(
        "a < b & c > d", ["https://x.example/", "/rel"], [False, True],
        "none", "https://x.example/canonical",
    )
    assert extract_text_bytes(html) == "a < b & c > d"


def test_extraction_invariant_over_corpus(spark):
    rep = cc_pages_rep_df(spark, SF_SMOKE)
    from cc_crawl_statistics_spark.functions.extract import extract_text

    mismatches = rep.filter(
        extract_text(F.col("html")) != F.col("text")
    ).count()
    assert mismatches == 0


def test_nofollow_filters_are_a_subset(spark):
    rep = cc_pages_rep_df(spark, SF_SMOKE)
    all_edges = page_outlinks_rel(rep, honor_nofollow=False)
    followed = page_outlinks_rel(rep, honor_nofollow=True)
    n_all, n_followed = all_edges.count(), followed.count()
    assert 0 < n_followed < n_all
    # rel-agnostic parse agrees with the plain href extractor
    assert n_all == page_outlinks(rep).count()
    assert followed.exceptAll(all_edges).count() == 0


def test_indexable_gate_matches_arithmetic(spark):
    rep = cc_pages_rep_df(spark, SF_SMOKE)
    n_total = rep.count()
    n_indexable = indexable_pages(rep).count()
    # fixture: doc_id % 7 in {0,2,3} -> noindex
    flagged = with_rep_flags(rep)
    assert n_indexable == n_total - flagged.filter("noindex").count()
    assert set(indexable_pages(rep).columns) == set(rep.columns)


def test_canonical_resolves_to_live_urls(spark):
    rep = cc_pages_rep_df(spark, SF_SMOKE)
    flagged = with_rep_flags(rep).filter(F.col("canonical").isNotNull())
    urls = {r["url"] for r in rep.select("url").distinct().collect()}
    targets = {
        r["canonical"]
        for r in flagged.select("canonical").distinct().collect()
    }
    # every canonical hint points at a real capture in the fixture
    assert targets and targets <= urls
