"""CDX ingest + wire-format compat: golden round-trips and codec pins."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.dims import crawl_date
from cc_crawl_statistics_spark.operators.counts import host_counts
from cc_crawl_statistics_spark.sources import compat
from cc_crawl_statistics_spark.sources.cdx import parse_cdx_lines, read_cdx
from cc_crawl_statistics_spark.sources.tables import pages_df
from tests.conftest import SF_SMOKE

CDX_FIXTURE = [
    # sorted by SURT key; JSON metadata like the reference input
    'org,example)/ 20240301120000 {"url": "https://example.org/", '
    '"status": "200", "mime": "text/html", "mime-detected": "text/html", '
    '"languages": "en", "digest": "AAA", "filename": "seg/warc/p0.warc.gz"}',
    'org,example)/about 20240301120001 {"url": "https://example.org/about", '
    '"status": "404", "mime": "text/html", "digest": "BBB", '
    '"filename": "seg/warc/p0.warc.gz"}',
    'org,example)/robots.txt 20240301120002 '
    '{"url": "https://example.org/robots.txt", "status": "200", '
    '"filename": "seg/robotstxt/p0.warc.gz"}',
    "uk,co,site)/ 20240301120003 "
    '{"url": "http://site.co.uk/", "status": "200", "mime": "Text/HTML", '
    '"digest": "AAA", "filename": "seg/warc/p1.warc.gz"}',
    "zz,broken)/ 20240301120004 {not json",
    "1,2,0,10)/ 20240301120005 "
    '{"url": "http://10.0.2.1/", "status": "200", '
    '"filename": "seg/warc/p1.warc.gz"}',
]


def test_cdx_parse(spark):
    lines = spark.createDataFrame([(x,) for x in CDX_FIXTURE], "value string")
    parsed = parse_cdx_lines(lines).toPandas().set_index("surt_key")
    assert parsed.is_valid.sum() == 5  # malformed JSON row flagged
    row = parsed.loc["org,example)/"]
    assert row.host == "example.org" and row.scheme == "https"
    assert row.domain == "example.org" and row.tld == "org"
    assert row.status == 200
    uk = parsed.loc["uk,co,site)/"]
    assert uk.tld == "co.uk" and uk.domain == "site.co.uk"  # longest suffix
    ip = parsed.loc["1,2,0,10)/"]
    assert ip.tld == "(ip address)"
    bad = parsed[~parsed.is_valid]
    assert len(bad) == 1


def test_cdx_to_stats_pipeline(spark, tmp_path):
    path = tmp_path / "cdx-00000"
    path.write_text("\n".join(CDX_FIXTURE) + "\n")
    pages = read_cdx(spark, str(path), "CC-MAIN-2024-10")
    assert pages.count() == 5
    hc = host_counts(pages).toPandas()
    # status-200 non-robots pages: example.org/, site.co.uk/, IP host
    assert set(hc.host) == {"example.org", "site.co.uk", "10.0.2.1"}


def test_compress_counts_reference_semantics():
    # pins from the reference's documented behavior (crawlstats.py:388-397)
    assert compat.compress_counts([5, 5]) == 5
    assert compat.compress_counts([5, 4, 4]) == [5, 4]
    assert compat.compress_counts([3]) == 3
    assert compat.compress_counts([1, 2, 3]) == [1, 2, 3]
    assert compat.expand_counts(5, 3) == [5, 5, 5]
    assert compat.expand_counts([5, 4], 4) == [5, 4, 4, 4]
    # ragged merge (reference tests/test_crawlstat.py:96-105 equivalents)
    assert compat.merge_compressed([5, [3, 2]]) == [8, 7]
    assert compat.merge_compressed([[2, 1], [3, 2], 1]) == [6, 4]
    assert compat.merge_compressed([1, 1]) == 2


def test_wire_format_roundtrip(spark):
    stats = host_counts(pages_df(spark, SF_SMOKE)).select(
        F.lit("host").alias("type"),
        F.col("host").alias("key"),
        "crawl",
        "pages",
        "urls",
    )
    lines = compat.emit_stats_lines(stats)
    sample = lines.limit(5).collect()
    for r in sample:
        k, v = r.line.split("\t")
        t, key, crawl = json.loads(k)
        assert t == "host" and crawl.startswith("CC-MAIN-")
        val = json.loads(v)
        assert isinstance(val, (int, list))
    back = compat.read_stats_lines(
        lines.withColumnRenamed("line", "value")
    ).toPandas()
    orig = stats.toPandas()
    merged = back.merge(
        orig, on=["type", "key", "crawl"], suffixes=("_rt", "")
    )
    assert len(merged) == len(orig) == len(back)
    assert (merged.pages_rt == merged.pages).all()
    assert (merged.urls_rt == merged.urls).all()


def test_wire_format_golden_bytes(spark):
    """Byte-exact golden: emitted lines equal an independently-formatted
    pandas computation over the same pages fixture."""
    pages = pages_df(spark, SF_SMOKE).toPandas()
    p = pages[
        (pages.status == 200) & ~pages.warc_filename.str.contains("/robotstxt/")
    ]
    g = (
        p.groupby(["crawl", "scheme"])
        .agg(pages=("url", "size"), urls=("url", "nunique"))
        .reset_index()
    )
    expected = []
    for _, r in g.iterrows():
        val = (
            int(r.pages)
            if r.pages == r.urls
            else [int(r.pages), int(r.urls)]
        )
        expected.append(
            json.dumps(["scheme", r.scheme, r.crawl]) + "\t" + json.dumps(val)
        )
    expected = sorted(expected)

    from cc_crawl_statistics_spark.operators.counts import scheme_counts

    stats = scheme_counts(pages_df(spark, SF_SMOKE)).select(
        F.lit("scheme").alias("type"),
        F.col("scheme").alias("key"),
        "crawl",
        "pages",
        "urls",
    )
    got = [r.line for r in compat.emit_stats_lines(stats).collect()]
    assert got == expected


def test_crawl_date():
    d = crawl_date("CC-MAIN-2024-10")
    assert d.isoweekday() == 1 and d.isocalendar()[1] == 10


def test_crawler_metrics_side_input(spark, tmp_path):
    """S5: Nutch counter dumps parse, roll up per metrics_map, and titles
    rewrite (crawler_metrics.py:75-91, 145-152 semantics)."""
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.sources.crawler_metrics import (
        crawler_metrics_stats,
        display_title,
        read_crawler_metrics,
    )

    fixture = tmp_path / "CC-MAIN-2024-10.json"
    fixture.write_text(
        '["crawl_status", "generator:fetch_list", "CC-MAIN-2024-10"]\t100\n'
        '["crawl_status", "fetcher:total", "CC-MAIN-2024-10"]\t90\n'
        '["crawl_status", "fetcher:moved", "CC-MAIN-2024-10"]\t7\n'
        '["crawl_status", "fetcher:temp_moved", "CC-MAIN-2024-10"]\t3\n'
        '["crawl_status", "fetcher:gone", "CC-MAIN-2024-10"]\t2\n'
        '["size", "page", "CC-MAIN-2024-10"]\t80\n'
        '["size", "url", "CC-MAIN-2024-10"]\t75\n'
        '["size", "digest", "CC-MAIN-2024-10"]\t70\n'
        '["scheme", "https", "CC-MAIN-2024-10"]\t[60, 55]\n'
        '["scheme", "http", "CC-MAIN-2024-10"]\t20\n'
    )
    parsed = read_crawler_metrics(spark, str(fixture))
    assert parsed.count() == 10

    stats = crawler_metrics_stats(parsed)
    got = {r["item_type"]: r["value"] for r in stats.collect()}
    # size: only page/url kept, digest dropped
    assert got["page"] == 80 and got["url"] == 75 and "digest" not in got
    # scheme takes the unique-URL element (index 1), scalar falls back
    assert got["scheme:https"] == 55 and got["scheme:http"] == 20
    # metrics_map rollup
    assert got["fetcher:aggr:redirect"] == 10
    assert got["fetcher:aggr:failed"] == 2

    titles = {
        r["item_type"]: r["t"]
        for r in stats.select(
            "item_type", display_title(F.col("item_type")).alias("t")
        ).collect()
    }
    assert titles["generator:fetch_list"] == "fetch list"
    assert titles["fetcher:aggr:redirect"] == "fetch redirect"
    assert titles["page"] == "pages released"


def test_presentation_csv_golden(spark, tmp_path):
    """S7 CSV sink (crawl_size.py:162-165 / table.py:121-135): pinned bytes
    for a pinned aggregate."""
    from cc_crawl_statistics_spark.sources import presentation as P

    df = spark.createDataFrame(
        [("CC-MAIN-2024-10", "text/html", 80, 70),
         ("CC-MAIN-2024-10", "app/pdf", 20, 18),
         ("CC-MAIN-2024-18", "text/html", 50, 50)],
        "crawl string, mimetype string, pages long, urls long",
    ).orderBy("crawl", "mimetype")
    out = str(tmp_path / "t.csv")
    P.write_csv(df, out)
    assert open(out).read() == (
        "crawl,mimetype,pages,urls\n"
        "CC-MAIN-2024-10,app/pdf,20,18\n"
        "CC-MAIN-2024-10,text/html,80,70\n"
        "CC-MAIN-2024-18,text/html,50,50\n"
    )


def test_presentation_html_percentage_pivot(spark, tmp_path):
    """S7 HTML sink (table.py:146-160): percentage pivot computed in Spark,
    rendered with the reference's formatters + CSS classes."""
    from cc_crawl_statistics_spark.sources import presentation as P

    df = spark.createDataFrame(
        [("CC-MAIN-2024-10", "text/html", 80),
         ("CC-MAIN-2024-10", "app/pdf", 20),
         ("CC-MAIN-2024-18", "text/html", 50)],
        "crawl string, mimetype string, pages long",
    )
    piv = P.percentage_pivot(df, "mimetype").toPandas().set_index("mimetype")
    assert piv.loc["text/html"]["CC-MAIN-2024-10"] == 800000  # 80.0000%
    assert piv.loc["app/pdf"]["CC-MAIN-2024-10"] == 200000
    assert piv.loc["text/html"]["CC-MAIN-2024-18"] == 1000000
    out = str(tmp_path / "t.html")
    P.write_percentage_html(df, out, "mimetype")
    html = open(out).read()
    assert 'class="dataframe tablesorter tablepercentage"' in html
    assert "80.0000" in html and "20.0000" in html and "100.0000" in html


def test_presentation_sink_refuses_unaggregated(spark):
    from cc_crawl_statistics_spark.sources import presentation as P
    import pytest

    big = spark.range(200)
    with pytest.raises(ValueError, match="aggregate first"):
        P.write_csv(big, "/tmp/never.csv", max_rows=100)
