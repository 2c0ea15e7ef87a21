"""Sitemap source tests (sources/sitemap.py): entry roundtrip, priority
decimal→permille conversion, protocol default, malformed tolerance, and
the seed-list bridge into the frontier schema."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.sources import sitemap as SM
from cc_crawl_statistics_spark.sources.tables import pages_df

SF = "/root/testdata/sf0.001"


def test_render_parse_roundtrip(spark):
    pages = pages_df(spark, SF)
    parsed = SM.parse_sitemaps(SM.render_sitemaps(pages))
    want = pages.groupBy("host", "url").agg(F.max("fetch_ts").alias("lastmod"))
    got = parsed.select("host", "url", "lastmod")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_priority_conversion_and_default(spark):
    xml = (
        "<urlset>"
        "<url><loc>http://a/1</loc><lastmod>5</lastmod><priority>0.80</priority></url>"
        "<url><loc>http://a/2</loc><lastmod>6</lastmod><priority>1.00</priority></url>"
        "<url><loc>http://a/3</loc><lastmod>7</lastmod></url>"  # absent → 500
        "<url><loc>http://a/4</loc><lastmod>8</lastmod><priority>bogus</priority></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("a", xml)], ["host", "sitemap_xml"])
    got = {
        r["url"]: r["priority_permille"]
        for r in SM.parse_sitemaps(df).collect()
    }
    assert got == {
        "http://a/1": 800,
        "http://a/2": 1000,
        "http://a/3": 500,
        "http://a/4": 500,  # unparsable decimal → protocol default
    }


def test_malformed_document_dropped_not_fatal(spark):
    df = spark.createDataFrame(
        [
            ("good", "<urlset><url><loc>http://g/</loc></url></urlset>"),
            ("bad", "<<<not xml"),
            ("empty", "<urlset></urlset>"),
        ],
        ["host", "sitemap_xml"],
    )
    rows = SM.parse_sitemaps(df).collect()
    assert [(r["host"], r["url"]) for r in rows] == [("good", "http://g/")]


def test_seeds_match_frontier_schema(spark):
    pages = pages_df(spark, SF)
    seeds = SM.seeds_from_sitemaps(SM.render_sitemaps(pages))
    assert seeds.columns == ["url", "host", "depth", "score", "state"]
    assert seeds.filter("depth != 0 OR state != 'pending'").count() == 0
    assert seeds.count() == pages.select("url").distinct().count()


# --- robots.txt Sitemap: directive discovery --------------------------------


def test_sitemap_directives_parse(spark):
    from cc_crawl_statistics_spark.frontier.robots import sitemap_directives

    body = (
        "Sitemap: https://h1/sm.xml\n"          # before any group
        "User-agent: *\nDisallow: /x\n"
        "sitemap: HTTPS://h1/other.xml  # cmt\n"  # inside a group, mixed case
        "Sitemap: /relative.xml\n"                # relative -> ignored
        "Sitemap: https://h1/sm.xml\n"            # duplicate -> distinct
    )
    robots = spark.createDataFrame(
        [("h1", body)], "host string, robots_txt string"
    )
    got = sorted(
        r.sitemap_url for r in sitemap_directives(robots).collect()
    )
    assert got == ["HTTPS://h1/other.xml", "https://h1/sm.xml"]


def test_advertised_sitemaps_filters_hosts(spark):
    """Only hosts whose robots.txt advertises a sitemap survive the
    discovery semi join (synthetic rule: even site_id)."""
    from cc_crawl_statistics_spark.frontier.robots import synth_robots
    from cc_crawl_statistics_spark.sources.sitemap import (
        advertised_sitemaps,
        render_sitemaps,
        seeds_from_sitemaps,
    )
    from cc_crawl_statistics_spark.sources.tables import pages_df

    pages = pages_df(spark, SF)
    robots = synth_robots(pages.select("host").distinct())
    sm = render_sitemaps(pages)
    adv = advertised_sitemaps(robots, sm)
    sites = {
        int(r.host.split("site")[1].split(".")[0])
        for r in adv.select("host").distinct().collect()
    }
    assert sites and all(s % 2 == 0 for s in sites)
    # seeds only come from advertised hosts
    seeds = seeds_from_sitemaps(adv)
    bad = seeds.filter(
        F.regexp_extract("host", "site([0-9]+)", 1).cast("int") % 2 == 1
    ).count()
    assert bad == 0


def test_sitemap_shards_and_index(spark):
    """Protocol sharding: a host over the cap splits into ceil(n/cap)
    urlset files; the index advertises every shard with the shard's
    newest lastmod; membership is stable (url order) across renders."""
    from cc_crawl_statistics_spark.sources.sitemap import (
        parse_sitemap_index,
        parse_sitemaps,
        render_sitemap_shards,
    )

    rows = [
        ("big.com", f"https://big.com/p{i:03d}", 1000 + i, i) for i in range(25)
    ] + [("small.org", "https://small.org/only", 99, 7)]
    pages = spark.createDataFrame(
        rows, "host string, url string, fetch_ts long, doc_id long"
    )
    shards, index = render_sitemap_shards(pages, max_urls=10)
    s = {(r.host, r.shard_id): r for r in shards.collect()}
    assert sum(1 for k in s if k[0] == "big.com") == 3  # ceil(25/10)
    assert ("small.org", 0) in s and len(s) == 4
    idx = parse_sitemap_index(index).collect()
    assert len(idx) == 4
    locs = {r.shard_loc for r in idx}
    assert "https://big.com/sitemap-2.xml" in locs
    # shard 2 of big.com holds urls p020..p024 -> lastmod 1024
    assert s[("big.com", 2)].lastmod == 1024
    # round-trip: parsing all shards recovers every url exactly once
    ent = parse_sitemaps(shards).collect()
    assert len(ent) == 26 and len({e.url for e in ent}) == 26
    # determinism across renders
    shards2, _ = render_sitemap_shards(pages, max_urls=10)
    assert sorted(
        (r.host, r.shard_id, r.sitemap_xml) for r in shards2.collect()
    ) == sorted((r.host, r.shard_id, r.sitemap_xml) for r in shards.collect())


def test_stale_captures_semantics(spark):
    """Advertised-vs-captured refresh: newer advertisement flags, equal
    timestamps don't, never-captured advertised URLs flag with NULL
    capture."""
    from cc_crawl_statistics_spark.operators.recrawl import stale_captures

    entries = spark.createDataFrame(
        [
            ("h", "http://h/fresh", 1000),
            ("h", "http://h/edited", 2000),
            ("h", "http://h/new", 500),
        ],
        "host string, url string, lastmod long",
    )
    caps = spark.createDataFrame(
        [
            ("http://h/fresh", 1000),
            ("http://h/edited", 1500),
            ("http://h/edited", 900),  # older capture must not win
            ("http://h/other", 1),     # captured but not advertised: absent
        ],
        "url string, fetch_ts long",
    )
    got = {r.url: r for r in stale_captures(entries, caps).collect()}
    assert set(got) == {"http://h/fresh", "http://h/edited", "http://h/new"}
    assert not got["http://h/fresh"].stale
    e = got["http://h/edited"]
    assert (e.stale, e.last_fetch_ts, e.lag_s) == (True, 1500, 500)
    n = got["http://h/new"]
    assert n.stale and n.last_fetch_ts is None and n.lag_s is None


def test_sitemap_stale_flags_exact_cohort(spark):
    """The end-to-end chain flags exactly the doc_id%3==1 cohort with a
    3600 s lag, through real XML."""
    from cc_crawl_statistics_spark.plans.pipeline_queries import (
        q_sitemap_stale,
    )
    from tests.conftest import SF_SMOKE

    rows = q_sitemap_stale(spark, SF_SMOKE).collect()
    assert sum(r.n_stale for r in rows) > 0
    for r in rows:
        assert r.max_lag_s in (0, 3600)
        assert (r.n_stale > 0) == (r.max_lag_s == 3600)
