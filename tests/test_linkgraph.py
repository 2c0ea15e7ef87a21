"""Link-graph chain: html anchor synthesis, codegen outlink parse, href
resolution (codegen + urljoin tiers), host graph, and parity between
html-parse discovery and the frontier's arithmetic expand_links model.

Oracle exactness of the four link-graph queries is covered by
tests/test_oracle_parity.py (they are oracle-paired registry entries);
this file pins the per-row models and the plan shapes.
"""

from __future__ import annotations

from urllib.parse import urljoin

import pytest
from pyspark.sql import functions as F

from cc_crawl_statistics_spark.functions.extract import extract_text_bytes
from cc_crawl_statistics_spark.functions.links import (
    parse_outlinks_col,
    resolve_href_col,
    resolve_href_udf,
    synth_linked_html_bytes,
)
from cc_crawl_statistics_spark.operators import linkgraph as LG


def test_parse_anchors_two_fields(spark):
    from cc_crawl_statistics_spark.functions.links import parse_anchors_col

    html = (
        b'<html><body><a href="https://a.com/x">Click here</a>'
        b'<a href="/rel/p.html" rel="nofollow">rel text</a>'
        b'<a href="https://b.org/">'
        b"</a></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html binary")
    rows = df.select(
        F.explode(parse_anchors_col(F.col("html"))).alias("a")
    ).select("a.href", "a.text")
    got = [(r.href, r.text) for r in rows.collect()]
    assert got == [
        ("https://a.com/x", "Click here"),
        ("/rel/p.html", "rel text"),
        ("https://b.org/", ""),
    ]
from cc_crawl_statistics_spark.sources.cc_pages import cc_pages_linked_df
from cc_crawl_statistics_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE

HREFS = [
    "https://www.site3.org/page/7.html",
    "http://cdn.site0.jp/page/11.html",
    "/page/42.html",
]


def test_linked_html_preserves_extraction_invariant():
    """Anchors carry no text, so extract_text(html) == text keeps holding
    byte-for-byte on linked pages (the north-rule per-row invariant)."""
    for text in ["plain words", "a < b & c > d", "", "tab\tand  spaces"]:
        html = synth_linked_html_bytes(text, HREFS)
        want = extract_text_bytes(synth_linked_html_bytes(text, []))
        assert extract_text_bytes(html) == want
        # and the no-links flavor extracts to the original text exactly
        norm = " ".join(text.split())
        assert extract_text_bytes(html) == norm


def test_parse_outlinks_matches_synthesis(spark):
    """regexp parse recovers exactly the hrefs that were embedded."""
    rows = [("plain", HREFS), ("with & entity", []), ("x", ["/only.html"])]
    df = spark.createDataFrame(
        [(synth_linked_html_bytes(t, h), h) for t, h in rows],
        "html binary, want array<string>",
    )
    got = df.select(
        parse_outlinks_col(F.col("html")).alias("got"), "want"
    ).collect()
    for r in got:
        assert r.got == r.want


RESOLVE_CASES = [
    # (base, href) — codegen classes
    ("https://www.a.com/dir/page.html", "https://b.org/x"),
    ("https://www.a.com/dir/page.html", "http://b.org/x?q=1"),
    ("https://www.a.com/dir/page.html", "//cdn.c.net/y.js"),
    ("https://www.a.com/dir/page.html", "/rooted/z.html"),
    ("https://www.a.com/dir/page.html", "sibling.html"),
    ("https://www.a.com/dir/sub/p.html", "a/b.html"),
    ("http://a.com/p.html", ""),
    ("http://a.com/p.html", "#frag"),
    # non-hierarchical schemes → NULL in both tiers (not fetchable URLs;
    # resolving them as relative paths would mint phantom same-host edges)
    ("http://a.com/p.html", "mailto:bob@x.com"),
    ("http://a.com/p.html", "javascript:void(0)"),
    ("http://a.com/p.html", "tel:+1-555-0100"),
    ("http://a.com/p.html", "data:text/plain,hi"),
]


def test_resolve_udf_is_urljoin(spark):
    """The Arrow tier IS RFC 3986: equal to stdlib urljoin on every class,
    including dot-segments the codegen tier doesn't normalize."""
    cases = RESOLVE_CASES + [
        ("https://a.com/d1/d2/p.html", "../up.html"),
        ("https://a.com/d1/d2/p.html", "../../up2.html"),
        ("https://a.com/d1/p.html", "./here.html"),
        ("https://a.com/p.html", "?q=2"),
    ]
    df = spark.createDataFrame(cases, "base string, href string")
    got = df.select(
        "base", "href", resolve_href_udf("base", "href").alias("r")
    ).collect()
    for r in got:
        if r.href == "" or r.href.startswith("#"):
            want = None
        else:
            want = urljoin(r.base, r.href)
            if not want.startswith(("http://", "https://")):
                want = None  # non-hierarchical scheme → not a web URL
        assert r.r == want, (r.base, r.href, r.r, want)


def test_resolve_codegen_agrees_with_udf_on_its_classes(spark):
    """Codegen tier == urljoin on absolute / protocol-relative /
    root-relative / dot-segment-free document-relative hrefs."""
    df = spark.createDataFrame(RESOLVE_CASES, "base string, href string")
    parsed = df.select(
        "base",
        "href",
        resolve_href_col(
            F.parse_url("base", F.lit("PROTOCOL")),
            F.parse_url("base", F.lit("HOST")),
            F.parse_url("base", F.lit("PATH")),
            F.col("href"),
        ).alias("fast"),
        resolve_href_udf("base", "href").alias("full"),
    ).collect()
    for r in parsed:
        assert r.fast == r.full, (r.base, r.href, r.fast, r.full)


def test_parse_plan_is_pure_codegen(spark):
    """The outlink parse/resolve path contains zero Python evaluation —
    the blob-touching stage stays JVM-side (UDFs appear only in the
    fixture's html SYNTHESIS, never in the engine's parse)."""
    df = spark.createDataFrame(
        [(synth_linked_html_bytes("t", HREFS), "https://www.a.com/p.html")],
        "html binary, url string",
    )
    plan = LG.page_outlinks(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "pythonUDF" not in plan


def test_html_discovery_matches_expand_links_model(spark):
    """Crawl-discovery parity: the child URLs parsed out of the html bytes
    (absolute anchors 1-2) are EXACTLY the frontier's arithmetic expansion
    (2d+1, 3d+7 mod N — scheduler.expand_links), for every page."""
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    pages = cc_pages_linked_df(spark, SF_SMOKE)
    parsed = LG.page_outlinks(pages).filter(
        # keep only the two absolute cross-host children: the root-relative
        # sibling link resolves onto the page's own host
        ~F.col("outlink").startswith(
            F.concat(
                F.parse_url("url", F.lit("PROTOCOL")),
                F.lit("://"),
                F.parse_url("url", F.lit("HOST")),
                F.lit("/"),
            )
        )
    )
    from cc_crawl_statistics_spark.sources.tables import pages_df
    from cc_crawl_statistics_spark.synth import child_url_sql

    base = pages_df(spark, SF_SMOKE).select("url", "doc_id").distinct()
    model = base.select(
        "url",
        F.explode(
            F.array(
                F.expr(child_url_sql(f"(doc_id*2+1) % {n_docs}")),
                F.expr(child_url_sql(f"(doc_id*3+7) % {n_docs}")),
            )
        ).alias("outlink"),
    )
    # the model may emit a child equal to the same-host sibling (rare id
    # collision) — apply the identical cross-host filter
    model = model.filter(
        ~F.col("outlink").startswith(
            F.concat(
                F.parse_url("url", F.lit("PROTOCOL")),
                F.lit("://"),
                F.parse_url("url", F.lit("HOST")),
                F.lit("/"),
            )
        )
    ).distinct()
    assert parsed.exceptAll(model).count() == 0
    assert model.exceptAll(parsed).count() == 0


def test_html_discovery_fn_vs_arithmetic(spark):
    """The pluggable html-parse discovery (scheduler.html_discovery)
    yields exactly the arithmetic expand_links set PLUS the root-relative
    sibling links that happen to resolve onto real universe URLs — and
    identical attribute rows for the shared URLs."""
    from cc_crawl_statistics_spark.frontier import scheduler
    from cc_crawl_statistics_spark.functions.urlkit import host_of, scheme_of
    from cc_crawl_statistics_spark.sources.tables import pages_df

    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    universe = scheduler.url_universe(pages_df(spark, SF_SMOKE)).cache()
    sched = (
        universe.orderBy("url")
        .limit(40)
        .select("url", "doc_id", F.lit(0).alias("depth"))
    )
    arith = scheduler.expand_links(sched, universe, n_docs).cache()
    parsed = scheduler.html_discovery(spark, SF_SMOKE)(
        sched, universe, n_docs
    ).cache()

    sib = sched.select(
        F.concat(
            scheme_of(F.col("url")),
            F.lit("://"),
            host_of(F.col("url")),
            F.lit("/page/"),
            ((F.col("doc_id") * 5 + 3) % n_docs).cast("string"),
            F.lit(".html"),
        ).alias("url")
    ).join(universe.select("url"), "url", "semi")
    expected = {
        r.url for r in arith.select("url").union(sib).distinct().collect()
    }
    got = {r.url for r in parsed.select("url").collect()}
    assert got == expected
    # shared URLs carry identical rows (attrs/score/depth from the universe)
    shared = parsed.join(arith.select("url"), "url", "semi")
    assert shared.exceptAll(arith).count() == 0


def test_run_round_with_html_discovery(spark, tmp_path):
    """Full scheduling rounds driven by real html parsing: round-1
    schedule is identical to the arithmetic engine (discovery hasn't fed
    back yet) and round-1 discovery is a superset of the arithmetic
    delta."""
    from cc_crawl_statistics_spark.frontier import scheduler
    from cc_crawl_statistics_spark.frontier.state import SnapshotStore

    s_html = SnapshotStore(str(tmp_path / "html"))
    s_arith = SnapshotStore(str(tmp_path / "arith"))
    fn = scheduler.html_discovery(spark, SF_SMOKE)
    m1h = scheduler.run_round(spark, s_html, SF_SMOKE, expand_fn=fn)
    m1a = scheduler.run_round(spark, s_arith, SF_SMOKE)
    assert m1h["n_scheduled"] == m1a["n_scheduled"]
    sched_h = s_html.read(spark, 1, "schedule")
    sched_a = s_arith.read(spark, 1, "schedule")
    assert sched_h.exceptAll(sched_a).count() == 0
    assert sched_a.exceptAll(sched_h).count() == 0
    delta_h = s_html.read(spark, 1, "frontier_delta")
    delta_a = s_arith.read(spark, 1, "frontier_delta")
    assert delta_a.exceptAll(delta_h).count() == 0  # superset
    assert m1h["n_discovered_new"] >= m1a["n_discovered_new"]
    # and the engine keeps scheduling from the parsed frontier
    m2h = scheduler.run_round(spark, s_html, SF_SMOKE, expand_fn=fn)
    assert m2h["n_scheduled"] > 0


def test_host_degree_stats_semantics(spark):
    edges = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1), ("b", "a", 2), ("x", "a", 1)],
        "src_host string, dst_host string, n_links long",
    )
    rows = {r.host: r for r in LG.host_degree_stats(edges).collect()}
    assert rows["a"].out_degree == 2 and rows["a"].out_links == 4
    assert rows["a"].in_degree == 2
    assert rows["c"].out_degree == 0 and rows["c"].in_degree == 1
    assert rows["x"].out_degree == 1 and rows["x"].in_degree == 0


def test_self_loop_flag(spark):
    out = spark.createDataFrame(
        [
            ("https://a.com/1", "https://a.com/2"),
            ("https://a.com/1", "https://b.com/1"),
        ],
        "url string, outlink string",
    )
    with_loops = LG.host_link_graph(out).collect()
    no_loops = LG.host_link_graph(out, keep_self_loops=False).collect()
    assert len(with_loops) == 2 and len(no_loops) == 1
    assert no_loops[0].dst_host == "b.com"


def _chain_edges(spark):
    # a -> b -> c -> d -> e plus a hub z -> {a,b,c}: known distances
    rows = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
        ("z", "a"), ("z", "b"), ("z", "c"),
    ]
    return spark.createDataFrame(rows, "src_host string, dst_host string")


def test_bounded_harmonic_exact_chain(spark):
    """Hand-computable graph: outgoing harmonic of 'a' at radius 3 is
    1/1 + 1/2 + 1/3 (b,c,d); 'z' reaches a,b,c at 1 and c? b->c dup at 2,
    d at 2/3 via shortest — verify min-distance semantics exactly."""
    got = {
        r.host: r
        for r in LG.bounded_harmonic_centrality(
            _chain_edges(spark), radius=3
        ).collect()
    }
    assert got["a"].n_reached == 3
    assert got["a"].harmonic_x1m == 1_000_000 + 500_000 + 333_333
    # z: b,a,c at d=1; d(c via b)=... c at 1; d at 2; e at 3
    assert got["z"].n_reached == 5
    assert (
        got["z"].harmonic_x1m
        == 3 * 1_000_000 + 500_000 + 333_333
    )
    assert "e" not in got  # sinks reach nothing


def test_hyperball_matches_exact_on_fixture(spark):
    """HyperBall estimate vs exact bounded harmonic on the fixture host
    graph: at fixture ball sizes (≤ ~120 hosts) the lgk=12 sketch is in
    sparse range, so estimates should track closely — assert ≤5% relative
    error per host and identical reach ordering for the top hosts."""
    from cc_crawl_statistics_spark.plans.pipeline_queries import (
        q_host_harmonic,
        q_host_hyperball,
    )

    SF = "/root/testdata/sf0.001"
    exact = {r.host: r for r in q_host_harmonic(spark, SF).collect()}
    est = {r.host: r for r in q_host_hyperball(spark, SF).collect()}
    assert set(exact) <= set(est)
    for h, r in exact.items():
        rel = abs(est[h].harmonic_x1m_est - r.harmonic_x1m) / max(
            r.harmonic_x1m, 1
        )
        assert rel <= 0.05, (h, est[h].harmonic_x1m_est, r.harmonic_x1m)


def test_trustrank_over_parsed_host_graph(spark):
    """Glue: TrustRank runs directly on the host-level web graph parsed
    out of html bytes (string node ids), seeded with the fixture's
    www-subdomain hosts — linked hosts accumulate trust, and every
    host's trust is bounded by reachability from the seed set."""
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.operators.linkgraph import (
        host_link_graph,
        page_outlinks,
    )
    from cc_crawl_statistics_spark.operators.pagerank import trustrank
    from cc_crawl_statistics_spark.sources.cc_pages import (
        cc_pages_linked_df,
    )
    from tests.conftest import SF_SMOKE

    edges = host_link_graph(
        page_outlinks(cc_pages_linked_df(spark, SF_SMOKE))
    ).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(F.col("node").startswith("www."))
    got = trustrank(edges, seeds, nodes=nodes, n_iter=4).collect()
    trust = {r["node"]: r["trust_fp"] for r in got}
    assert len(trust) == nodes.count()
    # the dense fixture graph propagates trust beyond the seeds…
    non_seed = {h: t for h, t in trust.items() if not h.startswith("www.")}
    assert any(t > 0 for t in non_seed.values())
    # …and seeds, holding the teleport mass, dominate the top of the list
    top = sorted(trust, key=lambda h: -trust[h])[:5]
    assert any(h.startswith("www.") for h in top)
