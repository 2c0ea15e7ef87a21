"""Semantic pins for the counting operators — ports of the reference's unit
tests (tests/test_crawlstat.py in /root/reference) onto our Spark-native
equivalents, plus invariants the rollups must satisfy."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.operators import counts as C
from cc_crawl_statistics_spark.sources.tables import pages_df
from tests.conftest import SF_SMOKE


def test_crawl_set_bitmask_semantics(spark):
    """MonthlyCrawlSet equivalents (reference tests/test_crawlstat.py:25-75):
    popcount == n_crawls, is_new ≡ lowest set bit == 1 << first_crawl_id."""
    cs = C.url_crawl_set(pages_df(spark, SF_SMOKE))
    bad = cs.filter(
        (
            F.bit_count("crawl_set_lo") + F.bit_count("crawl_set_hi")
            != F.col("n_crawls")
        )
        | (
            F.expr("crawl_set_lo & (shiftleft(1L, first_crawl_id) - 1)")
            != 0
        )
        | (F.col("crawl_set_hi") != 0)  # fixture ids 0-2 live in the lo word
    )
    assert bad.count() == 0


def test_crawl_set_bit_placement_full_registry(spark):
    """Bit placement pinned for registry-scale ids — exactly where the
    round-2 single-long bitmask silently wrapped (JVM shifts mod 64).
    One URL per id in {0, 1, 63, 64, 125, 127}; each must land in the
    right word/bit of the 128-bit (two-long) set, matching the
    reference's arbitrary-precision MonthlyCrawlSet (crawlstats.py:
    205-270) over registration ids up to 125."""
    ids = [0, 1, 63, 64, 125, 127]
    rows = [
        (f"https://x.example/{i}", f"crawl-{i}", i, 200, "f/warc/p.warc.gz")
        for i in ids
    ]
    pages = spark.createDataFrame(
        rows, "url string, crawl string, crawl_id long, status int, "
        "warc_filename string"
    )
    got = {
        r["url"]: r
        for r in C.url_crawl_set(pages).collect()
    }
    for i in ids:
        r = got[f"https://x.example/{i}"]
        expect = 1 << i
        mask = (r["crawl_set_hi"] % (1 << 64)) << 64 | (
            r["crawl_set_lo"] % (1 << 64)
        )
        assert mask == expect, (i, hex(mask))
        assert r["newest_crawl_id"] == i
        assert r["first_crawl_id"] == i
        assert r["n_crawls"] == 1


def test_crawl_set_rejects_out_of_range_ids(spark):
    import pytest

    pages = spark.createDataFrame(
        [("https://x.example/a", "c", 128, 200, "f/warc/p.warc.gz")],
        "url string, crawl string, crawl_id long, status int, "
        "warc_filename string",
    )
    with pytest.raises(Exception, match="crawl_id < 128"):
        C.url_crawl_set(pages).collect()


def test_new_items_sum_equals_distinct_urls(spark):
    p = pages_df(spark, SF_SMOKE)
    total_new = (
        C.new_items_per_crawl(p).agg(F.sum("new_urls")).collect()[0][0]
    )
    distinct_urls = C.page_rows(p).select("url").distinct().count()
    assert total_new == distinct_urls


def test_rollup_hierarchy_consistent(spark):
    """tld pages == sum of its domains' pages == sum of its hosts' pages."""
    p = pages_df(spark, SF_SMOKE)
    tld = C.tld_counts(p).toPandas()
    dom = C.domain_counts(p).toPandas()
    host = C.host_counts(p).toPandas()
    assert tld.pages.sum() == dom.pages.sum() == host.pages.sum()
    assert (tld.groupby("crawl").domains.sum() == dom.groupby("crawl").size()).all()


def test_multicount_twin_invariant(spark):
    """pages >= urls everywhere (MultiCount[pages, urls] semantics,
    crawlstats.py:377-435)."""
    p = pages_df(spark, SF_SMOKE)
    for df in (C.host_counts(p), C.mimetype_counts(p), C.language_counts(p)):
        assert df.filter(F.col("pages") < F.col("urls")).count() == 0


def test_top_k_tie_break(spark):
    """Top-K must be ordered by (pages desc, urls desc, key desc) —
    the reference's heap tuple (crawlstats.py:994-1003)."""
    top = C.top_k(C.host_counts(pages_df(spark, SF_SMOKE)), "host", k=10)
    pdf = top.toPandas()
    for _, grp in pdf.groupby("crawl"):
        keys = [
            (-p, -u, tuple(-b for b in h.encode()))
            for p, u, h in zip(grp.pages, grp.urls, grp.host, strict=True)
        ]
        assert keys == sorted(keys)


def test_robots_routed_out_of_page_stats(spark):
    """Robots.txt fetches feed robotstxt_status only (crawlstats.py:553-558)."""
    p = pages_df(spark, SF_SMOKE)
    flagged = C.with_flags(p)
    robots_urls = flagged.filter(F.col("is_robotstxt")).select("url").distinct()
    leaked = (
        C.page_rows(p).join(robots_urls, "url", "inner").count()
    )
    assert leaked == 0  # robots urls never satisfy is_page (distinct paths)


def test_size_estimate_within_error(spark):
    p = pages_df(spark, SF_SMOKE)
    est = C.size_estimate(p).toPandas().set_index("crawl")
    exact = (
        C.page_rows(p)
        .groupBy("crawl")
        .agg(F.countDistinct("url").alias("urls"))
        .toPandas()
        .set_index("crawl")
    )
    rel_err = (est.urls_est - exact.urls).abs() / exact.urls
    assert (rel_err < 0.05).all()


def test_trailing_hll_union_close_to_exact(spark):
    """W4 sketch flavor: sliding last-N HLL-union estimates within 5% of the
    exact trailing distinct-URL counts (lgk=14 -> ~0.8% RSE), and exactly 0
    for under-full windows (the reference's 'nan' rows)."""
    from cc_crawl_statistics_spark.operators import timeseries as TS

    p = pages_df(spark, SF_SMOKE)
    sk = (
        TS.trailing_distinct_union(p, n=2)
        .toPandas()
        .set_index("crawl")
    )
    # exact trailing distinct over the same window, urls AND digests
    # (the reference slides every hll item type)
    rows = (
        C.page_rows(p)
        .select("crawl", "url", "digest")
        .distinct()
        .toPandas()
    )
    crawls = sorted(rows.crawl.unique())
    for i, c in enumerate(crawls):
        if i == 0:
            assert sk.loc[c]["urls_est_last_2"] == 0  # under-full window
            assert sk.loc[c]["digests_est_last_2"] == 0
            continue
        window = {c, crawls[i - 1]}
        in_w = rows[rows.crawl.isin(window)]
        for col, exact in (
            ("urls_est_last_2", in_w.url.nunique()),
            ("digests_est_last_2", in_w.digest.nunique()),
        ):
            est = sk.loc[c][col]
            assert abs(est - exact) <= max(0.05 * exact, 2), (c, col, est, exact)


def test_crawl_overlap_sketch_close_to_exact(spark):
    """W7 sketch flavor: HLL-derived pairwise intersection within 5% of the
    exact per-URL join, with identical pair coverage."""
    from cc_crawl_statistics_spark.operators import timeseries as TS

    p = pages_df(spark, SF_SMOKE)
    sk = TS.crawl_overlap_sketch(p).toPandas()
    ex = TS.crawl_overlap(p).toPandas()
    sk = sk.set_index(["c1", "c2"]).sort_index()
    ex = ex.set_index(["c1", "c2"]).sort_index()
    assert list(sk.index) == list(ex.index)
    for idx in ex.index:
        est, exact = sk.loc[idx].inter_est, ex.loc[idx].inter
        assert abs(est - exact) <= max(0.05 * exact, 2), (idx, est, exact)


def test_domain_coverage_bounded_plan_and_other_row(spark):
    """W8 scale shape (VERDICT r2 item 7): domain_coverage must never rank
    the unbounded domain dimension in an unpartitioned window, and the
    '<other>' tail row must close the curve at permille 1000."""
    from cc_crawl_statistics_spark.operators import timeseries as TS

    dc = C.domain_counts(pages_df(spark, SF_SMOKE))
    cov = TS.domain_coverage(dc, k=5)
    # plan audit: every Window node carries a partition spec. In the
    # executed-plan string an unpartitioned window prints only two bracket
    # groups (functions, ordering); partitioned ones print three.
    plan = cov._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *")
        if s.startswith("Window "):
            assert s.count("], [") >= 2, f"unpartitioned window: {s}"
    rows = cov.toPandas()
    totals = dc.groupBy("crawl").agg(F.sum("pages").alias("t")).toPandas()
    n_domains = dc.select("crawl", "domain").distinct().toPandas()
    for crawl, grp in rows.groupby("crawl"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        nd = (n_domains.crawl == crawl).sum()
        if nd > 5:  # tail exists -> one <other> row closing at 1000
            assert grp.iloc[-1]["domain"] == "<other>"
            assert grp.iloc[-1]["cum_pages_permille"] == 1000
            t = totals[totals.crawl == crawl].iloc[0]["t"]
            assert grp.iloc[-1]["cum_pages"] == t
        # covered prefix cum_pages strictly increasing
        cp = list(grp["cum_pages"])
        assert all(a < b for a, b in zip(cp, cp[1:]))


def test_spearman_drops_single_member_groups(spark):
    """A23 edge (ADVICE r2): a (crawl) group with one key row has no
    defined correlation (n(n²−1)=0) — it must be dropped, not NULL/error."""
    from cc_crawl_statistics_spark.operators import timeseries as TS

    df = spark.createDataFrame(
        [("c1", "com", 10, 8), ("c1", "org", 5, 5), ("c2", "com", 7, 7)],
        "crawl string, tld string, pages long, urls long",
    )
    out = TS.spearman_rank_x1000(df, "tld").toPandas()
    assert list(out.crawl) == ["c1"]  # c2 has n=1 -> dropped
    assert out.iloc[0]["spearman_x1000"] == 1000  # identical rank order


def test_host_churn_hand_computed_with_id_gap(spark):
    """Churn over crawls with a registration-id GAP (0, 5, 6): the dense
    crawl sequence must treat 0→5 as consecutive, and a host absent for
    one crawl is lost once and gained once on return."""
    from cc_crawl_statistics_spark.operators import timeseries as TS

    rows = []
    presence = {"h1": [0, 5, 6], "h2": [0, 6], "h3": [5]}
    for host, ids in presence.items():
        for cid in ids:
            rows.append(
                (
                    f"http://{host}/x",
                    host,
                    f"C{cid}",
                    cid,
                    200,
                    "seg/warc/p.warc.gz",
                )
            )
    pages = spark.createDataFrame(
        rows,
        "url string, host string, crawl string, crawl_id int, "
        "status int, warc_filename string",
    )
    got = {r.crawl: r for r in TS.host_churn(pages).collect()}
    assert (got["C0"].n_hosts, got["C0"].hosts_gained,
            got["C0"].hosts_retained, got["C0"].hosts_lost) == (2, 2, 0, 0)
    assert (got["C5"].n_hosts, got["C5"].hosts_gained,
            got["C5"].hosts_retained, got["C5"].hosts_lost) == (2, 1, 1, 1)
    assert (got["C6"].n_hosts, got["C6"].hosts_gained,
            got["C6"].hosts_retained, got["C6"].hosts_lost) == (2, 1, 1, 1)


def test_mime_matrix_null_safe_disagreement(spark):
    """A NULL detected type is a disagreement, not a dropped row: the
    mismatch filter and the agree flag must both be null-safe."""
    rows = [
        ("http://a/x", "C0", "text/html", "text/html", 200, "seg/warc/a.gz"),
        ("http://a/y", "C0", "text/html", None, 200, "seg/warc/a.gz"),
        ("http://a/z", "C0", None, None, 200, "seg/warc/a.gz"),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, crawl string, mime string, mime_detected string, "
        "status int, warc_filename string",
    )
    full = {
        (r.mimetype, r.mimetype_detected): r.agree
        for r in C.mime_agreement_matrix(pages).collect()
    }
    assert full[("text/html", "text/html")] is True
    assert full[("text/html", None)] is False  # not NULL
    assert full[(None, None)] is True  # both-missing rows agree
    mism = C.mime_agreement_matrix(pages, mismatch_only=True).collect()
    assert [(r.mimetype, r.mimetype_detected) for r in mism] == [
        ("text/html", None)
    ]


def test_concentration_stats_hand_computed(spark):
    """Exact Gini + top-decile share vs a brute-force rank-formula model,
    including tied-value blocks and the boundary block's partial clamp."""
    from cc_crawl_statistics_spark.operators.counts import (
        concentration_stats,
    )

    # crawl A: 12 hosts — ten with 1 page, one with 10, one with 100
    rows = []
    for h in range(10):
        rows.append((f"h{h}", "A"))
    rows += [("big", "A")] * 10 + [("huge", "A")] * 100
    # crawl B: perfectly equal — 4 hosts x 5 pages -> gini 0
    for h in range(4):
        rows += [(f"e{h}", "B")] * 5
    df = spark.createDataFrame(rows, "host string, crawl string")
    got = {r.crawl: r for r in concentration_stats(df).collect()}

    def model(xs):
        xs = sorted(xs)
        n, s = len(xs), sum(xs)
        t2 = 2 * sum((i + 1) * x for i, x in enumerate(xs))
        gini = (t2 - (n + 1) * s) * 1000 // (n * s)
        k = (n + 9) // 10
        top = sum(xs[n - k:]) * 1000 // s
        return n, s, gini, top

    a = model([1] * 10 + [10, 100])
    assert (got["A"].n_hosts, got["A"].total_pages,
            got["A"].gini_permille,
            got["A"].top_decile_share_permille) == a
    assert got["A"].top_decile_share_permille == 1000 * 110 // 120
    b = model([5, 5, 5, 5])
    assert (got["B"].gini_permille, got["B"].n_hosts) == (0, 4)
    assert got["B"].top_decile_share_permille == b[3]  # k=1 -> one host


def test_robust_host_outliers_hand_computed(spark):
    """MAD > 0 path: median 10, MAD 2 -> threshold |x-10| > 6; the
    x=100 burst flags, x=16 sits exactly at the boundary (6 = 3*2, not
    >) and stays; a second crawl with MAD=0 flags any deviation."""
    from cc_crawl_statistics_spark.operators.counts import (
        robust_host_outliers,
    )

    rows = []
    # crawl A counts: 8,8,10,10,12,12,16,100 -> med 10, |d|: 2,2,0,0,2,2,6,90
    # sorted d: 0,0,2,2,2,2,6,90 -> lower median (rank 4) = 2
    for h, cnt in [("a", 8), ("b", 8), ("c", 10), ("d", 10),
                   ("e", 12), ("f", 12), ("g", 16), ("burst", 100)]:
        rows += [(h, "A")] * cnt
    # crawl B: 5,5,5,7 -> med 5, d: 0,0,0,2 -> MAD 0 -> x=7 flags
    for h, cnt in [("p", 5), ("q", 5), ("r", 5), ("s", 7)]:
        rows += [(h, "B")] * cnt
    df = spark.createDataFrame(rows, "host string, crawl string")
    got = {(r.crawl, r.host): (r.x, r.med, r.mad)
           for r in robust_host_outliers(df, k_mad=3).collect()}
    assert got == {
        ("A", "burst"): (100, 10, 2),
        ("B", "s"): (7, 5, 0),
    }


def test_soft404_flags_and_rates(spark):
    from cc_crawl_statistics_spark.operators.textstats import (
        soft404_flags,
        soft404_host_rates,
    )

    rows = [
        ("h1", 200, "Welcome to our homepage"),
        ("h1", 200, "Sorry, PAGE NOT FOUND here"),       # case-insensitive
        ("h1", 404, "page not found"),                   # real 404: not soft
        ("h1", 200, "this article does not exist anymore"),
        ("h2", 200, "all good"),
        ("h2", 301, "page not found"),                   # redirect: not soft
    ]
    pages = spark.createDataFrame(rows, "host string, status int, text string")
    flags = {
        (r["host"], r["status"], r["text"]): r["is_soft404"]
        for r in soft404_flags(pages).collect()
    }
    assert sum(flags.values()) == 2
    assert flags[("h1", 404, "page not found")] is False
    got = {
        r["host"]: (r["n_200"], r["n_soft404"], r["soft404_permille"])
        for r in soft404_host_rates(pages).collect()
    }
    assert got == {"h1": (3, 2, 666), "h2": (1, 0, 0)}
