"""URL filter chain: per-rule semantics, precedence, frontier composition."""

from pyspark.sql import functions as F

from cc_crawl_statistics_spark.frontier.urlfilter import (
    accepted,
    url_filter,
)
from tests.conftest import spark  # noqa: F401  (fixture)


def _verdicts(spark, urls, **kw):  # noqa: F811
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r.url: r.verdict for r in url_filter(df, **kw).collect()}


def test_each_rule_fires(spark):  # noqa: F811
    got = _verdicts(
        spark,
        [
            "https://example.com/a.html",            # clean
            "ftp://example.com/a.html",              # scheme
            "javascript:void(0)",                    # scheme (no ://)
            "https://example.com/" + "a" * 2100,     # too_long
            "https://example.com" + "/x" * 25,       # trap
            "https://example.com/logo.PNG",          # ext, case-folded
            "https://example.com/pic.jpg?x=1",       # ext before query
            "https://example.com/p;JSESSIONID=abc=", # session, case-folded
            "https://example.com/p?phpsessid=1",     # session
        ],
    )
    assert got["https://example.com/a.html"] == "accept"
    assert got["ftp://example.com/a.html"] == "scheme"
    assert got["javascript:void(0)"] == "scheme"
    assert got["https://example.com/" + "a" * 2100] == "too_long"
    assert got["https://example.com" + "/x" * 25] == "too_many_segments"
    assert got["https://example.com/logo.PNG"] == "binary_extension"
    assert got["https://example.com/pic.jpg?x=1"] == "binary_extension"
    assert got["https://example.com/p;JSESSIONID=abc="] == "session_id"
    assert got["https://example.com/p?phpsessid=1"] == "session_id"


def test_precedence_first_match_wins(spark):  # noqa: F811
    # scheme beats length; length beats segments; segments beat extension
    long_ftp = "ftp://e.com/" + "a" * 2100
    long_trap = "https://e.com" + "/x" * 1200          # >2048 AND >20 segs
    trap_jpg = "https://e.com" + "/x" * 25 + "/a.jpg"  # trap AND extension
    got = _verdicts(spark, [long_ftp, long_trap, trap_jpg])
    assert got[long_ftp] == "scheme"
    assert got[long_trap] == "too_long"
    assert got[trap_jpg] == "too_many_segments"


def test_query_string_not_an_extension(spark):  # noqa: F811
    # .jpg inside the query string must NOT trigger the suffix rule
    got = _verdicts(spark, ["https://e.com/page.html?img=photo.jpg"])
    assert got["https://e.com/page.html?img=photo.jpg"] == "accept"


def test_null_url_is_rejected(spark):  # noqa: F811
    df = spark.createDataFrame([(None,)], "url string")
    assert url_filter(df).first().verdict == "scheme"


def test_parameter_overrides(spark):  # noqa: F811
    url = "https://e.com/a/b/c/d.html"
    assert _verdicts(spark, [url], max_segments=3)[url] == (
        "too_many_segments"
    )
    assert _verdicts(spark, [url], max_len=10)[url] == "too_long"


def test_randomized_urls_match_python_model(spark):  # noqa: F811
    """Seeded adversarial URL soup (multi-'://', uppercase extensions,
    '?' repeats, empty pieces) vs an independent Python model of the rule
    chain — one Spark job over the whole batch."""
    import random

    from cc_crawl_statistics_spark.frontier.urlfilter import (
        BLOCKED_EXTENSIONS,
        SESSION_PARAMS,
    )

    def model(u):
        u = u or ""
        scheme = u.split("://", 1)[0]
        if scheme not in ("http", "https"):
            return "scheme"
        if len(u) > 2048:
            return "too_long"
        if u.count("/") - 2 > 20:
            return "too_many_segments"
        base = u.split("#", 1)[0].split("?", 1)[0].lower()
        if any(base.endswith(e) for e in BLOCKED_EXTENSIONS):
            return "binary_extension"
        if any(p in u.lower() for p in SESSION_PARAMS):
            return "session_id"
        return "accept"

    rng = random.Random(20260819)
    schemes = ["http", "https", "ftp", "file", "HTTP", ""]
    hosts = ["e.com", "a.b.c.example.org", "xn--p1ai", ""]
    tails = [
        "", ".jpg", ".JPG", ".tar.gz", ".html", ".jpg?x=1", "?a=.png",
        ".jpg#gallery", ".png#", "#.jpg", ".html#frag",
        "?phpsessid=1", ";jsessionid=X", "?x=1&SESSIONID=2", "://twice",
        "/x" * 21, "/x" * 20, "a" * 2049, "a" * 2000, "?" * 3,
    ]
    urls = []
    for _ in range(300):
        u = (
            rng.choice(schemes)
            + ("://" if rng.random() < 0.9 else ":")
            + rng.choice(hosts)
            + "/"
            + "/".join("p%d" % rng.randrange(9) for _ in range(rng.randrange(4)))
            + rng.choice(tails)
        )
        urls.append(u)
    urls = list(dict.fromkeys(urls))
    got = _verdicts(spark, urls)
    expected = {u: model(u) for u in urls}
    assert got == expected


def test_accepted_composes_on_discovery_shape(spark):  # noqa: F811
    """accepted() drops rejects and keeps the frontier row shape — the
    admission seam after any discover() step in scheduler.run_round."""
    rows = [
        ("https://e.com/a.html", "e.com", 1, 50, "pending"),
        ("https://e.com/logo.png", "e.com", 1, 50, "pending"),
        ("ftp://e.com/b.html", "e.com", 2, 10, "pending"),
    ]
    disc = spark.createDataFrame(
        rows, "url string, host string, depth int, score int, state string"
    )
    out = accepted(disc)
    assert out.columns == ["url", "host", "depth", "score", "state"]
    assert [r.url for r in out.collect()] == ["https://e.com/a.html"]


def test_host_blocklist_gate(spark):  # noqa: F811
    """host_quality_rollup → apply_host_blocklist closes the quality
    feedback loop: dup-heavy hosts get blocked and their discoveries are
    anti-joined out; the broadcast hint must survive into the plan."""
    from cc_crawl_statistics_spark.frontier.urlfilter import (
        apply_host_blocklist,
    )
    from cc_crawl_statistics_spark.operators.textstats import (
        host_quality_rollup,
    )

    good = "x" * 4 + " "  # 5-char words, passes the gate when repeated
    pages = spark.createDataFrame(
        # mirror.com serves one digest 10 times; fresh.org all-distinct
        [("mirror.com", "sha1:0", good * 20)] * 10
        + [(f"fresh.org", f"sha1:{i}", good * 20) for i in range(1, 11)],
        "host string, digest string, text string",
    )
    roll = host_quality_rollup(pages, min_pages=8, max_dup_permille=600)
    got = {r.host: r for r in roll.collect()}
    assert got["mirror.com"].dup_permille == 900
    assert got["mirror.com"].blocked == 1
    assert got["fresh.org"].dup_permille == 0
    assert got["fresh.org"].blocked == 0

    disc = spark.createDataFrame(
        [("https://mirror.com/p", "mirror.com"), ("https://fresh.org/p", "fresh.org")],
        "url string, host string",
    )
    kept = apply_host_blocklist(
        disc, roll.filter(F.col("blocked") == 1)
    )
    assert [r.host for r in kept.collect()] == ["fresh.org"]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_mine_url_templates_hand_planted(spark):
    """Trap rule: >=2 placeholders AND >=min_urls AND >=share of the
    host's distinct URLs. A dominant one-placeholder listing never
    flags; a dominant multi-placeholder generator does; the same
    generator below the share floor on a bigger host does not."""
    from cc_crawl_statistics_spark.frontier.urlfilter import (
        mine_url_templates,
    )

    rows = (
        # trap.com: 12 calendar urls (3 placeholders) + 2 plain pages
        [("trap.com", f"https://trap.com/cal/2024/{m}/{d}")
         for m in range(1, 4) for d in range(1, 5)]
        + [("trap.com", "https://trap.com/about"),
           ("trap.com", "https://trap.com/contact")]
        # list.com: 12 one-placeholder listing urls — never a trap
        + [("list.com", f"https://list.com/page/{i}.html")
         for i in range(12)]
        # big.com: same 12 calendar urls but diluted below 50% share
        + [("big.com", f"https://big.com/cal/2024/{m}/{d}")
         for m in range(1, 4) for d in range(1, 5)]
        + [("big.com", f"https://big.com/a{i}/b") for i in range(20)]
        # duplicate url rows must collapse before counting
        + [("trap.com", "https://trap.com/cal/2024/1/1")]
    )
    out = mine_url_templates(
        spark.createDataFrame(rows, "host string, url string"),
        min_urls=10,
        share_permille=500,
    )
    got = {(r.host, r.template): r for r in out.collect()}
    cal = got[("trap.com", "/cal/<n>/<n>/<n>")]
    assert (cal.n_urls, cal.host_urls, cal.n_placeholders, cal.trap) == (
        12, 14, 3, True)
    lst = got[("list.com", "/page/<n>.html")]
    assert (lst.n_urls, lst.n_placeholders, lst.trap) == (12, 1, False)
    big = got[("big.com", "/cal/<n>/<n>/<n>")]
    assert (big.n_urls, big.host_urls, big.trap) == (12, 32, False)
    # diluting urls /a<n>/b: one placeholder, not a trap either
    assert not got[("big.com", "/a<n>/b")].trap


def test_url_templates_fixture_discriminates(spark):
    """On the trap-injected fixture population, every flagged template is
    the 3-placeholder /cal/ generator and exactly the doc_id%3==0 host
    cohort flags (40 of 120 hosts)."""
    from cc_crawl_statistics_spark.plans.pipeline_queries import (
        q_url_templates,
    )
    from tests.conftest import SF_SMOKE

    out = q_url_templates(spark, SF_SMOKE).collect()
    traps = [r for r in out if r.trap]
    assert traps and all(r.template == "/cal/<n>/<n>/<n>" for r in traps)
    assert len({r.host for r in traps}) == 40
    assert all(not r.trap for r in out if r.n_placeholders < 2)


def test_normalize_url_rfc3986_cases(spark):
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.functions.urlkit import normalize_url

    cases = [
        ("HTTP://Host.Example:80//a/./b/../c.html#frag",
         "http://host.example/a/c.html"),
        ("https://x.example:443/a//b/././c/../../d.html",
         "https://x.example/a/d.html"),
        ("http://y.example/a/b/c", "http://y.example/a/b/c"),
        # non-default port survives; dot-segments never cross the
        # authority; '..' above root clamps
        ("http://y.example:8080/a/../../b", "http://y.example:8080/b"),
        ("https://z.example/x/../..", "https://z.example/"),
        ("http://a.example/p/q/r/../../../s", "http://a.example/s"),
        # dotted segments that are NOT '..' resolve like any segment
        ("http://a.example/..a/../b", "http://a.example/b"),
        ("http://a.example/.h/../b", "http://a.example/b"),
        # authority-only URL and trailing /. flavors
        ("http://a.example", "http://a.example"),
        ("http://a.example/x/.", "http://a.example/x/"),
        # the QUERY is opaque: no slash/dot/case rules reach past '?'
        ("http://h.example/p?next=/a/../b", "http://h.example/p?next=/a/../b"),
        ("http://h.example/search?q=//foo", "http://h.example/search?q=//foo"),
        ("http://Host.example?Token=AbC", "http://host.example?Token=AbC"),
        # default port falls before '?'/'#' and after fragment strip
        ("http://Host.example:80#frag", "http://host.example"),
        ("http://Host.example:80?x=1", "http://host.example?x=1"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "url string")
    got = {
        r["url"]: r["n"]
        for r in df.select(
            "url", normalize_url(F.col("url")).alias("n")
        ).collect()
    }
    for raw, want in cases:
        assert got[raw] == want, raw


def test_normalize_url_idempotent_on_corpus(spark):
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.functions.urlkit import normalize_url
    from cc_crawl_statistics_spark.sources.tables import pages_df
    from cc_crawl_statistics_spark.synth import messy_url_sql
    from tests.conftest import SF_SMOKE

    base = pages_df(spark, SF_SMOKE).select(
        "doc_id", "url", "scheme", "host"
    ).distinct()
    m = base.withColumn("messy", F.expr(messy_url_sql()))
    once = m.withColumn("n1", normalize_url(F.col("messy")))
    twice = once.withColumn("n2", normalize_url(F.col("n1")))
    assert twice.filter(F.col("n1") != F.col("n2")).count() == 0


def test_percent_encoding_normalization(spark):
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.functions.urlkit import (
        normalize_percent_encoding,
        normalize_url,
    )

    cases = [
        # unreserved escapes decode; reserved stay (uppercased)
        ("http://h.example/%7Euser/%41b%2fc", "http://h.example/~user/Ab%2Fc"),
        ("http://h.example/a%20b", "http://h.example/a%20b"),
        # invalid escapes untouched
        ("http://h.example/100%", "http://h.example/100%"),
        ("http://h.example/%zz", "http://h.example/%zz"),
        ("http://h.example/plain", "http://h.example/plain"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "url string")
    pe = normalize_percent_encoding()
    got = {
        r["url"]: r["n"] for r in df.select("url", pe("url").alias("n")).collect()
    }
    for raw, want in cases:
        assert got[raw] == want, raw
    # composes with the codegen chain
    full = df.select(pe(normalize_url(F.col("url"))).alias("n")).collect()
    assert all(r["n"] for r in full)
