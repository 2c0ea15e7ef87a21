"""robots.txt parser tests (frontier/robots.py).

Three independent correctness anchors:
  1. parity with CPython's stdlib ``urllib.robotparser`` on a battery of
     bodies restricted to the semantics both implementations share
     (prefix rules, longest-first rule order, at most one specific group);
  2. pinned RFC 9309 cases for the semantics urllib does NOT implement
     (longest-match regardless of order, Allow wins ties, ``*`` wildcards,
     ``$`` anchor, group merging);
  3. the parsed politeness ledger is bit-identical to the legacy closed
     form the pure-Python frontier model pins (scheduler.host_ledger_formula),
     so the frontier's bit-for-bit guarantees rest on a real parse.
"""

from __future__ import annotations

import urllib.robotparser

import pytest
from pyspark.sql import functions as F

from cc_crawl_statistics_spark.frontier import robots as R
from cc_crawl_statistics_spark.frontier import scheduler as S


def _decisions(spark, cases, agent="ccbot"):
    """cases: list of (body, [paths]) → {(case_idx, path): decision}."""
    robots = spark.createDataFrame(
        [(f"h{i}", body) for i, (body, _) in enumerate(cases)],
        ["host", "robots_txt"],
    )
    urls = spark.createDataFrame(
        [(f"h{i}", p) for i, (_, paths) in enumerate(cases) for p in paths],
        ["host", "path"],
    )
    rules = R.robots_rules(R.parse_robots(robots), agent)
    rows = R.robots_decision(urls, rules).collect()
    return {(int(r["host"][1:]), r["path"]): r["decision"] for r in rows}


# --- 1. stdlib parity ------------------------------------------------------

# bodies where urllib's first-match + first-applicable-group semantics agree
# with RFC 9309 (rules longest-first, one specific group max, no wildcards)
_PARITY_BODIES = [
    "User-agent: *\nDisallow: /a/b\nDisallow: /c\n",
    "User-agent: *\nAllow: /a/b\nDisallow: /a\n",
    "User-agent: ccbot\nDisallow: /private\nAllow: /\n",
    "User-agent: ccbot\nDisallow: /a/b/c\nAllow: /a/b\nDisallow: /a\n",
    "User-agent: otherbot\nDisallow: /\n\nUser-agent: *\nDisallow: /tmp\n",
    "User-agent: ccbot\nDisallow:\n",  # empty Disallow = allow all
    "# top comment\nUser-agent: *  # trailing\nDisallow: /x/y\n",
    "User-agent: CCBot\nDisallow: /UPPER\n",  # field/agent case-insensitive
    "User-agent: otherbot\nUser-agent: ccbot\nDisallow: /multi\n",
    "Disallow: /ignored\n\nUser-agent: *\nDisallow: /real\n",  # pre-group
]
_PARITY_PATHS = ["/", "/a", "/a/b", "/a/b/c", "/c", "/tmp", "/private",
                 "/x/y", "/UPPER", "/multi", "/ignored", "/real", "/zzz"]


def test_stdlib_parity(spark):
    cases = [(b, _PARITY_PATHS) for b in _PARITY_BODIES]
    got = _decisions(spark, cases)
    for i, body in enumerate(_PARITY_BODIES):
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        for p in _PARITY_PATHS:
            want = "allow" if rp.can_fetch("ccbot", f"http://h{i}{p}") else "disallow"
            assert got[(i, p)] == want, (i, p, body)


def test_stdlib_crawl_delay_parity(spark):
    bodies = [
        "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n",
        "User-agent: ccbot\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 30\n",
    ]
    robots = spark.createDataFrame(
        [(f"h{i}", b) for i, b in enumerate(bodies)], ["host", "robots_txt"]
    )
    got = {
        r["host"]: r["crawl_delay"]
        for r in R.crawl_delays(R.parse_robots(robots), "ccbot").collect()
    }
    for i, body in enumerate(bodies):
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        assert got[f"h{i}"] == float(rp.crawl_delay("ccbot")), body


# --- 2. RFC 9309 semantics urllib lacks ------------------------------------


def test_longest_match_regardless_of_order(spark):
    # shortest rule first: urllib would stop at /a (first match);
    # RFC longest-match must pick /a/b
    body = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    got = _decisions(spark, [(body, ["/a/x", "/a/b/x"])])
    assert got[(0, "/a/x")] == "disallow"
    assert got[(0, "/a/b/x")] == "allow"


def test_allow_wins_length_tie(spark):
    body = "User-agent: *\nDisallow: /dir/\nAllow: /dir2\n"
    # /dir2/x matches Allow '/dir2' (5) only; craft a true tie too:
    tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    got = _decisions(spark, [(body, ["/dir/x", "/dir2/x"]), (tie, ["/page/1"])])
    assert got[(0, "/dir/x")] == "disallow"
    assert got[(0, "/dir2/x")] == "allow"
    assert got[(1, "/page/1")] == "allow"


def test_wildcard_and_anchor(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /tmp*/x\n"
        "Allow: /a*b.pdf$\n"
    )
    got = _decisions(
        spark,
        [(body, ["/doc.pdf", "/doc.pdf.html", "/tmp123/x", "/axxb.pdf", "/q"])],
    )
    assert got[(0, "/doc.pdf")] == "disallow"
    assert got[(0, "/doc.pdf.html")] == "allow"  # $ anchors the end
    assert got[(0, "/tmp123/x")] == "disallow"
    assert got[(0, "/axxb.pdf")] == "allow"  # longer allow wins
    assert got[(0, "/q")] == "allow"


def test_groups_merged_at_same_specificity(spark):
    # two separate ccbot groups: RFC 9309 §2.2.1 — rules are combined
    body = (
        "User-agent: ccbot\nDisallow: /a\n\n"
        "User-agent: ccbot\nDisallow: /b\n"
    )
    got = _decisions(spark, [(body, ["/a/x", "/b/x", "/c"])])
    assert got[(0, "/a/x")] == "disallow"
    assert got[(0, "/b/x")] == "disallow"
    assert got[(0, "/c")] == "allow"


def test_most_specific_agent_group_wins(spark):
    # 'cc' and 'ccbot' both prefix-match; only the longer group applies
    body = (
        "User-agent: cc\nDisallow: /short\n\n"
        "User-agent: ccbot\nDisallow: /long\n\n"
        "User-agent: *\nDisallow: /star\n"
    )
    got = _decisions(spark, [(body, ["/short", "/long", "/star"])])
    assert got[(0, "/short")] == "allow"
    assert got[(0, "/long")] == "disallow"
    assert got[(0, "/star")] == "allow"


def test_unknown_directives_ignored_and_crlf(spark):
    body = (
        "User-agent: *\r\nSitemap: http://h/x.xml\r\n"
        "Noindex: /n\r\nDisallow: /d\r\n"
    )
    got = _decisions(spark, [(body, ["/d/x", "/n"])])
    assert got[(0, "/d/x")] == "disallow"
    assert got[(0, "/n")] == "allow"


def test_fetch_status_gate(spark):
    robots = spark.createDataFrame(
        [
            ("ok", 200, "User-agent: *\nCrawl-delay: 30\n"),
            ("forbidden", 403, ""),
            ("unauthorized", 401, ""),
            ("missing", 404, ""),
            ("flaky", 503, ""),
        ],
        ["host", "fetch_status", "robots_txt"],
    )
    got = {
        r["host"]: (r["robots_status"], r["max_per_round"])
        for r in R.robots_ledger(robots, round_seconds=60, default_budget=3).collect()
    }
    assert got["ok"] == (200, 2)  # floor(60/30)
    assert got["forbidden"] == (403, 3)
    assert got["unauthorized"] == (403, 3)
    assert got["missing"] == (200, 3)  # 404 → allow-all, default budget
    assert got["flaky"] == (403, 3)  # 5xx → conservative disallow


def test_non_2xx_bodies_never_impose_rules_or_delays(spark):
    """A 404 error page whose HTML happens to contain directive-looking
    lines (common in CDN error templates) must not contribute Disallow
    rules or Crawl-delay budgets — only 2xx bodies parse."""
    trap = "User-agent: *\nDisallow: /\nCrawl-delay: 1\n"
    robots = spark.createDataFrame(
        [("gone", 404, trap), ("down", 503, trap), ("ok", 200, trap)],
        ["host", "fetch_status", "robots_txt"],
    )
    led = {
        r["host"]: (r["robots_status"], r["max_per_round"])
        for r in R.robots_ledger(
            robots, round_seconds=60, default_budget=5
        ).collect()
    }
    assert led["gone"] == (200, 5)  # allow-all, default budget (not 60)
    assert led["down"] == (403, 5)  # gate blocks; body ignored
    assert led["ok"] == (200, 60)  # real robots: floor(60/1)
    rules = R.robots_rules(R.parse_robots(R.parsable_bodies(robots)))
    urls = spark.createDataFrame(
        [("gone", "/x"), ("ok", "/x")], ["host", "path"]
    )
    dec = {
        r["host"]: r["decision"]
        for r in R.robots_decision(urls, rules).collect()
    }
    assert dec["gone"] == "allow"  # error page imposed nothing
    assert dec["ok"] == "disallow"


def test_budget_clamped_to_one(spark):
    robots = spark.createDataFrame(
        [("slow", 200, "User-agent: *\nCrawl-delay: 999\n")],
        ["host", "fetch_status", "robots_txt"],
    )
    row = R.robots_ledger(robots, round_seconds=60).first()
    assert row["max_per_round"] == 1


# --- 3. ledger parity with the frontier model's closed form ----------------


def test_parsed_ledger_matches_formula(spark):
    hosts = [
        (f"{sub}site{k}.{tld}",)
        for k in range(0, 130, 3)
        for sub in ("www.", "", "cdn.")
        for tld in ("com", "jp")
    ]
    uni = spark.createDataFrame(hosts, ["host"])
    parsed = S.host_ledger(uni)
    formula = S.host_ledger_formula(uni)
    assert parsed.dtypes == formula.dtypes  # names+types (nullability aside)
    assert parsed.exceptAll(formula).count() == 0
    assert formula.exceptAll(parsed).count() == 0


def test_decision_join_broadcasts_rules(spark):
    """Plan shape: the corpus-sized URL relation must not shuffle for the
    rule match — the host-keyed rule dimension is broadcast."""
    robots = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /a\n")], ["host", "robots_txt"]
    )
    rules = R.robots_rules(R.parse_robots(robots))
    urls = spark.createDataFrame([("h", "/a"), ("h", "/b")], ["host", "path"])
    plan = R.robots_decision(urls, rules)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_robots_policy_churn_hand_checked(spark):
    """k%3==1 host: the epoch rule rotates from digit k to digit k+1, so
    exactly the '/page/<k>…' paths unblock and the '/page/<k+1>…' paths
    become newly blocked; budgets shift by the closed form; specific-group
    hosts (k%3==0/2) see no per-path churn; 403 hosts report zero flips."""
    from pyspark.sql import functions as F

    from cc_crawl_statistics_spark.frontier.robots import (
        robots_policy_churn,
        synth_robots,
    )

    rows = []
    # site1 -> k%3==1 (base group governs), site3 -> CCBot group,
    # site7 -> 403-blocked, site5 -> wild group
    for k in (1, 3, 5, 7):
        for d in (0, 1, 2, 11, 21, 19):
            rows.append(
                (f"https://www.site{k}.com/page/{d}.html",
                 f"www.site{k}.com")
            )
    pages = spark.createDataFrame(rows, ["url", "host"])
    out = {r.host: r for r in robots_policy_churn(pages, 0, 1).collect()}

    h1 = out["www.site1.com"]
    # epoch 0 digit = 1 (paths 1,11,19? no: prefix '/page/1' matches 1,11,19... careful: 19 starts '/page/1'): {1,11,19}
    # epoch 1 digit = 2: {2,21}
    assert h1.n_paths == 6
    assert h1.n_unblocked == 3      # 1.html, 11.html, 19.html
    assert h1.n_newly_blocked == 2  # 2.html, 21.html
    assert h1.budget_a == 1 + (1 + 0) % 4 and h1.budget_b == 1 + (1 + 1) % 4
    assert bool(h1.budget_changed)

    h3 = out["www.site3.com"]  # CCBot group selected: epoch rule inert
    assert h3.n_newly_blocked == 0 and h3.n_unblocked == 0

    h5 = out["www.site5.com"]  # wild group selected: epoch rule inert
    assert h5.n_newly_blocked == 0 and h5.n_unblocked == 0

    h7 = out["www.site7.com"]  # 403: gated upstream, budgets default
    assert h7.robots_status == 403
    assert h7.n_newly_blocked == 0 and h7.n_unblocked == 0
    assert h7.budget_a == 1 and h7.budget_b == 1

    # epoch=None stays the pinned legacy body
    legacy = synth_robots(pages.select("host").distinct())
    e0 = synth_robots(pages.select("host").distinct(), epoch=0)
    n_diff = (
        legacy.alias("l")
        .join(e0.alias("e"), "host")
        .filter(F.col("l.robots_txt") != F.col("e.robots_txt"))
        .count()
    )
    assert n_diff > 0  # epoch 0 adds the rotating rule; legacy untouched


def test_robots_cache_status_classes(spark):
    from cc_crawl_statistics_spark.frontier.robots import (
        robots_cache_status,
    )

    rows = [
        # hostA: robots captured recently -> fresh
        ("hostA", "x/robotstxt/p.warc.gz", 1_000_000),
        ("hostA", "x/warc/p.warc.gz", 1_000_500),
        # hostB: robots captured long ago -> stale
        ("hostB", "x/robotstxt/p.warc.gz", 100),
        ("hostB", "x/warc/p.warc.gz", 1_000_400),
        # hostC: never captured robots -> missing
        ("hostC", "x/warc/p.warc.gz", 1_000_600),
    ]
    pages = spark.createDataFrame(
        rows, "host string, warc_filename string, fetch_ts long"
    )
    got = {
        r["host"]: (r["status"], r["due"], r["n_robots_captures"])
        for r in robots_cache_status(pages, ttl_s=86_400).collect()
    }
    assert got == {
        "hostA": ("fresh", False, 1),
        "hostB": ("stale", True, 1),
        "hostC": ("missing", True, 0),
    }
