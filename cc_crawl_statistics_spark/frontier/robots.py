"""robots.txt parser + politeness-ledger builder (north_star: "per-host
politeness ledger (robots.txt cache + crawl-delay budget)").

The reference repo consumes robots.txt only as a fetch *category*
(crawlstats.py routes robots.txt captures out of the page statistics); a
crawl frontier additionally needs the robots *content*: which paths the
crawler's user-agent may fetch, and how fast (Crawl-delay). This module
parses raw robots.txt bodies into rule tables and derives the scheduler's
host_ledger from them, entirely with vectorized Spark SQL expressions —
no per-row Python anywhere (input_hint: "vectorized pandas/Arrow UDFs
(no per-row Python) throughout"; here even Arrow is unnecessary).

Semantics: RFC 9309 (Robots Exclusion Protocol).
  - groups = consecutive ``User-agent`` lines followed by rules; rules
    before the first User-agent line are ignored;
  - group selection: longest user-agent token that is a prefix of the
    crawler's product token; ``*`` matches with lowest specificity; ALL
    groups tied at the winning specificity are merged (RFC 9309 §2.2.1);
  - rule matching: longest-match wins, measured in octets of the rule
    path; ``Allow`` wins length ties (§2.2.2); ``*`` is a wildcard and a
    trailing ``$`` anchors the end; empty ``Disallow:`` matches nothing;
  - no matching rule → allowed; no matching group → allowed;
  - fetch-status of robots.txt itself: 401/403 → full disallow
    ("blocked" host, the reference model's robots gate), other 4xx →
    allow-all (missing file), 5xx → full disallow (conservative:
    unreachable robots), 2xx → parse the body;
  - ``Crawl-delay`` (de-facto standard, not in RFC 9309) is read from the
    selected group; the ledger budget is floor(round_seconds / delay),
    clamped to ≥ 1.

Scale design: a robots body is ≤ ~500 KB (RFC 9309 §2.5 allows crawlers
to cap there) and there is one per host, so everything here is
host-dimension work (≤ ~10^8 rows), 3–5 orders of magnitude smaller than
the frontier. The only per-line window runs partitioned BY HOST (bodies
explode to ≤ ~10^4 lines each — bounded partitions, no skew). Rule→URL
matching joins the corpus-sized URL relation against the host-keyed rule
dimension: rules-side broadcast when it fits, else a plain equi-join on
host with AQE — the URL side never shuffles for broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_AGENT = "ccbot"

# directive lines we understand; everything else is ignored (RFC 9309 §2.2.4
# "parsers MUST ignore unknown directives")
_FIELDS = ("user-agent", "allow", "disallow", "crawl-delay")


def parsable_bodies(
    robots: DataFrame, status_col: str = "fetch_status"
) -> DataFrame:
    """Rows whose robots.txt body may impose rules: only 2xx fetches parse.
    A 4xx error page or a 5xx body must never contribute Disallow rules or
    Crawl-delay budgets (a CDN error template can contain lines that look
    like directives); the gate semantics for those statuses are carried by
    :func:`robots_ledger`'s robots_status alone."""
    s = F.col(status_col)
    return robots.filter((s >= 200) & (s < 300))


def parse_robots(robots: DataFrame, body_col: str = "robots_txt") -> DataFrame:
    """Explode robots.txt bodies into directive rows.

    Input:  (host, <body_col>) — one row per host.
    Output: (host, pos, field, value, group_id) — field lowercased, comments
    and blank lines dropped, group_id ≥ 1 for directives inside a
    user-agent group (0 = before any group → ignored by rule selection).
    """
    lines = robots.select(
        "host",
        F.posexplode(F.split(F.col(body_col), "\r?\n")).alias("pos", "raw"),
    )
    parsed = (
        lines.select(
            "host",
            "pos",
            F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
        )
        .filter(F.col("line") != "")
        .select(
            "host",
            "pos",
            F.lower(
                F.regexp_extract("line", r"^([A-Za-z][A-Za-z-]*)\s*:", 1)
            ).alias("field"),
            F.trim(F.regexp_extract("line", r"^[A-Za-z][A-Za-z-]*\s*:(.*)$", 1)).alias(
                "value"
            ),
        )
        .filter(F.col("field").isin(*_FIELDS))
    )
    # group boundary: a user-agent line whose previous directive is not
    # user-agent (consecutive UA lines share one group, RFC 9309 §2.2.1)
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("field") == "user-agent"
    prev = F.lag("field").over(w)
    starts = is_ua & (prev.isNull() | (prev != F.lit("user-agent")))
    return parsed.withColumn("group_id", F.sum(starts.cast("int")).over(w))


def sitemap_directives(robots: DataFrame, body_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap_url) rows from ``Sitemap:`` lines — RFC 9309 §2.3 /
    sitemaps.org's cross-group field: position-independent (valid before
    any user-agent group), case-insensitive, value must be an absolute
    URL (relative values are ignored), multiple directives allowed.
    Host-dimension work like the rest of the parser."""
    lines = robots.select(
        "host",
        F.explode(F.split(F.col(body_col), "\r?\n")).alias("raw"),
    )
    return (
        lines.select(
            "host",
            F.trim(
                F.regexp_extract(
                    F.regexp_replace("raw", "#.*$", ""),
                    r"(?i)^\s*sitemap\s*:\s*(.*?)\s*$",
                    1,
                )
            ).alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url").rlike("(?i)^https?://"))
        .distinct()
    )


def _selected_groups(directives: DataFrame, agent: str) -> DataFrame:
    """(host, group_id) of every group the crawler's agent selects —
    the group(s) whose user-agent token matches with the greatest
    specificity (token length; '*' = 0)."""
    agent = agent.lower()
    agents = directives.filter(F.col("field") == "user-agent").select(
        "host", "group_id", F.lower("value").alias("ua")
    )
    matched = agents.select(
        "host",
        "group_id",
        F.when(F.col("ua") == "*", F.lit(0))
        .when(F.lit(agent).startswith(F.col("ua")), F.length("ua"))
        .alias("spec"),
    ).filter(F.col("spec").isNotNull())
    best = matched.groupBy("host").agg(F.max("spec").alias("best_spec"))
    return (
        matched.join(best, "host")
        .filter(F.col("spec") == F.col("best_spec"))
        .select("host", "group_id")
        .distinct()
    )


def _path_regex(path: F.Column) -> F.Column:
    """Translate a robots rule path to an anchored Java regex: escape
    metacharacters, ``*`` → ``.*``, trailing ``$`` stays an end anchor."""
    ends_anchor = path.endswith("$")
    body = F.when(ends_anchor, path.substr(F.lit(1), F.length(path) - 1)).otherwise(
        path
    )
    esc = F.regexp_replace(body, r"([.^+?(){}\[\]|\\$])", r"\\$1")
    esc = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), esc, F.when(ends_anchor, F.lit("$")).otherwise(F.lit(""))
    )


def robots_rules(directives: DataFrame, agent: str = DEFAULT_AGENT) -> DataFrame:
    """Allow/Disallow rules of the selected group(s) per host:
    (host, rule, rule_path, prec, rx) — prec = octet length of the rule
    path (longest-match precedence), rx = anchored regex for matching."""
    chosen = _selected_groups(directives, agent)
    rules = (
        directives.join(chosen, ["host", "group_id"])
        .filter(F.col("field").isin("allow", "disallow"))
        .filter(F.col("value") != "")  # empty Disallow: matches nothing
        .select(
            "host",
            F.col("field").alias("rule"),
            F.col("value").alias("rule_path"),
            F.length("value").alias("prec"),
        )
    )
    return rules.withColumn("rx", _path_regex(F.col("rule_path")))


def crawl_delays(directives: DataFrame, agent: str = DEFAULT_AGENT) -> DataFrame:
    """(host, crawl_delay double) from the selected group(s); hosts whose
    selected groups carry no Crawl-delay are absent."""
    chosen = _selected_groups(directives, agent)
    return (
        directives.join(chosen, ["host", "group_id"])
        .filter(F.col("field") == "crawl-delay")
        .select("host", F.col("value").cast("double").alias("crawl_delay"))
        .filter(F.col("crawl_delay").isNotNull())
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )


def robots_decision(
    urls: DataFrame,
    rules: DataFrame,
    path_col: str = "path",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Per-URL allow/disallow decision: join URLs (host, path) to the host's
    rules, longest-match wins, Allow wins ties, no match → allow.

    Output: urls' columns + ``decision`` ('allow' | 'disallow').

    The rules relation is a host dimension (few rules per host); broadcast
    it when it fits (default), else equi-join on host — the URL relation is
    never broadcast and only shuffles in the non-broadcast case.
    """
    r = F.broadcast(rules) if broadcast_rules else rules
    hits = (
        urls.join(r, "host", "left")
        .withColumn(
            "_hit",
            F.when(
                F.col("rx").isNotNull() & F.expr(f"{path_col} rlike rx"), True
            ).otherwise(False),
        )
        # (prec, allow-wins-tie) ordering key; non-matching rows rank below
        # every hit so max_by falls through to the allow default
        .withColumn(
            "_key",
            F.when(
                F.col("_hit"),
                F.col("prec") * 2 + F.when(F.col("rule") == "allow", 1).otherwise(0),
            ).otherwise(F.lit(-1)),
        )
    )
    return (
        hits.groupBy(*urls.columns)
        .agg(F.max_by("rule", "_key").alias("_best"), F.max("_key").alias("_bk"))
        .withColumn(
            "decision",
            F.when(F.col("_bk") < 0, "allow").otherwise(
                F.when(F.col("_best") == "disallow", "disallow").otherwise("allow")
            ),
        )
        .drop("_best", "_bk")
    )


def robots_ledger(
    robots: DataFrame,
    agent: str = DEFAULT_AGENT,
    round_seconds: int = 60,
    default_budget: int = 1,
    status_col: str = "fetch_status",
) -> DataFrame:
    """Derive the scheduler's host_ledger from fetched robots.txt:
    (host, robots_status, max_per_round).

    robots_status is the politeness-gate verdict: 403 = fully blocked
    (robots fetch 401/403 or 5xx), 200 = crawlable (parsed rules apply at
    URL level via :func:`robots_decision`). max_per_round =
    floor(round_seconds / Crawl-delay), ≥ 1; hosts without a Crawl-delay
    get ``default_budget``.

    Only 2xx bodies are parsed for Crawl-delay (parsable_bodies): a 404
    host's HTML error page must not impose a budget — the module contract's
    'other 4xx → allow-all (missing robots.txt)' applies to the body
    content, not just the gate status.
    """
    status = F.col(status_col)
    gate = (
        F.when(status.isin(401, 403), F.lit(403))
        .when(status >= 500, F.lit(403))
        .otherwise(F.lit(200))
        .alias("robots_status")
    )
    delays = crawl_delays(
        parse_robots(parsable_bodies(robots, status_col)), agent
    )
    return (
        robots.select("host", gate)
        .join(delays, "host", "left")
        .select(
            "host",
            "robots_status",
            F.when(
                F.col("crawl_delay").isNotNull(),
                F.greatest(
                    F.lit(1),
                    F.floor(F.lit(float(round_seconds)) / F.col("crawl_delay")),
                ).cast("int"),
            )
            .otherwise(F.lit(default_budget))
            .alias("max_per_round"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic robots synthesis (FIXTURES.md §5): the sandbox stand-in for
# the robots.txt cache a production crawler maintains. Bodies are derived
# from the host's site_id so every parsed value has a closed form the
# DuckDB oracle can recompute without parsing:
#   - fetch_status: 403 when site_id % 12 == 7 (blocked hosts), else 200;
#   - every group carries Crawl-delay 60/(1+site_id%4) seconds, so with
#     round_seconds=60 the ledger budget is exactly 1 + site_id % 4 —
#     bit-identical to the legacy formula ledger the frontier model pins;
#   - site_id % 3 == 0: a CCBot-specific group (Disallow: /page/,
#     Allow: /page/1 — longest-match exercises Allow-over-Disallow);
#   - site_id % 3 == 2: a two-agent group (ccbot + examplebot) with a
#     wildcard rule (Disallow: /*9.html$);
#   - site_id % 3 == 1: only the * group (Disallow: /private/ — matches
#     none of the synthetic /page/ paths).
# ---------------------------------------------------------------------------


def synth_robots(hosts: DataFrame, epoch: int | None = None) -> DataFrame:
    """(host) → (host, fetch_status, robots_txt), deterministic.

    ``epoch=None`` (default) is the pinned legacy body every frontier
    bit-for-bit test depends on. An integer epoch generates the
    POLICY-DRIFT variant for robots_policy_churn: the Crawl-delay divisor
    becomes ``1 + (site_id + epoch) % 4`` and the base (*) group gains one
    epoch-rotating rule ``Disallow: /page/<(site_id + epoch) % 10>`` —
    which only governs hosts whose SELECTED group is ``*`` (site_id % 3 ==
    1; the CCBot / ccbot groups win selection elsewhere), keeping the
    closed form the churn oracle replays simple."""
    site_id = F.regexp_extract(F.col("host"), "site([0-9]+)", 1).cast("int")
    shift = site_id if epoch is None else site_id + epoch
    delay = (F.lit(60) / (1 + shift % 4)).cast("int").cast("string")
    # Sitemap directive BEFORE any group (position-independence is part of
    # the spec, sitemap_directives must find it); even sites advertise one
    sitemap_line = F.when(
        site_id % 2 == 0,
        F.concat(
            F.lit("Sitemap: https://"), F.col("host"), F.lit("/sitemap.xml\n")
        ),
    ).otherwise(F.lit(""))
    epoch_rule = (
        F.lit("")
        if epoch is None
        else F.concat(
            F.lit("Disallow: /page/"),
            (shift % 10).cast("string"),
            F.lit("\n"),
        )
    )
    base = F.concat(
        F.lit("# synthetic robots for "),
        F.col("host"),
        F.lit("\n"),
        sitemap_line,
        F.lit("User-agent: *\nDisallow: /private/\nCrawl-delay: "),
        delay,
        F.lit("\n"),
        epoch_rule,
    )
    ccbot_group = F.concat(
        F.lit("\nUser-agent: CCBot\nDisallow: /page/\nAllow: /page/1\nCrawl-delay: "),
        delay,
        F.lit("\n"),
    )
    wild_group = F.concat(
        F.lit(
            "\nUser-agent: ccbot\nUser-agent: examplebot\n"
            "Disallow: /*9.html$\nCrawl-delay: "
        ),
        delay,
        F.lit("\n"),
    )
    body = F.concat(
        base,
        F.when(site_id % 3 == 0, ccbot_group)
        .when(site_id % 3 == 2, wild_group)
        .otherwise(F.lit("")),
    )
    return hosts.select(
        "host",
        F.when(site_id % 12 == 7, 403).otherwise(200).alias("fetch_status"),
        body.alias("robots_txt"),
    )


def _epoch_side(
    hosts: DataFrame, urls: DataFrame, epoch: int, tag: str
) -> tuple[DataFrame, DataFrame]:
    """One robots epoch through the full chain: (ledger with tag-suffixed
    budget/status columns, per-URL decisions with ``dec_<tag>``). ``urls``
    may carry any extra columns (e.g. the full url) — robots_decision
    preserves them."""
    rb = synth_robots(hosts, epoch=epoch)
    ledger = robots_ledger(rb, round_seconds=60, default_budget=1).select(
        "host",
        F.col("robots_status").alias(f"robots_status_{tag}"),
        F.col("max_per_round").cast("long").alias(f"budget_{tag}"),
    )
    rules = robots_rules(parse_robots(parsable_bodies(rb)))
    dec = robots_decision(urls, rules).withColumnRenamed(
        "decision", f"dec_{tag}"
    )
    return ledger, dec


def robots_policy_churn(
    pages: DataFrame, epoch_a: int = 0, epoch_b: int = 1
) -> DataFrame:
    """Cross-crawl robots.txt policy drift — the signal that tells a
    crawler its cached politeness state has gone stale: between two
    robots epochs, which hosts changed their Crawl-delay budget, and how
    many known URLs flipped allowed→disallowed (must stop fetching /
    purge) or disallowed→allowed (newly crawlable). Both epochs' bodies
    run through the REAL RFC 9309 chain (parse → group selection →
    longest-match decision → ledger budget); the oracle replays the
    generative closed form without parsing, so any drift in the parser
    surfaces here too.

    Returns one row per host: (host, robots_status, budget_a, budget_b,
    budget_changed, n_paths, n_newly_blocked, n_unblocked); blocked (403)
    hosts report zero flips — their URLs are gated upstream of per-path
    rules.

    Scale shape: rules and ledgers are host-dimension (broadcast); the
    distinct (host, path) relation is corpus-sized and is materialized
    once (lazy localCheckpoint) then classified twice and self-joined on
    its own key — one exchange on (host, path), aggregation back to host
    grain. Nothing wider than the distinct-URL relation shuffles."""
    hosts = pages.select("host").distinct().localCheckpoint(eager=False)
    urls = (
        pages.select(
            "host",
            F.regexp_extract("url", "^[a-z]+://[^/]+(/.*)$", 1).alias(
                "path"
            ),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    ledger_a, dec_a = _epoch_side(hosts, urls, epoch_a, "a")
    ledger_b, dec_b = _epoch_side(hosts, urls, epoch_b, "b")
    dec_a = dec_a.select("host", "path", "dec_a")
    dec_b = dec_b.select("host", "path", "dec_b")
    flips = (
        dec_a.join(dec_b, ["host", "path"])
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_paths"),
            F.sum(
                (
                    (F.col("dec_a") == "allow")
                    & (F.col("dec_b") == "disallow")
                ).cast("long")
            )
            .cast("long")
            .alias("_nb"),
            F.sum(
                (
                    (F.col("dec_a") == "disallow")
                    & (F.col("dec_b") == "allow")
                ).cast("long")
            )
            .cast("long")
            .alias("_ub"),
        )
    )
    blocked = F.col("robots_status_a") == 403
    zero = F.lit(0).cast("long")
    return (
        flips.join(ledger_a, "host")
        .join(ledger_b.drop("robots_status_b"), "host")
        .select(
            "host",
            F.col("robots_status_a").cast("long").alias("robots_status"),
            "budget_a",
            "budget_b",
            (F.col("budget_a") != F.col("budget_b")).alias(
                "budget_changed"
            ),
            "n_paths",
            F.when(blocked, zero).otherwise(F.col("_nb")).alias(
                "n_newly_blocked"
            ),
            F.when(blocked, zero).otherwise(F.col("_ub")).alias(
                "n_unblocked"
            ),
        )
        .orderBy("host")
    )


def unblocked_urls(
    pages: DataFrame, epoch_a: int = 0, epoch_b: int = 1
) -> DataFrame:
    """Distinct (url, host) whose robots decision flipped
    disallowed→allowed between the two epochs on a non-403 host — the
    newly crawlable set robots_policy_churn counts as ``n_unblocked``,
    materialized at URL grain so the scheduler can re-open them
    (scheduler.reopen_for_policy_change). Same scale shape as the churn
    rollup minus the host aggregation."""
    hosts = pages.select("host").distinct().localCheckpoint(eager=False)
    urls = (
        pages.select(
            "url",
            "host",
            F.regexp_extract("url", "^[a-z]+://[^/]+(/.*)$", 1).alias(
                "path"
            ),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    ledger_a, dec_a = _epoch_side(hosts, urls, epoch_a, "a")
    _, dec_b = _epoch_side(hosts, urls, epoch_b, "b")
    return (
        dec_a.select("url", "host", "dec_a")
        .join(dec_b.select("url", "dec_b"), "url")
        .join(
            F.broadcast(
                ledger_a.filter(F.col("robots_status_a") != 403).select(
                    "host"
                )
            ),
            "host",
            "semi",
        )
        .filter(
            (F.col("dec_a") == "disallow") & (F.col("dec_b") == "allow")
        )
        .select("url", "host")
    )


def robots_cache_status(
    pages: DataFrame, ttl_s: int = 86_400
) -> DataFrame:
    """robots.txt cache freshness per host — RFC 9309 §2.4 allows
    caching a robots file, conventionally up to 24 hours, after which a
    polite crawler MUST refetch before trusting its cached politeness
    rules. Given the capture table (robots.txt fetches are the rows the
    P5 classifier routes by ``/robotstxt/`` in warc_filename,
    operators/counts.with_flags), classify every host:

      missing  no robots.txt capture at all — fetch before first crawl
      stale    latest capture older than ``ttl_s`` relative to the
               corpus clock (max fetch_ts over the table — deterministic,
               no wall time)
      fresh    within TTL

    plus ``due`` = the refetch worklist flag (missing or stale). One
    host-grain aggregation over the robots subset, one scalar corpus
    clock broadcast onto the host dimension — nothing corpus-wide
    shuffles."""
    robots = pages.filter(F.col("warc_filename").rlike("/robotstxt/"))
    per_host = pages.select("host").distinct().join(
        robots.groupBy("host").agg(
            F.count("*").cast("long").alias("n_robots_captures"),
            F.max("fetch_ts").cast("long").alias("last_robots_ts"),
        ),
        "host",
        "left",
    )
    now = pages.agg(F.max("fetch_ts").cast("long").alias("_now"))
    return (
        per_host.crossJoin(F.broadcast(now))
        .select(
            "host",
            F.coalesce("n_robots_captures", F.lit(0)).alias(
                "n_robots_captures"
            ),
            "last_robots_ts",
            F.when(F.col("last_robots_ts").isNull(), "missing")
            .when(
                F.col("_now") - F.col("last_robots_ts") > F.lit(ttl_s),
                "stale",
            )
            .otherwise("fresh")
            .alias("status"),
            (
                F.col("last_robots_ts").isNull()
                | (F.col("_now") - F.col("last_robots_ts") > F.lit(ttl_s))
            ).alias("due"),
        )
        .orderBy("host")
    )
