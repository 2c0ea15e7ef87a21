"""Pure-Python reference model of the frontier scheduler.

This is the executable specification the Spark engine must match
bit-for-bit (BASELINE.json: "matching the reference's crawl ordering and
URL-seen set under the same seed list + politeness budget"). It implements
the identical semantics with dicts + sorts — host-bucketed priority
(depth ASC, score DESC, url ASC), per-host budget, robots gate, add-time
URL-seen — with no Spark involved, so tests can diff the two.
"""

from __future__ import annotations

from dataclasses import dataclass, field

TLDS = ["com", "org", "net", "de", "jp"]


def synth_url(doc_id: int) -> dict:
    """Python twin of synth.PAGES_SQL's URL derivation for one doc_id."""
    host_id = doc_id % 40
    tld = TLDS[host_id % 5]
    site_id = host_id % 12
    band = doc_id % 120
    sub = "www." if band < 40 else ("" if band < 80 else "cdn.")
    scheme = "https" if doc_id % 10 < 8 else "http"
    domain = f"site{site_id}.{tld}"
    host = f"{sub}{domain}"
    path = f"/page/{doc_id}.html"
    return {
        "url": f"{scheme}://{host}{path}",
        "host": host,
        "surt_key": f"{tld},site{site_id}){path}",
        "doc_id": doc_id,
        "score": (doc_id * 37) % 100,
        "site_id": site_id,
    }


def path_allowed(site_id: int, path: str) -> bool:
    """Closed form of the per-path robots decision for the legacy synth
    bodies (robots.synth_robots, epoch=None), for the selected group of
    each host class — must mirror robots.robots_rules + robots_decision:
    site%3==0 → CCBot group (Disallow /page/, Allow /page/1);
    site%3==2 → ccbot wildcard group (Disallow /*9.html$);
    otherwise → base group (only /private/ disallowed)."""
    if site_id % 3 == 0:
        return path.startswith("/page/1")
    if site_id % 3 == 2:
        return not path.endswith("9.html")
    return not path.startswith("/private/")


def ledger_for(site_id: int) -> tuple[int, int]:
    """(robots_status, max_per_round) — must mirror scheduler.host_ledger.
    Blocked hosts (robots fetch 403) keep the default budget of 1: their
    body is never parsed for Crawl-delay (robots.parsable_bodies)."""
    if site_id % 12 == 7:
        return (403, 1)
    return (200, 1 + site_id % 4)


@dataclass
class ModelState:
    n_docs: int
    # url -> (depth, score, discovered_round)
    pending: dict[str, tuple[int, int, int]] = field(default_factory=dict)
    seen: set[str] = field(default_factory=set)
    schedules: list[list[dict]] = field(default_factory=list)
    rnd: int = 0
    # starvation-freedom: effective score = score + age_boost * rounds
    # waiting (0 = pure static priority, the default ordering contract)
    age_boost: int = 0
    # flat_depth mirrors a flat-depth expand_fn (children always depth 1):
    # the shape where same-depth competitors carry DIFFERENT discovery
    # rounds, i.e. where aging actually reorders
    flat_depth: bool = False
    # cap every host's per-round budget (mirrors a rewritten host_ledger)
    # — forces queues to linger so aging has something to reorder
    budget_cap: int | None = None
    # fetch-time per-path robots gate (scheduler.run_round
    # enforce_robots_paths): budget rows keep their pre-gate rank, denied
    # rows retire unfetched (allowed=False) and do not expand
    enforce_paths: bool = False

    def __post_init__(self):
        self.uni = {u["url"]: u for u in (synth_url(d) for d in range(self.n_docs))}
        self.by_doc = {u["doc_id"]: u for u in self.uni.values()}


def seed(
    n_docs: int, age_boost: int = 0, flat_depth: bool = False
) -> ModelState:
    st = ModelState(n_docs, age_boost=age_boost, flat_depth=flat_depth)
    for u in st.uni.values():
        if u["doc_id"] % 7 == 0:
            st.pending[u["url"]] = (0, u["score"], 0)
            st.seen.add(u["url"])
    return st


def run_round(st: ModelState) -> list[dict]:
    st.rnd += 1
    # politeness gate
    by_host: dict[str, list] = {}
    blocked = []
    for url, (depth, score, disc) in st.pending.items():
        u = st.uni[url]
        robots, budget = ledger_for(u["site_id"])
        if st.budget_cap is not None:
            budget = min(budget, st.budget_cap)
        if robots == 403:
            blocked.append(url)
        else:
            aged = score + st.age_boost * (st.rnd - disc)
            by_host.setdefault(u["host"], []).append(
                (depth, -aged, url, budget, score)
            )
    for url in blocked:
        del st.pending[url]
    # host-bucketed priority: total order (depth asc, aged score desc,
    # url asc); with age_boost == 0 aged == raw score (legacy contract)
    schedule = []
    for host in by_host:
        rows = sorted(by_host[host])
        budget = rows[0][3]
        for rank, (depth, _negaged, url, _, score) in enumerate(
            rows[:budget], 1
        ):
            u = st.uni[url]
            allowed = (not st.enforce_paths) or path_allowed(
                u["site_id"], "/" + url.split("/", 3)[3]
            )
            schedule.append(
                {
                    "round": st.rnd,
                    "url": url,
                    "host": host,
                    "depth": depth,
                    "score": score,
                    "rank": rank,
                    "allowed": allowed,
                }
            )
            del st.pending[url]
    # link expansion: min depth per child within the round, then seen gate
    child_depth: dict[int, int] = {}
    for row in schedule:
        if not row["allowed"]:
            continue  # denied rows are never fetched, so never expand
        d = st.uni[row["url"]]["doc_id"]
        for c in ((d * 2 + 1) % st.n_docs, (d * 3 + 7) % st.n_docs):
            nd = 1 if st.flat_depth else row["depth"] + 1
            child_depth[c] = min(child_depth.get(c, nd), nd)
    for c, depth in child_depth.items():
        u = st.by_doc[c]
        if u["url"] not in st.seen:
            st.seen.add(u["url"])
            st.pending[u["url"]] = (depth, u["score"], st.rnd)
    st.schedules.append(schedule)
    return schedule
