"""Integer-exact PageRank tests: bit-for-bit vs an independent pure-Python
model (the integer fixed-point math makes exact equality meaningful),
structural sanity on known graphs, and determinism across partitionings."""

from __future__ import annotations

from cc_crawl_statistics_spark.operators import pagerank as PR


def model_pagerank(edges, n_iter=10, nodes=None):
    """Single-threaded model of pagerank() — same integer recurrence."""
    nodes = set(nodes or [])
    for s, d in edges:
        nodes.add(s)
        nodes.add(d)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (PR.SCALE * (100 - PR.DAMP_PCT)) // 100
    ranks = {v: PR.SCALE for v in nodes}
    for _ in range(n_iter):
        mass = {v: 0 for v in nodes}
        for s, d in edges:
            mass[d] += ranks[s] // outdeg[s]
        ranks = {v: base + (mass[v] * PR.DAMP_PCT) // 100 for v in nodes}
    return ranks


def _run(spark, edges, n_iter=10):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: r["rank_fp"]
        for r in PR.pagerank(df, n_iter=n_iter).collect()
    }


def test_bit_for_bit_vs_model(spark):
    # a hub, a chain, a cycle, parallel links, and a dangling node
    edges = (
        [(0, h) for h in (1, 2, 3, 4)]
        + [(1, 5), (5, 6), (6, 1)]
        + [(2, 3), (2, 3)]  # parallel links count twice
        + [(7, 0)]  # 0 also receives; node 4 dangles
    )
    assert _run(spark, edges) == model_pagerank(edges)


def test_synthetic_link_graph_vs_model(spark):
    # the frontier's deterministic link graph: d -> (2d+1)%N, (3d+7)%N
    n = 200
    edges = [(d, (2 * d + 1) % n) for d in range(n)] + [
        (d, (3 * d + 7) % n) for d in range(n)
    ]
    assert _run(spark, edges, n_iter=12) == model_pagerank(edges, n_iter=12)


def test_hub_outranks_leaf(spark):
    edges = [(i, 99) for i in range(20)] + [(99, 0)]
    ranks = _run(spark, edges)
    assert ranks[99] > ranks[1]  # the 20-in-link hub beats a leaf
    assert ranks[0] > ranks[1]  # sole heir of the hub's mass beats a leaf
    assert ranks[1] == ranks[2]  # symmetric leaves tie exactly


def test_deterministic_across_partitionings(spark):
    edges = [(d, (7 * d + 3) % 50) for d in range(50)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {r["node"]: r["rank_fp"] for r in PR.pagerank(df, n_iter=8).collect()}
    b = {
        r["node"]: r["rank_fp"]
        for r in PR.pagerank(df.repartition(13), n_iter=8).collect()
    }
    assert a == b


def test_top_k_tie_break(spark):
    edges = [(0, 1), (0, 2), (3, 4)]
    top = PR.pagerank_top(spark.createDataFrame(edges, ["src", "dst"]), k=3)
    rows = [(r["node"], r["rank_fp"]) for r in top.collect()]
    model = model_pagerank(edges)
    want = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert rows == want


def model_trustrank(edges, seeds, n_iter=10, nodes=None):
    """Single-threaded model of trustrank() — seed-restricted teleport."""
    nodes = set(nodes or [])
    for s, d in edges:
        nodes.add(s)
        nodes.add(d)
    seeds = set(seeds)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    # normalized static score distribution: seed base/init × N/|S|
    base = ((PR.SCALE * (100 - PR.DAMP_PCT)) // 100) * len(nodes) // len(
        seeds
    )
    init = PR.SCALE * len(nodes) // len(seeds)
    trust = {v: init if v in seeds else 0 for v in nodes}
    for _ in range(n_iter):
        mass = {v: 0 for v in nodes}
        for s, d in edges:
            mass[d] += trust[s] // outdeg[s]
        trust = {
            v: (base if v in seeds else 0)
            + (mass[v] * PR.DAMP_PCT) // 100
            for v in nodes
        }
    return trust


def test_trustrank_bit_for_bit_vs_model(spark):
    edges = (
        [(0, h) for h in (1, 2, 3)]
        + [(1, 5), (5, 6), (6, 1), (2, 3), (7, 0)]
        + [(8, 9), (9, 8)]  # a two-node "farm" unreachable from seeds
    )
    seeds = [0, 7]
    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {
        r["node"]: r["trust_fp"]
        for r in PR.trustrank(df, sdf, n_iter=6).collect()
    }
    assert got == model_trustrank(edges, seeds, n_iter=6)
    # unreachable farm accumulates zero trust however it self-links
    assert got[8] == 0 and got[9] == 0


def test_spam_mass_screens_unreachable_farm(spark):
    edges = (
        [(0, 1), (1, 2), (2, 0)]  # trusted triangle
        + [(8, 9), (9, 8), (8, 9)]  # link farm, no trust path in
    )
    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame([(0,)], ["node"])
    got = {
        r["node"]: r["spam_mass_permille"]
        for r in PR.spam_mass(df, sdf, n_iter=8).collect()
    }
    # farm nodes: all rank uncovered; trusted triangle: mostly covered
    assert got[8] == 1000 and got[9] == 1000
    assert got[0] < 500 and got[1] < 500 and got[2] < 500


def model_hits(edges, nodes, n_iter=5):
    """Independent single-threaded model of hits() — exact max-
    normalized integer recurrence."""
    SCALE = 1_000_000
    nodes = list(nodes)
    auth = {v: SCALE for v in nodes}
    hub = {}
    for _ in range(n_iter):
        hr = {v: 0 for v in nodes}
        for s, d in edges:
            hr[s] += auth[d]
        m = max(max(hr.values()), 1)
        hub = {v: hr[v] * SCALE // m for v in nodes}
        ar = {v: 0 for v in nodes}
        for s, d in edges:
            ar[d] += hub[s]
        m = max(max(ar.values()), 1)
        auth = {v: ar[v] * SCALE // m for v in nodes}
    return hub, auth


def test_hits_bit_for_bit_vs_model(spark):
    from cc_crawl_statistics_spark.operators.hits import hits

    edges = (
        [(0, 2), (0, 3), (1, 2), (1, 3), (4, 2)]  # 2,3 authorities
        + [(2, 5), (3, 5)]  # 5 authority fed by former authorities
        + [(6, 7)]  # side pair; 8 isolated
    )
    nodes = list(range(9))
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub_fp"], r["auth_fp"])
        for r in hits(edf, ndf, n_iter=4).collect()
    }
    mh, ma = model_hits(edges, nodes, n_iter=4)
    assert got == {v: (mh[v], ma[v]) for v in nodes}
    # structure: 0/1 are the best hubs, 2/3 strong authorities,
    # isolated node 8 scores zero on both sides
    assert got[0][0] == max(h for h, _ in got.values())
    assert got[8] == (0, 0)


def model_weighted_pagerank(edges_w, n_iter=10):
    """Single-threaded weighted model: contrib = (rank*w) // sum_w(src)."""
    nodes = set()
    wout = {}
    for s_, d, w in edges_w:
        nodes.add(s_)
        nodes.add(d)
        wout[s_] = wout.get(s_, 0) + w
    base = (PR.SCALE * (100 - PR.DAMP_PCT)) // 100
    ranks = {v: PR.SCALE for v in nodes}
    for _ in range(n_iter):
        mass = {v: 0 for v in nodes}
        for s_, d, w in edges_w:
            mass[d] += ranks[s_] * w // wout[s_]
        ranks = {v: base + (mass[v] * PR.DAMP_PCT) // 100 for v in nodes}
    return ranks


def test_weighted_pagerank_bit_for_bit_vs_model(spark):
    edges_w = [
        ("a", "b", 10), ("a", "c", 1), ("b", "c", 5), ("c", "a", 2),
        ("d", "a", 7), ("d", "b", 3),
    ]
    df = spark.createDataFrame(edges_w, "src string, dst string, w long")
    got = {
        r["node"]: r["rank_fp"]
        for r in PR.pagerank(df, n_iter=5, weight_col="w").collect()
    }
    assert got == model_weighted_pagerank(edges_w, n_iter=5)
    # weight matters: b (weight-10 edge from a) outranks c's share from a
    heavy = {
        r["node"]: r["rank_fp"]
        for r in PR.pagerank(df, n_iter=5, weight_col="w").collect()
    }
    flat = {
        r["node"]: r["rank_fp"]
        for r in PR.pagerank(
            df.select("src", "dst"), n_iter=5
        ).collect()
    }
    assert heavy != flat  # weighted recurrence genuinely differs
