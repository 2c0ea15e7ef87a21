"""Redirect resolution semantics: chains, cycles, hop bound, early stop."""

from cc_crawl_statistics_spark.operators.redirects import resolve_redirects
from tests.conftest import spark  # noqa: F401  (fixture)


def _resolve(spark, pairs, max_hops=8):  # noqa: F811
    edges = spark.createDataFrame(pairs, "src string, dst string")
    return {
        r.url: (r.final_url, r.hops, r.resolved)
        for r in resolve_redirects(edges, max_hops=max_hops).collect()
    }


def test_chain_cycle_and_terminal(spark):  # noqa: F811
    got = _resolve(
        spark,
        [
            ("a", "b"),  # a -> b -> c -> T   (chain)
            ("b", "c"),
            ("c", "T"),
            ("x", "y"),  # x <-> y            (2-cycle)
            ("y", "x"),
            ("s", "s"),  # self-redirect      (1-cycle)
            ("q", "Z"),  # single hop
        ],
    )
    assert got["a"] == ("T", 3, 1)
    assert got["b"] == ("T", 2, 1)
    assert got["c"] == ("T", 1, 1)
    assert got["q"] == ("Z", 1, 1)
    # cycles exhaust the hop bound and stay unresolved
    assert got["x"][1] == 8 and got["x"][2] == 0
    assert got["s"] == ("s", 8, 0)


def test_random_graphs_match_python_model(spark):  # noqa: F811
    """Randomized functional redirect graphs (seeded) vs an independent
    single-threaded model of the same semantics."""
    import random

    def model(edge_map, max_hops=8):
        out = {}
        for src, dst in edge_map.items():
            cur, hops = dst, 1
            while cur in edge_map and hops < max_hops:
                cur, hops = edge_map[cur], hops + 1
            out[src] = (cur, hops, 0 if cur in edge_map else 1)
        return out

    rng = random.Random(42)
    for trial in range(12):
        n = rng.randint(2, 40)
        nodes = [f"u{i}" for i in range(n + 10)]
        srcs = rng.sample(nodes, n)
        edge_map = {s: rng.choice(nodes) for s in srcs}
        got = _resolve(spark, list(edge_map.items()))
        assert got == model(edge_map), (trial, edge_map)


def test_hop_bound_truncates_long_chain(spark):  # noqa: F811
    chain = [(f"n{i}", f"n{i + 1}") for i in range(12)]
    got = _resolve(spark, chain, max_hops=4)
    # from n0, 4 hops reach n4 which is still a redirect source
    assert got["n0"] == ("n4", 4, 0)
    # the tail of the chain resolves within the bound
    assert got["n11"] == ("n12", 1, 1)
    assert got["n8"] == ("n12", 4, 1)
