"""Parity tests for matching predicates, min_edge_cover, eulerize, and
node/edge contraction vs the reference (matching.py, covering.py,
euler.py:396, minors/contraction.py)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError
from linkgraph.algos.covering import (
    is_matching,
    is_maximal_matching,
    is_perfect_matching,
    min_edge_cover,
    is_edge_cover,
)
from linkgraph.algos.cycles import eulerize, is_eulerian
from linkgraph.algos.setops import contracted_nodes, contracted_edge


def test_matching_predicates_parity(spark):
    G = nx.gnp_random_graph(14, 0.3, seed=23)
    g = from_nx(spark, G)
    cases = [
        {(0, 1)} if G.has_edge(0, 1) else set(),
        set(nx.maximal_matching(G)),
        set(nx.max_weight_matching(G, maxcardinality=True)),
    ]
    for m in cases:
        if not m:
            continue
        assert is_matching(g, m) == nx.is_matching(G, m), m
        assert is_maximal_matching(g, m) == nx.is_maximal_matching(G, m), m
        assert is_perfect_matching(g, m) == nx.is_perfect_matching(G, m), m
    # an invalid "matching" sharing an endpoint
    e = list(G.edges)
    shared = None
    for u, v in e:
        for x, y in e:
            if (u, v) != (x, y) and len({u, v, x, y}) == 3:
                shared = {(u, v), (x, y)}
                break
        if shared:
            break
    if shared:
        assert is_matching(g, shared) == nx.is_matching(G, shared)


def test_matching_unknown_node_raises(spark):
    G = nx.path_graph(4)
    g = from_nx(spark, G)
    with pytest.raises(NetworkXError):
        is_matching(g, {(0, 99)})


def test_min_edge_cover_parity(spark):
    for seed in (3, 4):
        G = nx.gnp_random_graph(12, 0.35, seed=seed)
        G.remove_nodes_from(list(nx.isolates(G)))
        G = nx.relabel_nodes(G, {v: i for i, v in enumerate(sorted(G))})
        g = from_nx(spark, G)
        want = nx.min_edge_cover(G)
        got = {(r["u"], r["v"]) for r in min_edge_cover(g).collect()}
        assert len(got) == len(want)
        assert is_edge_cover(g, got)
        for u, v in got:
            assert G.has_edge(u, v)


def test_min_edge_cover_isolate_raises(spark):
    G = nx.path_graph(3)
    G.add_node(9)
    with pytest.raises(NetworkXError):
        min_edge_cover(from_nx(spark, G))


@pytest.mark.parametrize("seed", [5, 8])
def test_eulerize(spark, seed):
    G = nx.gnp_random_graph(10, 0.4, seed=seed)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    G = nx.relabel_nodes(G, {v: i for i, v in enumerate(sorted(G))})
    g = from_nx(spark, G)
    H = eulerize(g)
    # result must be eulerian: connected with every degree even
    from linkgraph.algos.degrees import degrees

    odd = degrees(H).filter(F.col("degree") % 2 == 1).count()
    assert odd == 0
    # added-edge total matches the reference (both take a min-cost pairing)
    want = nx.eulerize(G).number_of_edges()
    assert H.number_of_edges() == want


def test_eulerize_already_eulerian(spark):
    G = nx.cycle_graph(6)
    H = eulerize(from_nx(spark, G))
    assert H.number_of_edges() == 6


def test_contracted_nodes_parity(spark):
    G = nx.gnp_random_graph(10, 0.3, seed=31)
    g = from_nx(spark, G)
    for self_loops in (True, False):
        want = nx.contracted_nodes(G, 0, 3, self_loops=self_loops)
        got = contracted_nodes(g, 0, 3, self_loops=self_loops)
        want_edges = {tuple(sorted(e)) for e in want.edges()}
        got_edges = {
            tuple(sorted((r["src"], r["dst"])))
            for r in got.edges.select("src", "dst").collect()
        }
        assert got_edges == want_edges
        assert got.number_of_nodes() == want.number_of_nodes()


def test_contracted_edge(spark):
    G = nx.cycle_graph(5)
    g = from_nx(spark, G)
    want = nx.contracted_edge(G, (0, 1), self_loops=False)
    got = contracted_edge(g, 0, 1, self_loops=False)
    want_edges = {tuple(sorted(e)) for e in want.edges()}
    got_edges = {
        tuple(sorted((r["src"], r["dst"])))
        for r in got.edges.select("src", "dst").collect()
    }
    assert got_edges == want_edges
    with pytest.raises(ValueError):
        contracted_edge(g, 0, 2, self_loops=True)
