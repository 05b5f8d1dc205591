"""Parity tests for line_graph (networkx/generators/line.py:15) and
ego_graph (networkx/generators/ego.py:10)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import from_nx
from linkgraph.algos.line import line_graph_edges, line_graph
from linkgraph.algos.setops import ego_graph


def _canon_pair(u, v):
    return (u, v) if u <= v else (v, u)


def _nx_line_edges(G):
    L = nx.line_graph(G)
    out = set()
    for a, b in L.edges():
        if G.is_directed():
            out.add((a, b))
        else:
            a, b = sorted((tuple(sorted(a)), tuple(sorted(b))))
            out.add((a, b))
    return out


@pytest.mark.parametrize("directed", [False, True])
def test_line_graph_parity(spark, directed):
    G = nx.gnp_random_graph(16, 0.2, seed=3, directed=directed)
    G.add_edge(0, 0)  # self-loop exercises the special case
    got_rows = line_graph_edges(from_nx(spark, G)).collect()
    if directed:
        got = {((r["u1"], r["v1"]), (r["u2"], r["v2"])) for r in got_rows}
    else:
        got = {
            tuple(sorted(((r["u1"], r["v1"]), (r["u2"], r["v2"]))))
            for r in got_rows
        }
    want = _nx_line_edges(G)
    if directed:
        assert got == want
    else:
        # nx orders L-edges arbitrarily; compare as unordered pair sets
        want = {tuple(sorted(p)) for p in want}
        assert got == want


def test_line_graph_counts_path_cycle(spark):
    # L(P_n) = P_{n-1}; L(C_n) = C_n
    for G, n_edges in [(nx.path_graph(6), 4), (nx.cycle_graph(7), 7)]:
        lg = line_graph(from_nx(spark, G))
        assert lg.number_of_nodes() == G.number_of_edges()
        assert lg.number_of_edges() == n_edges


def test_line_graph_isolated_lnode(spark):
    # single disconnected edge -> isolated node in L
    G = nx.Graph([(0, 1), (2, 3), (3, 4)])
    lg = line_graph(from_nx(spark, G))
    assert lg.number_of_nodes() == 3
    assert lg.number_of_edges() == 1


@pytest.mark.parametrize("directed", [False, True])
@pytest.mark.parametrize("radius", [1, 2])
@pytest.mark.parametrize("center", [True, False])
def test_ego_graph_parity(spark, directed, radius, center):
    G = nx.gnp_random_graph(20, 0.15, seed=9, directed=directed)
    H = nx.ego_graph(G, 0, radius=radius, center=center)
    g = ego_graph(from_nx(spark, G), 0, radius=radius, center=center)
    got_nodes = {r["id"] for r in g.vertices.select("id").collect()}
    assert got_nodes == set(H.nodes())
    got_edges = {
        (r["src"], r["dst"]) if directed else _canon_pair(r["src"], r["dst"])
        for r in g.edges.select("src", "dst").collect()
    }
    want_edges = {
        (u, v) if directed else _canon_pair(u, v) for u, v in H.edges()
    }
    assert got_edges == want_edges


def test_ego_graph_undirected_flag(spark):
    D = nx.DiGraph([(1, 0), (0, 2), (2, 3), (4, 1)])
    H = nx.ego_graph(D, 0, radius=1, undirected=True)
    g = ego_graph(from_nx(spark, D), 0, radius=1, undirected=True)
    assert {r["id"] for r in g.vertices.select("id").collect()} == set(H.nodes())
    assert {
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    } == set(H.edges())


def test_ego_graph_weighted_distance(spark):
    G = nx.Graph()
    G.add_edge(0, 1, weight=1.0)
    G.add_edge(1, 2, weight=1.5)
    G.add_edge(0, 3, weight=5.0)
    G.add_edge(2, 4, weight=10.0)
    H = nx.ego_graph(G, 0, radius=3.0, distance="weight")
    g = ego_graph(from_nx(spark, G), 0, radius=3.0, distance="weight")
    assert {r["id"] for r in g.vertices.select("id").collect()} == set(H.nodes())
