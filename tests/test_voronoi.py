"""Parity tests for voronoi_cells vs the reference's multi-source Dijkstra."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.sssp import voronoi_cells


def _assert_valid(spark, G, centers, weight=True):
    """Every assignment must be distance-optimal; cells must cover exactly
    the reachable nodes (tie-breaks differ from the reference by contract)."""
    g = from_nx(spark, G)
    rows = voronoi_cells(g, centers, weight=weight).collect()
    got = {r["id"]: (r["center"], r["distance"]) for r in rows}
    wfn = "weight" if weight else None
    dist_from = {
        c: nx.single_source_dijkstra_path_length(G, c, weight=wfn) for c in centers
    }
    reachable = set().union(*[set(d) for d in dist_from.values()])
    assert set(got) == reachable
    for node, (center, d) in got.items():
        best = min(dist_from[c].get(node, float("inf")) for c in centers)
        assert dist_from[center].get(node) == pytest.approx(d)
        assert d == pytest.approx(best)


def test_path_two_centers(spark):
    G = nx.path_graph(9)
    nx.set_edge_attributes(G, 1.0, "weight")
    _assert_valid(spark, G, [0, 8])
    # middle node ties -> min center id
    g = from_nx(spark, G)
    rows = {r["id"]: r["center"] for r in voronoi_cells(g, [0, 8]).collect()}
    assert rows[4] == 0


def test_matches_nx_cells_when_unique(spark):
    # distinct powers-of-two weights make every distance unique, so the
    # partition must match the reference exactly
    G = nx.Graph()
    edges = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 4.0), (3, 4, 8.0), (4, 5, 16.0),
             (0, 6, 32.0), (6, 7, 64.0), (2, 7, 128.0)]
    G.add_weighted_edges_from(edges)
    centers = [0, 4]
    want = nx.voronoi_cells(G, set(centers))
    g = from_nx(spark, G)
    got = {}
    for r in voronoi_cells(g, centers).collect():
        got.setdefault(r["center"], set()).add(r["id"])
    assert got == {c: s for c, s in want.items() if c != "unreachable"}


def test_unreachable_absent(spark):
    G = nx.Graph([(0, 1), (5, 6)])
    nx.set_edge_attributes(G, 1.0, "weight")
    g = from_nx(spark, G)
    got = {r["id"] for r in voronoi_cells(g, [0]).collect()}
    assert got == {0, 1}


def test_directed(spark):
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 1.0), (1, 2, 1.0), (3, 2, 1.0), (3, 4, 1.0)])
    _assert_valid(spark, G, [0, 3])


def test_gnp_weighted(spark):
    G = nx.gnp_random_graph(30, 0.1, seed=21)
    for i, (u, v) in enumerate(G.edges):
        G[u][v]["weight"] = float(1 + (i * 7) % 5)
    _assert_valid(spark, G, [0, 1, 2])


def test_unweighted_hops(spark):
    G = nx.gnp_random_graph(25, 0.12, seed=3)
    for u, v in G.edges:
        G[u][v]["weight"] = 999.0  # must be ignored with weight=False
    _assert_valid(spark, G, [0, 5], weight=False)
