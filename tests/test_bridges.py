"""Parity tests for bridges / has_bridges / 2-edge-connected components."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos import bridges as BR
from linkgraph.exceptions import NotImplementedForDirected


def _want_bridges(G):
    return {frozenset(e) for e in nx.bridges(G)}


def _got_bridges(spark, G, **kw):
    return {
        frozenset((r["u"], r["v"]))
        for r in BR.bridges(from_nx(spark, G), **kw).collect()
    }


def test_path_all_bridges(spark):
    G = nx.path_graph(10)
    assert _got_bridges(spark, G) == _want_bridges(G)
    assert len(_want_bridges(G)) == 9


def test_cycle_no_bridges(spark):
    G = nx.cycle_graph(12)
    assert _got_bridges(spark, G) == set()
    assert BR.has_bridges(from_nx(spark, G)) is False


def test_lollipop(spark):
    # clique + tail: exactly the tail edges are bridges
    G = nx.lollipop_graph(6, 5)
    assert _got_bridges(spark, G) == _want_bridges(G)


def test_gnp_sparse(spark):
    G = nx.gnp_random_graph(60, 0.045, seed=5)
    assert _got_bridges(spark, G) == _want_bridges(G)


def test_gnp_disconnected_forest_mix(spark):
    G = nx.gnp_random_graph(50, 0.03, seed=9)  # many components, trees
    G.add_edges_from([(100, 101), (101, 102), (102, 100), (102, 103)])
    assert _got_bridges(spark, G) == _want_bridges(G)


def test_barbell(spark):
    G = nx.barbell_graph(5, 3)
    assert _got_bridges(spark, G) == _want_bridges(G)
    assert BR.has_bridges(from_nx(spark, G)) is True


def test_directed_raises(spark):
    with pytest.raises(NotImplementedForDirected):
        BR.bridges(from_nx(spark, nx.DiGraph([(1, 2)])))


def test_two_edge_components(spark):
    G = nx.barbell_graph(5, 3)
    want = {frozenset(c) for c in nx.k_edge_components(G, k=2)}
    rows = BR.two_edge_connected_components(from_nx(spark, G)).collect()
    comp = {}
    for r in rows:
        comp.setdefault(r["component"], set()).add(r["id"])
    assert {frozenset(c) for c in comp.values()} == want


def test_two_edge_components_gnp(spark):
    G = nx.gnp_random_graph(40, 0.06, seed=21)
    want = {frozenset(c) for c in nx.k_edge_components(G, k=2)}
    rows = BR.two_edge_connected_components(from_nx(spark, G)).collect()
    comp = {}
    for r in rows:
        comp.setdefault(r["component"], set()).add(r["id"])
    assert {frozenset(c) for c in comp.values()} == want


def test_deterministic(spark):
    G = nx.gnp_random_graph(40, 0.05, seed=33)
    assert _got_bridges(spark, G, seed=7) == _got_bridges(spark, G, seed=7)
