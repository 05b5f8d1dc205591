"""Parity tests for bipartite color / is_bipartite / sets."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos import bipartite as BP
from linkgraph.exceptions import NetworkXError, AmbiguousSolution


def test_color_path(spark):
    G = nx.path_graph(7)
    want = nx.bipartite.color(G)
    got = {r["id"]: r["color"] for r in BP.color(from_nx(spark, G)).collect()}
    assert got == want


def test_color_even_cycle_and_isolate(spark):
    G = nx.cycle_graph(8)
    G.add_node(99)  # isolate -> color 0 in the reference
    want = nx.bipartite.color(G)
    got = {r["id"]: r["color"] for r in BP.color(from_nx(spark, G)).collect()}
    assert got == want


def test_color_random_bipartite(spark):
    G = nx.bipartite.random_graph(12, 9, 0.4, seed=3)
    want = nx.bipartite.color(G)
    got = {r["id"]: r["color"] for r in BP.color(from_nx(spark, G)).collect()}
    assert got == want


def test_color_odd_cycle_raises(spark):
    G = nx.cycle_graph(5)
    with pytest.raises(NetworkXError):
        BP.color(from_nx(spark, G))


def test_is_bipartite(spark):
    assert BP.is_bipartite(from_nx(spark, nx.cycle_graph(6))) is True
    assert BP.is_bipartite(from_nx(spark, nx.cycle_graph(5))) is False
    assert BP.is_bipartite(from_nx(spark, nx.complete_graph(4))) is False


def test_sets(spark):
    G = nx.path_graph(6)
    X, Y = nx.bipartite.sets(G)
    gx, gy = BP.sets(from_nx(spark, G))
    got_x = {r["id"] for r in gx.collect()}
    got_y = {r["id"] for r in gy.collect()}
    assert {frozenset(got_x), frozenset(got_y)} == {frozenset(X), frozenset(Y)}


def test_sets_disconnected_raises(spark):
    G = nx.Graph([(0, 1), (2, 3)])
    with pytest.raises(AmbiguousSolution):
        BP.sets(from_nx(spark, G))
