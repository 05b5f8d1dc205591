"""Parity tests for the triadic census."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.triads import triadic_census


def _check(spark, G):
    want = nx.triadic_census(G)
    got = {
        r["triad_type"]: r["count"]
        for r in triadic_census(from_nx(spark, G)).collect()
    }
    assert got == dict(want)


def test_small_mixed(spark):
    G = nx.DiGraph([(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (1, 4), (2, 4)])
    _check(spark, G)


def test_gnp_sparse(spark):
    _check(spark, nx.gnp_random_graph(20, 0.1, seed=5, directed=True))


def test_gnp_denser(spark):
    _check(spark, nx.gnp_random_graph(15, 0.3, seed=9, directed=True))


def test_cycle_and_star(spark):
    G = nx.DiGraph()
    nx.add_cycle(G, [0, 1, 2])
    G.add_edges_from([(5, 6), (5, 7), (5, 8)])
    G.add_node(99)
    _check(spark, G)


def test_complete_mutual(spark):
    G = nx.complete_graph(5, create_using=nx.DiGraph)
    _check(spark, G)


def test_undirected_raises(spark):
    with pytest.raises(ValueError):
        triadic_census(from_nx(spark, nx.path_graph(3)))
