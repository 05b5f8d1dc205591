"""Parity tests for transitive_reduction vs the reference."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.dag import transitive_reduction, GraphContainsCycle


def _check(spark, G):
    got = {
        (r["src"], r["dst"])
        for r in transitive_reduction(from_nx(spark, G)).edges.collect()
    }
    want = set(nx.transitive_reduction(G).edges())
    assert got == want


def test_chain_with_shortcuts(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 3), (0, 2), (0, 3), (1, 3)])
    _check(spark, G)


def test_diamond(spark):
    _check(spark, nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)]))


def test_already_reduced(spark):
    G = nx.DiGraph([(0, 1), (0, 2), (2, 3)])
    _check(spark, G)


def test_complete_dag(spark):
    G = nx.complete_graph(7, create_using=nx.DiGraph)
    D = nx.DiGraph((u, v) for u, v in G.edges if u < v)
    _check(spark, D)


def test_random_dags(spark):
    for seed in (2, 11):
        R = nx.gnp_random_graph(20, 0.25, seed=seed, directed=True)
        D = nx.DiGraph((u, v) for u, v in R.edges if u < v)
        D.add_nodes_from(R)
        _check(spark, D)


def test_raises_on_cycle(spark):
    with pytest.raises(GraphContainsCycle):
        transitive_reduction(from_nx(spark, nx.DiGraph([(0, 1), (1, 0)])))
