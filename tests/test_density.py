"""Tests for the parallel-peel densest subgraph approximation vs the
reference's greedy++ (networkx/algorithms/approximation/density.py)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.exceptions import NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.density import densest_subgraph, densest_subgraph_rounds


def _density_of(G, nodes):
    S = set(nodes)
    m = sum(1 for u, v in G.edges() if u in S and v in S)
    return m / len(S)


def test_clique_exact(spark):
    # On a clique every node has degree k-1 <= 2(1+eps)(k-1)/2: the whole
    # graph is round 0's candidate and the exact optimum.
    G = nx.complete_graph(10)
    d, nodes = densest_subgraph(from_nx(spark, G))
    assert d == pytest.approx(4.5)
    assert {r["id"] for r in nodes.collect()} == set(G.nodes)


def test_reported_density_is_real(spark):
    G = nx.gnp_random_graph(60, 0.08, seed=7)
    d, nodes = densest_subgraph(from_nx(spark, G))
    ids = [r["id"] for r in nodes.collect()]
    assert d == pytest.approx(_density_of(G, ids))


def test_within_guarantee_of_reference(spark):
    # ours >= OPT/(2(1+eps)) and greedy++ <= OPT, so ours >= ref/(2(1+eps))
    G = nx.gnp_random_graph(60, 0.1, seed=11)
    # plant a dense K8
    for u in range(8):
        for v in range(u + 1, 8):
            G.add_edge(u, v)
    want, _ = nx.approximation.densest_subgraph(G, method="greedy++")
    d, _ = densest_subgraph(from_nx(spark, G), eps=0.1)
    assert d >= want / 2.2 - 1e-9
    # in practice the peel lands much closer on a planted clique
    assert d >= 0.8 * want


def test_rounds_trajectory(spark):
    G = nx.gnp_random_graph(40, 0.1, seed=3)
    tr = densest_subgraph_rounds(from_nx(spark, G)).collect()
    assert tr[0]["n_nodes"] == 40
    ns = [r["n_nodes"] for r in tr]
    assert ns == sorted(ns, reverse=True) and len(set(ns)) == len(ns)


def test_isolates_and_empty(spark):
    G = nx.empty_graph(5)
    d, nodes = densest_subgraph(from_nx(spark, G))
    assert d == 0.0
    with pytest.raises(NotImplementedForDirected):
        densest_subgraph(from_nx(spark, nx.DiGraph([(0, 1)])))
