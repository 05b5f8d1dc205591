"""Whole-graph connectivity + Stoer-Wagner parity vs the reference."""

from __future__ import annotations

import random

import networkx as nx
import pytest

import linkgraph
from linkgraph.graph import SparkGraph


def _graph(spark, G, directed=False):
    edges = [(int(u), int(v)) for u, v in G.edges()]
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    return SparkGraph(
        e,
        vertices=spark.createDataFrame([(int(n),) for n in G.nodes()], "id long"),
        directed=directed,
    )


def test_edge_connectivity_undirected(spark):
    for G in [
        nx.petersen_graph(),                      # lambda = 3
        nx.cycle_graph(7),                        # lambda = 2
        nx.barbell_graph(4, 0),                   # bridge -> 1
        nx.complete_graph(5),                     # 4
        nx.union(nx.path_graph(3), nx.cycle_graph([10, 11, 12])),  # 0
    ]:
        g = _graph(spark, G)
        assert linkgraph.edge_connectivity(g) == nx.edge_connectivity(G), G


def test_edge_connectivity_directed(spark):
    D = nx.DiGraph(nx.cycle_graph(5, create_using=nx.DiGraph))
    g = _graph(spark, D, directed=True)
    assert linkgraph.edge_connectivity(g) == nx.edge_connectivity(D) == 1
    # not strongly connected -> 0
    P = nx.path_graph(4, create_using=nx.DiGraph)
    assert linkgraph.edge_connectivity(_graph(spark, P, directed=True)) == 0


def test_node_connectivity_whole_graph(spark):
    for G in [
        nx.petersen_graph(),     # kappa = 3
        nx.barbell_graph(4, 1),  # articulation -> 1
        nx.complete_graph(5),    # 4 (no non-adjacent pairs)
        nx.cycle_graph(6),       # 2
    ]:
        g = _graph(spark, G)
        assert linkgraph.node_connectivity(g) == nx.node_connectivity(G), G


def test_node_connectivity_directed(spark):
    D = nx.cycle_graph(4, create_using=nx.DiGraph)
    g = _graph(spark, D, directed=True)
    assert linkgraph.node_connectivity(g) == nx.node_connectivity(D) == 1
    P = nx.path_graph(3, create_using=nx.DiGraph)
    assert linkgraph.node_connectivity(_graph(spark, P, directed=True)) == 0


def test_local_forms_still_work(spark):
    G = nx.petersen_graph()
    g = _graph(spark, G)
    assert linkgraph.edge_connectivity(g, 0, 5) == nx.edge_connectivity(G, 0, 5)
    with pytest.raises(ValueError):
        linkgraph.edge_connectivity(g, 0)  # half-specified
    with pytest.raises(ValueError):
        linkgraph.node_connectivity(g, t=3)


def test_stoer_wagner_weighted_parity(spark):
    rng = random.Random(4)
    for seed in [1, 2, 3]:
        G = nx.gnp_random_graph(14, 0.35, seed=seed)
        if not nx.is_connected(G):
            G = nx.compose(G, nx.path_graph(14))
        for u, v in G.edges():
            G[u][v]["weight"] = float(rng.randint(1, 10))
        e = spark.createDataFrame(
            [(int(u), int(v), float(d["weight"])) for u, v, d in G.edges(data=True)],
            "src long, dst long, weight double",
        )
        g = SparkGraph(e, directed=False)
        value, (part, rest) = linkgraph.stoer_wagner(g)
        want_value, _ = nx.stoer_wagner(G)
        assert value == pytest.approx(want_value), seed
        # returned partition realizes the returned value
        pset = set(part)
        assert pset | set(rest) == set(G.nodes()) and not pset & set(rest)
        cut = sum(
            d["weight"]
            for u, v, d in G.edges(data=True)
            if (u in pset) != (v in pset)
        )
        assert cut == pytest.approx(value)


def test_stoer_wagner_validation(spark):
    G = nx.path_graph(2)
    g = _graph(spark, G)
    assert linkgraph.stoer_wagner(g)[0] == 1.0
    import linkgraph.exceptions as ex

    with pytest.raises(ex.NetworkXError):
        linkgraph.stoer_wagner(_graph(spark, nx.path_graph(3), directed=True))
    with pytest.raises(ValueError):
        linkgraph.stoer_wagner(
            _graph(spark, nx.union(nx.path_graph(2), nx.path_graph([5, 6])))
        )
