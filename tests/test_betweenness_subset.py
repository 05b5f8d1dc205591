"""Subset betweenness parity vs networkx betweenness_subset."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import SparkGraph
from linkgraph.algos.betweenness import (
    betweenness_centrality_subset,
    edge_betweenness_centrality_subset,
)


def _to_spark(spark, G):
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in G.edges()], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(n,) for n in G.nodes()], "id long")
    return SparkGraph(e, v, directed=G.is_directed(), coalesce_edges=False)


@pytest.mark.parametrize("normalized", [False, True])
def test_subset_betweenness_cycle(spark, normalized):
    G = nx.cycle_graph(6)
    g = _to_spark(spark, G)
    want = nx.betweenness_centrality_subset(
        G, [0, 1], [3, 4], normalized=normalized
    )
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality_subset(
            g, [0, 1], [3, 4], normalized=normalized
        ).collect()
    }
    assert got == pytest.approx(want)


def test_subset_betweenness_directed(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)])
    g = _to_spark(spark, G)
    want = nx.betweenness_centrality_subset(G, [0], [3])
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality_subset(g, [0], [3]).collect()
    }
    assert got == pytest.approx(want)


@pytest.mark.parametrize("seed", [4, 19])
def test_subset_betweenness_gnp(spark, seed):
    G = nx.gnp_random_graph(11, 0.3, seed=seed)
    g = _to_spark(spark, G)
    srcs, tgts = [0, 1, 2], [8, 9, 10]
    want = nx.betweenness_centrality_subset(G, srcs, tgts)
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality_subset(g, srcs, tgts).collect()
    }
    assert got == pytest.approx(want, abs=1e-9)


def test_edge_subset_betweenness(spark):
    G = nx.cycle_graph(6)
    g = _to_spark(spark, G)
    want = dict(nx.edge_betweenness_centrality_subset(G, [0, 1], [3, 4]))
    got = {
        (r["u"], r["v"]): r["betweenness"]
        for r in edge_betweenness_centrality_subset(g, [0, 1], [3, 4]).collect()
        if r["betweenness"] > 0
    }
    want = {
        (min(u, v), max(u, v)): w for (u, v), w in want.items() if w > 0
    }
    assert got == pytest.approx(want)
