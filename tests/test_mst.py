"""Parity tests for Boruvka minimum/maximum spanning forest."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import from_nx
from linkgraph.algos.mst import (
    minimum_spanning_edges,
    minimum_spanning_tree,
    maximum_spanning_tree,
)


def _weighted_gnp(n, p, seed):
    G = nx.gnp_random_graph(n, p, seed=seed)
    rng = __import__("random").Random(seed)
    # distinct weights -> unique MST -> exact edge-set parity
    ws = rng.sample(range(1, 10 * G.number_of_edges() + 1), G.number_of_edges())
    for w, (u, v) in zip(ws, G.edges()):
        G[u][v]["weight"] = float(w)
    return G


def _edge_set(df):
    return {(r["src"], r["dst"], r["weight"]) for r in df.collect()}


def test_mst_exact_parity_distinct_weights(spark):
    G = _weighted_gnp(40, 0.15, seed=3)
    want = {
        (min(u, v), max(u, v), d["weight"])
        for u, v, d in nx.minimum_spanning_edges(G, algorithm="boruvka", data=True)
    }
    got = _edge_set(minimum_spanning_edges(from_nx(spark, G)))
    assert got == want


def test_mst_forest_disconnected(spark):
    G = nx.Graph()
    G.add_weighted_edges_from([(0, 1, 2.0), (1, 2, 1.0), (0, 2, 3.0)])
    G.add_weighted_edges_from([(10, 11, 5.0), (11, 12, 4.0), (10, 12, 6.0)])
    G.add_node(99)  # isolate: stays a zero-edge tree
    got = _edge_set(minimum_spanning_edges(from_nx(spark, G)))
    assert got == {(0, 1, 2.0), (1, 2, 1.0), (10, 11, 5.0), (11, 12, 4.0)}
    t = minimum_spanning_tree(from_nx(spark, G))
    assert t.number_of_nodes() == 7 and t.number_of_edges() == 4


def test_mst_total_weight_with_ties(spark):
    # ties -> edge sets may differ; total weight and size must match
    G = nx.karate_club_graph()
    for u, v in G.edges():
        G[u][v]["weight"] = float((u + v) % 5 + 1)
    want = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(G, data=True)
    )
    df = minimum_spanning_edges(from_nx(spark, G))
    rows = df.collect()
    assert len(rows) == G.number_of_nodes() - 1
    assert sum(r["weight"] for r in rows) == pytest.approx(want)


def test_maximum_spanning_tree(spark):
    G = _weighted_gnp(25, 0.2, seed=9)
    want = {
        (min(u, v), max(u, v), d["weight"])
        for u, v, d in nx.maximum_spanning_edges(G, algorithm="boruvka", data=True)
    }
    got = _edge_set(maximum_spanning_tree(from_nx(spark, G)).edges)
    assert got == want
