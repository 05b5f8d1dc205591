"""Parity tests for bipartite projections vs networkx.bipartite."""

import networkx as nx
import pytest
from networkx.algorithms import bipartite as nxb
from pyspark.sql import functions as F

from linkgraph.graph import from_nx
from linkgraph.algos.bipartite import (
    projected_graph,
    weighted_projected_graph,
    overlap_weighted_projected_graph,
)


@pytest.fixture(scope="module")
def bip(spark):
    # bottom side 0..9, top side 100..105, seeded random bipartite
    G = nx.bipartite.random_graph(10, 6, 0.4, seed=7)
    # relabel top side to 100+ so side membership is obvious
    G = nx.relabel_nodes(G, {10 + i: 100 + i for i in range(6)})
    bottom = [n for n in G.nodes() if n < 100]
    return G, bottom


def _nodes_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _wedges(g):
    return {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}


def test_weighted_projection_parity(spark, bip):
    G, bottom = bip
    want = {
        (min(u, v), max(u, v)): float(d["weight"])
        for u, v, d in nxb.weighted_projected_graph(G, bottom).edges(data=True)
    }
    got = _wedges(weighted_projected_graph(from_nx(spark, G), _nodes_df(spark, bottom)))
    assert got == want


def test_unweighted_projection_parity(spark, bip):
    G, bottom = bip
    want = {tuple(sorted(e)) for e in nxb.projected_graph(G, bottom).edges()}
    got = set(_wedges(projected_graph(from_nx(spark, G), _nodes_df(spark, bottom))))
    assert got == want


def test_ratio_projection_parity(spark, bip):
    G, bottom = bip
    want = {
        (min(u, v), max(u, v)): d["weight"]
        for u, v, d in nxb.weighted_projected_graph(G, bottom, ratio=True).edges(data=True)
    }
    got = _wedges(
        weighted_projected_graph(from_nx(spark, G), _nodes_df(spark, bottom), ratio=True)
    )
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_overlap_projection_parity(spark, bip):
    G, bottom = bip
    want = {
        (min(u, v), max(u, v)): d["weight"]
        for u, v, d in nxb.overlap_weighted_projected_graph(G, bottom).edges(data=True)
    }
    got = _wedges(
        overlap_weighted_projected_graph(from_nx(spark, G), _nodes_df(spark, bottom))
    )
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_hub_cap_drops_quadratic_blowup(spark):
    G = nx.Graph()
    for i in range(6):
        G.add_edge(i, 100)        # hub order shared by all 6
    G.add_edge(0, 101); G.add_edge(1, 101)
    g = from_nx(spark, G)
    nodes = _nodes_df(spark, range(6))
    full = weighted_projected_graph(g, nodes)
    capped = weighted_projected_graph(g, nodes, max_opposite_degree=3)
    assert full.number_of_edges() == 15  # C(6,2)
    assert set(_wedges(capped)) == {(0, 1)}  # only the small co-occurrence survives
