"""Parity tests for quotient_graph, barycenter, connectivity probes
(networkx minors/contraction.py, distance_measures, components)."""

import networkx as nx
import pytest

from linkgraph.exceptions import NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.setops import quotient_graph
from linkgraph.algos.distance import barycenter
from linkgraph.algos.components import is_connected, is_weakly_connected
from linkgraph.algos.assortativity import (
    degree_assortativity_coefficient,
    degree_pearson_correlation_coefficient,
)


@pytest.mark.parametrize("directed", [False, True])
def test_quotient_graph(spark, directed):
    G = nx.gnp_random_graph(24, 0.2, seed=5, directed=directed)
    blocks = {v: v % 4 for v in G.nodes}
    partition = [{v for v in G.nodes if v % 4 == r} for r in range(4)]
    Q = nx.quotient_graph(G, partition)
    g = from_nx(spark, G)
    part = spark.createDataFrame(list(blocks.items()), "id bigint, block bigint")
    q = quotient_graph(g, part)
    got = {}
    for r in q.edges.select("src", "dst", "weight").collect():
        key = (r["src"], r["dst"]) if directed else (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        got[key] = r["weight"]
    want = {}
    idx = {frozenset(b): i for i, b in enumerate(partition)}
    for B, C, d in Q.edges(data=True):
        bu, bv = idx[frozenset(B)], idx[frozenset(C)]
        key = (bu, bv) if directed else (min(bu, bv), max(bu, bv))
        want[key] = d["weight"]
    assert got == pytest.approx(want)
    assert q.number_of_nodes() == Q.number_of_nodes()


def test_quotient_rejects_non_partition(spark):
    g = from_nx(spark, nx.path_graph(4))
    part = g.spark.createDataFrame([(0, 0), (1, 0)], "id bigint, block bigint")
    with pytest.raises(ValueError):
        quotient_graph(g, part)


def test_barycenter(spark):
    G = nx.gnp_random_graph(25, 0.2, seed=9)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    got = {r["id"] for r in barycenter(from_nx(spark, G)).collect()}
    assert got == set(nx.barycenter(G))
    disc = nx.disjoint_union(nx.path_graph(3), nx.path_graph(3))
    with pytest.raises(ValueError):
        barycenter(from_nx(spark, disc))


def test_connectivity_probes(spark):
    assert is_connected(from_nx(spark, nx.path_graph(5)))
    assert not is_connected(
        from_nx(spark, nx.disjoint_union(nx.path_graph(2), nx.path_graph(2)))
    )
    with pytest.raises(NotImplementedForDirected):
        is_connected(from_nx(spark, nx.DiGraph([(0, 1)])))
    D = nx.DiGraph([(0, 1), (2, 1)])
    assert is_weakly_connected(from_nx(spark, D)) == nx.is_weakly_connected(D)
    D.add_node(9)
    assert is_weakly_connected(from_nx(spark, D)) == nx.is_weakly_connected(D)
    with pytest.raises(ValueError):
        is_weakly_connected(from_nx(spark, nx.path_graph(3)))


def test_pearson_alias(spark):
    G = nx.gnp_random_graph(30, 0.15, seed=13)
    g = from_nx(spark, G)
    assert degree_pearson_correlation_coefficient(g) == pytest.approx(
        degree_assortativity_coefficient(g)
    )
