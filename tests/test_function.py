"""Functional utility surface parity (networkx/classes/function.py)."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

import linkgraph.function as fn
from linkgraph.graph import SparkGraph
from linkgraph.exceptions import NetworkXError


def _G():
    G = nx.gnp_random_graph(10, 0.35, seed=4)
    for i, (u, v) in enumerate(sorted(G.edges())):
        G[u][v]["weight"] = float(i % 4 + 1)
    return G


def _to_spark(spark, G, directed=None):
    directed = G.is_directed() if directed is None else directed
    rows = [(u, v, float(d.get("weight", 1.0))) for u, v, d in G.edges(data=True)]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    v = spark.createDataFrame([(n,) for n in G.nodes()], "id long")
    return SparkGraph(e, v, directed=directed, coalesce_edges=False)


def test_counts_and_density(spark):
    G = _G()
    g = _to_spark(spark, G)
    assert fn.number_of_nodes(g) == G.number_of_nodes()
    assert fn.number_of_edges(g) == G.number_of_edges()
    assert fn.density(g) == pytest.approx(nx.density(G))
    assert fn.is_directed(g) is False
    assert fn.is_empty(g) is False
    assert fn.is_empty(fn.create_empty_copy(g)) is True
    assert fn.create_empty_copy(g).number_of_nodes() == G.number_of_nodes()


def test_neighbors_family(spark):
    G = nx.DiGraph([(0, 1), (0, 2), (3, 0), (1, 2)])
    g = _to_spark(spark, G)
    assert [r["id"] for r in fn.neighbors(g, 0).collect()] == [1, 2]
    assert [r["id"] for r in fn.all_neighbors(g, 0).collect()] == sorted(
        set(nx.all_neighbors(G, 0))
    )
    assert [r["id"] for r in fn.non_neighbors(g, 0).collect()] == sorted(
        nx.non_neighbors(G, 0)
    )
    got_cn = sorted(
        r["id"] for r in fn.common_neighbors(g.to_undirected(), 0, 1).collect()
    )
    assert got_cn == sorted(nx.common_neighbors(G.to_undirected(), 0, 1))


def test_degree_functional(spark):
    G = _G()
    g = _to_spark(spark, G)
    got = {r["id"]: r["degree"] for r in fn.degree(g).collect()}
    assert got == dict(G.degree())
    got_w = {r["id"]: r["degree"] for r in fn.degree(g, weight="weight").collect()}
    assert got_w == pytest.approx(dict(G.degree(weight="weight")))
    got_nb = {r["id"]: r["degree"] for r in fn.degree(g, nbunch=[0, 1]).collect()}
    assert got_nb == dict(G.degree([0, 1]))


def test_add_star_path_cycle(spark):
    G = nx.Graph()
    G.add_nodes_from(range(6))
    g = _to_spark(spark, G)
    H = nx.Graph()
    H.add_nodes_from(range(6))

    g2 = fn.add_star(g, [0, 1, 2, 3])
    nx.add_star(H, [0, 1, 2, 3])
    assert g2.number_of_edges() == H.number_of_edges()

    g3 = fn.add_path(g2, [3, 4, 5])
    nx.add_path(H, [3, 4, 5])
    assert g3.number_of_edges() == H.number_of_edges()

    g4 = fn.add_cycle(g3, [0, 4, 5])
    nx.add_cycle(H, [0, 4, 5])
    assert g4.number_of_edges() == H.number_of_edges()
    got = {(r["src"], r["dst"]) for r in g4.edges.select("src", "dst").collect()}
    want = {(min(u, v), max(u, v)) for u, v in H.edges()}
    assert got == want


def test_selfloops_and_isolates(spark):
    G = nx.Graph([(0, 0), (1, 2)])
    G.add_node(5)
    g = _to_spark(spark, G)
    assert fn.number_of_selfloops(g) == 1
    assert [r["id"] for r in fn.nodes_with_selfloops(g).collect()] == [0]
    assert fn.number_of_isolates(g) == 1
    assert fn.is_isolate(g, 5) is True
    assert fn.is_isolate(g, 1) is False


def test_weight_predicates(spark):
    G = _G()
    g = _to_spark(spark, G)
    assert fn.is_weighted(g) is True
    assert fn.is_negatively_weighted(g) is False
    Gneg = nx.DiGraph()
    Gneg.add_edge(0, 1, weight=-2.0)
    gneg = _to_spark(spark, Gneg)
    assert fn.is_negatively_weighted(gneg) is True
    assert fn.is_negatively_weighted(gneg, edge=(0, 1)) is True
    with pytest.raises(NetworkXError):
        fn.is_negatively_weighted(gneg, edge=(0, 5))


def test_node_attributes_roundtrip(spark):
    G = _G()
    g = _to_spark(spark, G)
    g2 = fn.set_node_attributes(g, {0: "a", 3: "b"}, name="tag")
    got = {r["id"]: r["tag"] for r in fn.get_node_attributes(g2, "tag").collect()}
    assert got == {0: "a", 3: "b"}
    # scalar broadcast + default fill
    g3 = fn.set_node_attributes(g, 7, name="k")
    got3 = {r["id"]: r["k"] for r in fn.get_node_attributes(g3, "k").collect()}
    assert set(got3.values()) == {7}
    # default on missing attribute
    got4 = {
        r["id"]: r["absent"]
        for r in fn.get_node_attributes(g, "absent", default=1).collect()
    }
    assert set(got4.values()) == {1}
    g5 = fn.remove_node_attributes(g2, "tag")
    assert "tag" not in g5.vertices.columns


def test_edge_attributes_roundtrip(spark):
    G = _G()
    g = _to_spark(spark, G)
    some = sorted(G.edges())[:3]
    g2 = fn.set_edge_attributes(
        g, {e: i for i, e in enumerate(some)}, name="rank"
    )
    got = {
        (r["src"], r["dst"]): r["rank"]
        for r in fn.get_edge_attributes(g2, "rank").collect()
    }
    assert got == {(min(u, v), max(u, v)): i for i, (u, v) in enumerate(some)}
    g3 = fn.remove_edge_attributes(g2, "rank")
    assert "rank" not in g3.edges.columns


def test_freeze(spark):
    g = _to_spark(spark, _G())
    assert fn.is_frozen(g) is False
    g = fn.freeze(g)
    assert fn.is_frozen(g) is True


def test_equivalence_classes():
    got = fn.equivalence_classes(range(10), lambda a, b: a % 3 == b % 3)
    want = nx.equivalence_classes(range(10), lambda a, b: a % 3 == b % 3)
    assert got == want


def test_edges_nbunch(spark):
    G = _G()
    g = _to_spark(spark, G)
    got = {
        (r["src"], r["dst"]) for r in fn.edges(g, [0, 1]).select("src", "dst").collect()
    }
    want = {(min(u, v), max(u, v)) for u, v in G.edges([0, 1])}
    assert got == want


def test_subgraph_functional(spark):
    G = _G()
    g = _to_spark(spark, G)
    sub = fn.subgraph(g, [0, 1, 2, 3, 4])
    H = G.subgraph([0, 1, 2, 3, 4])
    assert sub.number_of_nodes() == H.number_of_nodes()
    assert sub.number_of_edges() == H.number_of_edges()
