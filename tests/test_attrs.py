"""Node/edge attribute columns — the open-schema attr surface
(reference: per-element attr dicts, ``networkx/classes/graph.py:535-583,
917-985``; ``.data(attr, default=)`` views ``reportviews.py:118``;
``set_node_attributes``/``set_edge_attributes``
``networkx/classes/function.py:648,763``) mapped to typed DataFrame
columns per SURVEY §1.6."""

from __future__ import annotations

import os

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import SparkGraph
from linkgraph.algos.degrees import degrees, out_degrees
from linkgraph.io.graphml import read_graphml, write_graphml
from linkgraph.io.gml import read_gml, write_gml
from linkgraph.io.json_graph import node_link_data, node_link_graph


@pytest.fixture
def attr_graph(spark):
    e = spark.createDataFrame(
        [
            (1, 2, 1.0, 10, "road", True),
            (2, 3, 2.0, 20, "rail", False),
            (3, 1, 3.0, 30, "road", True),
            (3, 4, 4.0, 40, None, None),
        ],
        "src long, dst long, weight double, qty long, kind string, active boolean",
    )
    v = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5), (4, None, None)],
        "id long, name string, score double",
    )
    return SparkGraph(e, v, directed=False, coalesce_edges=False)


def test_edge_attrs_preserved_through_construction(attr_graph):
    assert attr_graph.edge_attr_names == ["qty", "kind", "active"]
    assert attr_graph.node_attr_names == ["name", "score"]
    # undirected canonicalization kept the attrs with the edge
    rows = {
        (r["src"], r["dst"]): (r["qty"], r["kind"])
        for r in attr_graph.edges.collect()
    }
    assert rows[(1, 3)] == (30, "road")  # 3->1 canonicalized, attrs intact


def test_symmetric_edges_carry_attrs(attr_graph):
    sym = attr_graph.symmetric_edges()
    assert "qty" in sym.columns
    back = {(r["src"], r["dst"]): r["qty"] for r in sym.collect()}
    assert back[(2, 1)] == 10 and back[(1, 2)] == 10


def test_edge_data_default(attr_graph):
    d = {(r["src"], r["dst"]): r["kind"]
         for r in attr_graph.edge_data("kind", default="unknown").collect()}
    assert d[(3, 4)] == "unknown" and d[(1, 2)] == "road"


def test_node_data_default(attr_graph):
    d = {r["id"]: r["name"]
         for r in attr_graph.node_data("name", default="?").collect()}
    assert d[4] == "?" and d[1] == "a"


def test_degrees_by_attr_column(attr_graph):
    # G.degree(weight="qty") parity vs the reference
    G = nx.Graph()
    G.add_nodes_from([1, 2, 3, 4])
    for u, v, q in [(1, 2, 10), (2, 3, 20), (3, 1, 30), (3, 4, 40)]:
        G.add_edge(u, v, qty=q)
    want = dict(G.degree(weight="qty"))
    got = {r["id"]: r["degree"]
           for r in degrees(attr_graph, weight="qty").collect()}
    assert got == want


def test_subgraph_view_node_attr_predicate(attr_graph):
    sub = attr_graph.subgraph_view(node_filter=F.col("score") > 2.0)
    ids = {r["id"] for r in sub.vertices.collect()}
    assert ids == {2, 3}
    edges = {(r["src"], r["dst"]) for r in sub.edges.collect()}
    assert edges == {(2, 3)}


def test_subgraph_view_edge_attr_predicate(attr_graph):
    sub = attr_graph.subgraph_view(edge_filter=F.col("kind") == "road")
    edges = {(r["src"], r["dst"]) for r in sub.edges.collect()}
    assert edges == {(1, 2), (1, 3)}


def test_with_node_and_edge_attrs(spark):
    g = SparkGraph(
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long"),
        directed=True,
    )
    g2 = g.with_node_attrs(
        spark.createDataFrame([(1, "x"), (2, "y")], "id long, tag string")
    )
    assert g2.node_attr_names == ["tag"]
    assert {r["id"]: r["tag"] for r in g2.vertices.collect()} == {
        1: "x", 2: "y", 3: None
    }
    g3 = g2.with_edge_attrs(
        spark.createDataFrame([(1, 2, 99)], "u long, v long, cap long")
    )
    caps = {(r["src"], r["dst"]): r["cap"] for r in g3.edges.collect()}
    assert caps == {(1, 2): 99, (2, 3): None}


def test_attrs_survive_subgraph_and_reverse(attr_graph):
    sub = attr_graph.subgraph(
        attr_graph.spark.createDataFrame([(1,), (2,), (3,)], "id long")
    )
    assert sub.edge_attr_names == ["qty", "kind", "active"]
    assert sub.node_attr_names == ["name", "score"]
    d = attr_graph.to_directed()
    assert d.edge_attr_names == ["qty", "kind", "active"]
    r = d.reverse()
    assert {(x["src"], x["dst"]): x["qty"] for x in r.edges.collect()}[(2, 1)] == 10


def _attr_tuples(g):
    return {
        (r["src"], r["dst"], r["weight"], r["qty"], r["kind"], r["active"])
        for r in g.edges.collect()
    }


def test_graphml_attr_roundtrip(attr_graph, tmp_path):
    p = os.path.join(tmp_path, "a.graphml")
    write_graphml(attr_graph, p)
    g2 = read_graphml(attr_graph.spark, p)
    assert _attr_tuples(g2) == _attr_tuples(attr_graph)
    names = {r["id"]: (r["name"], r["score"]) for r in g2.vertices.collect()}
    assert names[1] == ("a", 1.5) and names[4] == (None, None)


def test_graphml_nx_reads_our_attrs(attr_graph, tmp_path):
    p = os.path.join(tmp_path, "b.graphml")
    write_graphml(attr_graph, p)
    G = nx.read_graphml(p, node_type=int)
    assert G.edges[1, 2]["qty"] == 10
    assert G.edges[1, 2]["kind"] == "road"
    assert G.edges[1, 2]["active"] is True
    assert G.nodes[1]["name"] == "a"
    assert G.nodes[1]["score"] == 1.5


def test_graphml_string_escaping(spark, tmp_path):
    e = spark.createDataFrame(
        [(1, 2, 1.0, 'a<b>&"c"')], "src long, dst long, weight double, label string"
    )
    g = SparkGraph(e, directed=True, coalesce_edges=False)
    p = os.path.join(tmp_path, "esc.graphml")
    write_graphml(g, p)
    g2 = read_graphml(spark, p)
    assert g2.edges.collect()[0]["label"] == 'a<b>&"c"'
    G = nx.read_graphml(p, node_type=int)
    assert G.edges[1, 2]["label"] == 'a<b>&"c"'


def test_gml_attr_roundtrip(attr_graph, tmp_path):
    p = os.path.join(tmp_path, "a.gml")
    write_gml(attr_graph, p)
    g2 = read_gml(attr_graph.spark, p)
    got = {
        (r["src"], r["dst"]): (r["qty"], r["kind"])
        for r in g2.edges.collect()
    }
    assert got[(1, 2)] == (10, "road")
    assert got[(3, 4)] == (40, None)
    names = {r["id"]: r["name"] for r in g2.vertices.collect()}
    assert names[2] == "b" and names[4] is None


def test_gml_nx_reads_our_attrs(attr_graph, tmp_path):
    p = os.path.join(tmp_path, "b.gml")
    write_gml(attr_graph, p)
    G = nx.read_gml(p, label="id")
    assert G.edges[1, 2]["qty"] == 10
    assert G.edges[1, 2]["kind"] == "road"
    assert G.nodes[1]["name"] == "a"


def test_node_link_attr_roundtrip(attr_graph):
    data = node_link_data(attr_graph)
    assert data["links"][0]["qty"] == 10
    g2 = node_link_graph(attr_graph.spark, data)
    got = {
        (r["src"], r["dst"]): (r["qty"], r["kind"])
        for r in g2.edges.collect()
    }
    assert got[(1, 2)] == (10, "road") and got[(3, 4)] == (40, None)
    # and the reference can consume it
    G = nx.node_link_graph(data, edges="links")
    assert G.edges[1, 2]["qty"] == 10
    assert G.nodes[1]["name"] == "a"


def test_coalesce_edges_with_attrs(spark):
    e = spark.createDataFrame(
        [(1, 2, 1.0, "x"), (2, 1, 2.0, "y")],
        "src long, dst long, weight double, tag string",
    )
    g = SparkGraph(e, directed=False, coalesce_edges=True)
    row = g.edges.collect()[0]
    assert (row["src"], row["dst"], row["weight"], row["tag"]) == (1, 2, 3.0, "y")


def test_weighted_out_degree_by_attr(spark):
    e = spark.createDataFrame(
        [(1, 2, 5), (1, 3, 7), (2, 3, 1)], "src long, dst long, qty long"
    )
    g = SparkGraph(e, directed=True, coalesce_edges=False)
    got = {r["id"]: r["degree"] for r in out_degrees(g, weight="qty").collect()}
    assert got == {1: 12, 2: 1, 3: 0}
