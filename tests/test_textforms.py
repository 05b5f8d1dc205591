"""parse_*/generate_* text-form round trips."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph.io.textforms as tf
from linkgraph.graph import SparkGraph


def _g(spark):
    e = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0), (0, 3, 1.0)],
        "src long, dst long, weight double",
    )
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")  # 4 isolated
    return SparkGraph(e, v, directed=False, coalesce_edges=False)


def _edge_set(g):
    return {
        (r["src"], r["dst"], r["weight"])
        for r in g.edges.select("src", "dst", "weight").collect()
    }


def test_edgelist_lines_roundtrip(spark):
    g = _g(spark)
    lines = tf.generate_edgelist(g)
    assert len(lines) == 3
    g2 = tf.parse_edgelist(spark, lines)
    # unweighted parse: edge set matches
    assert {(a, b) for a, b, _ in _edge_set(g2)} == {
        (a, b) for a, b, _ in _edge_set(g)
    }


def test_adjlist_lines_roundtrip(spark):
    g = _g(spark)
    lines = tf.generate_adjlist(g)
    g2 = tf.parse_adjlist(spark, lines)
    assert {(a, b) for a, b, _ in _edge_set(g2)} == {
        (a, b) for a, b, _ in _edge_set(g)
    }
    assert g2.number_of_nodes() == g.number_of_nodes()


def test_gml_lines_roundtrip(spark):
    g = _g(spark)
    lines = tf.generate_gml(g)
    assert any("graph" in ln for ln in lines)
    g2 = tf.parse_gml(spark, lines)
    assert _edge_set(g2) == _edge_set(g)


def test_graphml_lines_roundtrip(spark):
    g = _g(spark)
    lines = tf.generate_graphml(g)
    g2 = tf.parse_graphml(spark, "\n".join(lines))
    assert _edge_set(g2) == _edge_set(g)


def test_pajek_lines_roundtrip(spark):
    g = _g(spark)
    lines = tf.generate_pajek(g)
    g2 = tf.parse_pajek(spark, lines)
    assert {(a, b) for a, b, _ in _edge_set(g2)} == {
        (a, b) for a, b, _ in _edge_set(g)
    }


def test_multiline_adjlist_roundtrip_and_nx_parity(spark, tmp_path):
    g = _g(spark)
    lines = tf.generate_multiline_adjlist(g)
    g2 = tf.parse_multiline_adjlist(spark, lines)
    assert {(a, b) for a, b, _ in _edge_set(g2)} == {
        (a, b) for a, b, _ in _edge_set(g)
    }
    assert g2.number_of_nodes() == 5
    # nx can read what we write
    p = tmp_path / "ml.adjlist"
    p.write_text("\n".join(lines) + "\n")
    W = nx.read_multiline_adjlist(str(p), nodetype=int)
    assert sorted(map(tuple, map(sorted, W.edges()))) == sorted(
        (a, b) for a, b, _ in _edge_set(g)
    )
    assert W.number_of_nodes() == 5


def test_write_weighted_edgelist(spark, tmp_path):
    g = _g(spark)
    tf.write_weighted_edgelist(g, str(tmp_path / "w"))
    from linkgraph.io.edgelist import read_weighted_edgelist

    g2 = read_weighted_edgelist(spark, str(tmp_path / "w"))
    assert _edge_set(g2) == _edge_set(g)


def test_write_graphml_aliases(spark, tmp_path):
    g = _g(spark)
    tf.write_graphml_xml(g, str(tmp_path / "a.graphml"))
    tf.write_graphml_lxml(g, str(tmp_path / "b.graphml"))
    from linkgraph.io.graphml import read_graphml

    for name in ("a.graphml", "b.graphml"):
        g2 = read_graphml(spark, str(tmp_path / name))
        assert _edge_set(g2) == _edge_set(g)
