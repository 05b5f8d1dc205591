"""LEDA.GRAPH parse parity vs the reference."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.exceptions import NetworkXError
from linkgraph.io.leda import parse_leda, read_leda

SAMPLE = """#header section
LEDA.GRAPH
string
int
-1
#nodes section
5
|{v1}|
|{v2}|
|{v3}|
|{v4}|
|{v5}|

#edges section
7
1 2 0 |{4}|
1 3 0 |{3}|
2 3 0 |{2}|
3 4 0 |{3}|
3 5 0 |{7}|
4 5 0 |{6}|
5 1 0 |{foo}|
"""


def _as_label_edges(g):
    labels = {r["id"]: r["label"] for r in g.vertices.collect()}
    return {
        (labels[r["src"]], labels[r["dst"]], r["label"])
        for r in g.edges.select("src", "dst", "label").collect()
    }, set(labels.values())


def test_parse_matches_nx(spark):
    g = parse_leda(spark, SAMPLE)
    G = nx.parse_leda(SAMPLE)
    assert g.directed == G.is_directed() is True
    edges, nodes = _as_label_edges(g)
    assert nodes == set(G.nodes())
    assert edges == {(u, v, d["label"]) for u, v, d in G.edges(data=True)}


def test_undirected_and_file(spark, tmp_path):
    text = SAMPLE.replace("-1", "-2")
    g = parse_leda(spark, text)
    G = nx.parse_leda(text)
    assert g.directed is False and not G.is_directed()
    p = tmp_path / "g.leda"
    p.write_text(text)
    g2 = read_leda(spark, str(p))
    assert g2.number_of_nodes() == 5 and g2.number_of_edges() == 7


def test_invalid_raises(spark):
    with pytest.raises(NetworkXError):
        parse_leda(spark, "NOT.LEDA\nstring\nint\n-1\n0\n0\n")
    with pytest.raises(NetworkXError):
        parse_leda(spark, "LEDA.GRAPH\nstring\nint\n-1\n2\n|{a}|\n|{b}|\n1\n1 2\n")
