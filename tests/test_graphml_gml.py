"""GraphML / GML interop vs the reference reader/writer."""

from __future__ import annotations

import os

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.io.graphml import read_graphml, write_graphml
from linkgraph.io.gml import read_gml, write_gml


def _edge_set(g):
    return {
        (r["src"], r["dst"], r["weight"])
        for r in g.edges.select("src", "dst", "weight").collect()
    }


@pytest.fixture
def G():
    G = nx.gnp_random_graph(20, 0.2, seed=13)
    for u, v in G.edges():
        G[u][v]["weight"] = float((u * 3 + v) % 7 + 1)
    return G


def test_graphml_roundtrip(spark, tmp_path, G):
    g = from_nx(spark, G)
    p = os.path.join(tmp_path, "g.graphml")
    write_graphml(g, p)
    g2 = read_graphml(spark, p)
    assert _edge_set(g2) == _edge_set(g)
    assert g2.number_of_nodes() == g.number_of_nodes()
    assert g2.directed == g.directed


def test_graphml_nx_reads_ours(spark, tmp_path, G):
    g = from_nx(spark, G)
    p = os.path.join(tmp_path, "g.graphml")
    write_graphml(g, p)
    H = nx.read_graphml(p)
    assert {(int(u), int(v)) for u, v in H.edges()} == {
        (u, v) for u, v, _ in _edge_set(g)
    }
    assert {float(d["weight"]) for _, _, d in H.edges(data=True)} == {
        w for _, _, w in _edge_set(g)
    }


def test_graphml_reads_nx(spark, tmp_path, G):
    p = os.path.join(tmp_path, "nx.graphml")
    nx.write_graphml(G, p)
    g = read_graphml(spark, p)
    assert {(u, v) for u, v, _ in _edge_set(g)} == set(G.edges())


def test_gml_roundtrip_and_nx(spark, tmp_path, G):
    g = from_nx(spark, G)
    p = os.path.join(tmp_path, "g.gml")
    write_gml(g, p)
    g2 = read_gml(spark, p)
    assert _edge_set(g2) == _edge_set(g)
    H = nx.read_gml(p, label="id")
    assert {(int(u), int(v)) for u, v in H.edges()} == {
        (u, v) for u, v, _ in _edge_set(g)
    }
    # directed flag survives
    D = nx.cycle_graph(4, create_using=nx.DiGraph)
    gd = from_nx(spark, D)
    pd_ = os.path.join(tmp_path, "d.gml")
    write_gml(gd, pd_)
    assert read_gml(spark, pd_).directed is True


def test_gml_reads_nx(spark, tmp_path, G):
    p = os.path.join(tmp_path, "nx.gml")
    nx.write_gml(G, p)
    g = read_gml(spark, p)
    assert {(u, v) for u, v, _ in _edge_set(g)} == set(G.edges())
