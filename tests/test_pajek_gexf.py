"""Pajek / GEXF interop vs the reference reader/writer."""

from __future__ import annotations

import os

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.io.pajek import read_pajek, write_pajek
from linkgraph.io.gexf import read_gexf, write_gexf


@pytest.fixture
def G():
    G = nx.gnp_random_graph(15, 0.25, seed=17)
    for u, v in G.edges():
        G[u][v]["weight"] = float((u + 2 * v) % 5 + 1)
    return G


def _edge_set(g):
    return {
        (r["src"], r["dst"], r["weight"])
        for r in g.edges.select("src", "dst", "weight").collect()
    }


def test_pajek_roundtrip(spark, tmp_path, G):
    g = from_nx(spark, G)
    p = os.path.join(tmp_path, "g.net")
    write_pajek(g, p)
    g2 = read_pajek(spark, p)
    assert _edge_set(g2) == _edge_set(g)
    assert g2.number_of_nodes() == g.number_of_nodes()
    assert g2.directed == g.directed


def test_pajek_nx_reads_ours(spark, tmp_path, G):
    g = from_nx(spark, G)
    p = os.path.join(tmp_path, "h.net")
    write_pajek(g, p)
    H = nx.read_pajek(p)
    H = nx.relabel_nodes(nx.Graph(H), int)
    assert {frozenset((u, v)) for u, v in H.edges()} == {
        frozenset((u, v)) for u, v in G.edges()
    }
    assert all(
        H[u][v]["weight"] == G[u][v]["weight"] for u, v in G.edges()
    )


def test_pajek_reads_nx_file(spark, tmp_path, G):
    p = os.path.join(tmp_path, "nx.net")
    nx.write_pajek(G, p)
    g = read_pajek(spark, p)
    assert g.number_of_edges() == G.number_of_edges()
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == {(min(u, v), max(u, v)) for u, v in G.edges()}


def test_pajek_directed(spark, tmp_path):
    G = nx.gnp_random_graph(10, 0.3, seed=2, directed=True)
    g = from_nx(spark, G)
    p = os.path.join(tmp_path, "d.net")
    write_pajek(g, p)
    g2 = read_pajek(spark, p)
    assert g2.directed
    got = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert got == set(G.edges())


def test_gexf_roundtrip(spark, tmp_path, G):
    g = from_nx(spark, G)
    p = os.path.join(tmp_path, "g.gexf")
    write_gexf(g, p)
    g2 = read_gexf(spark, p)
    assert _edge_set(g2) == _edge_set(g)
    assert g2.number_of_nodes() == g.number_of_nodes()


def test_gexf_nx_reads_ours(spark, tmp_path, G):
    g = from_nx(spark, G)
    p = os.path.join(tmp_path, "h.gexf")
    write_gexf(g, p)
    H = nx.read_gexf(p, node_type=int)
    assert {frozenset((u, v)) for u, v in H.edges()} == {
        frozenset((u, v)) for u, v in G.edges()
    }


def test_gexf_reads_nx_file(spark, tmp_path, G):
    p = os.path.join(tmp_path, "nx.gexf")
    nx.write_gexf(G, p)
    g = read_gexf(spark, p)
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == {(min(u, v), max(u, v)) for u, v in G.edges()}
