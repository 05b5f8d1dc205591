"""Network-text rendering parity (``networkx/readwrite/text.py``)."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph as lg
from linkgraph.graph import from_nx

FIXTURES = [
    nx.balanced_tree(2, 3),
    nx.path_graph(6),
    nx.cycle_graph(5),
    nx.gnp_random_graph(10, 0.25, seed=3, directed=True),
    nx.gnp_random_graph(10, 0.25, seed=5),
    nx.disjoint_union(nx.path_graph(3), nx.star_graph(3)),
    nx.empty_graph(0),
]


@pytest.mark.parametrize("G", FIXTURES)
@pytest.mark.parametrize("ascii_only", [False, True])
def test_generate_network_text_parity(spark, G, ascii_only):
    g = from_nx(spark, G)
    got = list(lg.generate_network_text(g, ascii_only=ascii_only))
    want = list(nx.generate_network_text(G, ascii_only=ascii_only))
    assert got == want


@pytest.mark.parametrize("kwargs", [
    {"max_depth": 2}, {"max_depth": 0},
    {"vertical_chains": True}, {"sources": [0]},
])
def test_generate_network_text_options(spark, kwargs):
    G = nx.balanced_tree(2, 3)
    g = from_nx(spark, G)
    got = list(lg.generate_network_text(g, **kwargs))
    want = list(nx.generate_network_text(G, **kwargs))
    assert got == want


def test_write_network_text_file_and_callable(tmp_path, spark):
    G = nx.path_graph(4)
    g = from_nx(spark, G)
    p = str(tmp_path / "net.txt")
    lg.write_network_text(g, p)
    assert open(p).read().splitlines() == list(nx.generate_network_text(G))
    acc = []
    lg.write_network_text(g, acc.append, end="")
    assert acc == list(nx.generate_network_text(G))
