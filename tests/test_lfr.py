"""LFR benchmark generator (``networkx/generators/community.py``)."""

import networkx as nx
import pytest

import linkgraph as lg
from linkgraph.exceptions import NetworkXError


def test_lfr_structure(spark):
    g = lg.LFR_benchmark_graph(
        spark, 120, 3, 1.5, 0.1, average_degree=5, max_degree=25,
        min_community=10, max_community=40, seed=10,
    )
    assert g.vertices.count() == 120
    comms = g.graph["communities"]
    # communities partition the node set
    all_nodes = sorted(v for c in comms for v in c)
    assert all_nodes == list(range(120))
    # mixing: most edges intra-community
    comm_of = {v: i for i, c in enumerate(comms) for v in c}
    rows = g.edges.select("src", "dst").collect()
    intra = sum(1 for r in rows if comm_of[r["src"]] == comm_of[r["dst"]])
    assert intra / len(rows) > 0.6
    # community column matches membership
    for r in g.vertices.select("id", "community").collect():
        assert r["id"] in comms[r["community"]]


def test_lfr_validation(spark):
    with pytest.raises(NetworkXError):
        lg.LFR_benchmark_graph(spark, 50, 1.0, 1.5, 0.1, average_degree=5)
    with pytest.raises(NetworkXError):
        lg.LFR_benchmark_graph(spark, 50, 3, 1.5, 1.5, average_degree=5)
    with pytest.raises(NetworkXError):
        lg.LFR_benchmark_graph(
            spark, 50, 3, 1.5, 0.1, average_degree=5, min_degree=2
        )
