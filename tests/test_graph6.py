"""graph6 codec byte-parity and round-trips vs the reference."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph
from linkgraph.io.graph6 import (
    from_graph6_bytes,
    to_graph6_bytes,
    read_graph6,
    write_graph6,
)


def _fixtures():
    return [
        nx.empty_graph(0),
        nx.empty_graph(1),
        nx.path_graph(5),
        nx.complete_graph(7),
        nx.petersen_graph(),
        nx.gnp_random_graph(30, 0.2, seed=8),
        nx.gnp_random_graph(70, 0.05, seed=9),  # n > 62: long N(n) form
    ]


def _edges(g):
    return {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g.edges.select("src", "dst").collect()
    }


def test_decode_matches_nx(spark):
    for G in _fixtures():
        data = nx.to_graph6_bytes(G)
        g = from_graph6_bytes(spark, data)
        assert g.number_of_nodes() == G.number_of_nodes()
        assert _edges(g) == {(min(u, v), max(u, v)) for u, v in G.edges()}


def test_encode_byte_parity_with_nx(spark):
    for G in _fixtures():
        e = spark.createDataFrame(
            [(int(u), int(v)) for u, v in G.edges()] or [(0, 0)],
            "src long, dst long",
        )
        if not G.edges():
            e = e.limit(0)
        g = SparkGraph(
            e,
            vertices=spark.createDataFrame(
                [(int(n),) for n in G.nodes()] or [(0,)], "id long"
            ).limit(G.number_of_nodes()),
            directed=False,
        )
        assert to_graph6_bytes(g) == nx.to_graph6_bytes(G)


def test_file_round_trip(spark, tmp_path):
    G = nx.petersen_graph()
    e = spark.createDataFrame(
        [(int(u), int(v)) for u, v in G.edges()], "src long, dst long"
    )
    g = SparkGraph(e, directed=False)
    p = str(tmp_path / "g.g6")
    write_graph6(g, p)
    back = read_graph6(spark, p)
    assert _edges(back) == _edges(g)
    H = nx.read_graph6(p)  # the reference can read our file
    assert {(min(u, v), max(u, v)) for u, v in H.edges()} == _edges(g)


def test_errors(spark):
    with pytest.raises(NetworkXError):
        from_graph6_bytes(spark, b"\x01\x02")
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(NetworkXError):
        to_graph6_bytes(SparkGraph(e, directed=True))
