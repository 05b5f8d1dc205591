"""sparse6 codec byte-parity and round-trips vs the reference."""

from __future__ import annotations

from collections import Counter

import networkx as nx
import pytest

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph
from linkgraph.io.sparse6 import (
    from_sparse6_bytes,
    to_sparse6_bytes,
    read_sparse6,
    write_sparse6,
)


def _fixtures():
    out = [
        nx.empty_graph(0),
        nx.empty_graph(1),
        nx.path_graph(4),       # n = 4 = 2^k: the padding corner case
        nx.path_graph(5),
        nx.cycle_graph(8),      # n = 8 = 2^k
        nx.petersen_graph(),
        nx.gnp_random_graph(40, 0.08, seed=3),
        nx.gnp_random_graph(64, 0.05, seed=4),  # n = 64 = 2^k, k = 6
        nx.gnp_random_graph(70, 0.04, seed=5),  # long N(n) form
    ]
    loopy = nx.MultiGraph()
    loopy.add_edges_from([(0, 0), (0, 1), (0, 1), (1, 2)])  # loop + parallel
    out.append(loopy)
    return out


def _edge_multiset(g):
    return Counter(
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g.edges.select("src", "dst").collect()
    )


def test_decode_matches_nx(spark):
    for G in _fixtures():
        data = nx.to_sparse6_bytes(G)
        g = from_sparse6_bytes(spark, data)
        assert g.number_of_nodes() == G.number_of_nodes(), G
        want = Counter((min(u, v), max(u, v)) for u, v in G.edges())
        assert _edge_multiset(g) == want, G


def test_encode_byte_parity_with_nx(spark):
    for G in _fixtures():
        rows = [(int(u), int(v)) for u, v in G.edges()]
        e = spark.createDataFrame(rows or [(0, 0)], "src long, dst long")
        if not rows:
            e = e.limit(0)
        g = SparkGraph(
            e,
            vertices=spark.createDataFrame(
                [(int(n),) for n in G.nodes()] or [(0,)], "id long"
            ).limit(G.number_of_nodes()),
            directed=False,
            coalesce_edges=False,
        )
        assert to_sparse6_bytes(g) == nx.to_sparse6_bytes(G), G


def test_file_round_trip(spark, tmp_path):
    G = nx.gnp_random_graph(24, 0.15, seed=9)
    e = spark.createDataFrame(
        [(int(u), int(v)) for u, v in G.edges()], "src long, dst long"
    )
    g = SparkGraph(e, directed=False, coalesce_edges=False)
    p = str(tmp_path / "g.s6")
    write_sparse6(g, p)
    back = read_sparse6(spark, p)
    assert _edge_multiset(back) == _edge_multiset(g)
    H = nx.read_sparse6(p)  # the reference can read our file
    assert Counter(
        (min(u, v), max(u, v)) for u, v in H.edges()
    ) == _edge_multiset(g)


def test_errors(spark):
    with pytest.raises(NetworkXError):
        from_sparse6_bytes(spark, b"Cr")  # no colon
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(NetworkXError):
        to_sparse6_bytes(SparkGraph(e, directed=True))
