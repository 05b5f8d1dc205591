"""Weight-expression surface (SURVEY §2.L row 84): a SQL expression /
Column for ``weight=`` matches the reference's ``weight=callable
(u, v, d) -> float`` adapter (weighted.py:41-79) on the same fixture."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import from_nx, resolve_weight_column
from linkgraph.algos.sssp import (
    weighted_shortest_path_lengths,
    shortest_path_length,
)
from linkgraph.algos.mst import minimum_spanning_edges
from linkgraph.algos.flow import maximum_flow_value


def _wgraph(seed=3, n=16, p=0.25, directed=False):
    G = nx.gnp_random_graph(n, p, seed=seed, directed=directed)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = float((u * 5 + v * 3 + i) % 7 + 1)
    return G


@pytest.mark.parametrize("directed", [False, True])
def test_sssp_weight_expression(spark, directed):
    G = _wgraph(directed=directed)
    g = from_nx(spark, G)
    got = {
        r["id"]: r["distance"]
        for r in weighted_shortest_path_lengths(
            g, [0], weight=F.col("weight") * 2 + 1
        ).collect()
    }
    want = nx.single_source_dijkstra_path_length(
        G, 0, weight=lambda u, v, d: d["weight"] * 2 + 1
    )
    assert got == pytest.approx(want)
    # SQL-string form and generic dispatch agree
    got2 = {
        r["id"]: r["distance"]
        for r in shortest_path_length(g, [0], weight="weight * 2 + 1").collect()
    }
    assert got2 == pytest.approx(want)


def test_mst_weight_expression(spark):
    G = _wgraph(seed=9, n=20)
    g = from_nx(spark, G)
    got = sorted(
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in minimum_spanning_edges(g, weight="10 - weight").collect()
    )
    H = G.copy()
    for u, v in H.edges():
        H[u][v]["weight"] = 10 - H[u][v]["weight"]
    want = sorted(
        (min(u, v), max(u, v)) for u, v, _ in nx.minimum_spanning_edges(H)
    )
    assert got == want


def test_flow_capacity_expression(spark):
    G = nx.gnp_random_graph(14, 0.3, seed=5, directed=True)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = float((u + 2 * v + i) % 5 + 1)
    g = from_nx(spark, G)
    got = maximum_flow_value(g, 0, 13, capacity=F.col("weight") + 1)
    H = G.copy()
    for u, v in H.edges():
        H[u][v]["capacity"] = H[u][v]["weight"] + 1
    assert got == nx.maximum_flow_value(H, 0, 13)


def test_resolver_errors(spark):
    g = from_nx(spark, nx.path_graph(3))
    with pytest.raises(TypeError, match="weight must be"):
        resolve_weight_column(g.edges, 3.5)
