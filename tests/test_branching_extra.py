"""maximum/minimum branching parity vs the reference Edmonds kernel."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import SparkGraph
from linkgraph.algos.branchings import maximum_branching, minimum_branching


def _digraph(seed):
    G = nx.gnp_random_graph(10, 0.3, seed=seed, directed=True)
    H = nx.DiGraph()
    H.add_nodes_from(G.nodes())
    for i, (u, v) in enumerate(sorted(G.edges())):
        # mixed signs, no zero weights (zero-weight arcs are tie-ambiguous)
        H.add_edge(u, v, weight=float(((u * 7 + v * 11 + i) % 9) - 4) or 1.0)
    return H


def _to_spark(spark, G):
    e = spark.createDataFrame(
        [(u, v, float(d["weight"])) for u, v, d in G.edges(data=True)],
        "src long, dst long, weight double",
    )
    v = spark.createDataFrame([(n,) for n in G.nodes()], "id long")
    return SparkGraph(e, v, directed=True, coalesce_edges=False)


def _check_branching(G, rows):
    indeg: dict = {}
    B = nx.DiGraph()
    for r in rows:
        assert G.has_edge(r["src"], r["dst"])
        indeg[r["dst"]] = indeg.get(r["dst"], 0) + 1
        assert indeg[r["dst"]] <= 1
        B.add_edge(r["src"], r["dst"])
    assert nx.is_forest(B) or B.number_of_edges() == 0


@pytest.mark.parametrize("seed", [2, 8, 21])
def test_maximum_branching_parity(spark, seed):
    G = _digraph(seed)
    g = _to_spark(spark, G)
    want = nx.maximum_branching(G).size(weight="weight")
    rows = maximum_branching(g).collect()
    _check_branching(G, rows)
    got = sum(r["weight"] for r in rows)
    assert got == pytest.approx(want)


@pytest.mark.parametrize("seed", [5, 13])
def test_minimum_branching_parity(spark, seed):
    G = _digraph(seed)
    g = _to_spark(spark, G)
    want = nx.minimum_branching(G).size(weight="weight")
    rows = minimum_branching(g).collect()
    _check_branching(G, rows)
    got = sum(r["weight"] for r in rows)
    assert got == pytest.approx(want)
