"""Parity tests for number_of_walks, regular recognizers, and mixing
tables vs the reference (walks.py, regular.py, assortativity/mixing.py)."""

import networkx as nx
import numpy as np
import pytest

from linkgraph.exceptions import NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.walks import number_of_walks
from linkgraph.algos.degrees import is_regular, is_k_regular
from linkgraph.algos.assortativity import attribute_mixing, degree_mixing


def _nx_walks(G, k):
    """Dense replica of the reference (walks.py:9 computes A^k via scipy,
    absent in this container)."""
    nodes = list(G.nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for u, v in G.edges():
        A[idx[u], idx[v]] += 1
        if not G.is_directed() and u != v:
            A[idx[v], idx[u]] += 1
    P = np.linalg.matrix_power(A, k)
    return {
        (u, v): int(P[idx[u], idx[v]])
        for u in nodes
        for v in nodes
        if P[idx[u], idx[v]]
    }


@pytest.mark.parametrize("directed", [False, True])
@pytest.mark.parametrize("k", [1, 2, 3])
def test_number_of_walks(spark, directed, k):
    G = nx.gnp_random_graph(18, 0.2, seed=5, directed=directed)
    G.add_edge(0, 0)  # self-loop exercises the diagonal
    want = _nx_walks(G, k)
    got = {
        (r["src"], r["dst"]): r["walks"]
        for r in number_of_walks(from_nx(spark, G), k).collect()
    }
    assert got == want


def test_number_of_walks_zero_and_negative(spark):
    G = nx.path_graph(4)
    g = from_nx(spark, G)
    got = {(r["src"], r["dst"]): r["walks"] for r in number_of_walks(g, 0).collect()}
    assert got == {(v, v): 1 for v in G.nodes}
    with pytest.raises(ValueError):
        number_of_walks(g, -1)


def test_is_regular(spark):
    assert is_regular(from_nx(spark, nx.cycle_graph(6)))
    assert not is_regular(from_nx(spark, nx.path_graph(5)))
    D = nx.DiGraph([(1, 2), (2, 3), (3, 4), (4, 1)])
    assert is_regular(from_nx(spark, D)) == nx.is_regular(D)
    D.add_edge(1, 3)
    assert is_regular(from_nx(spark, D)) == nx.is_regular(D)


def test_is_k_regular(spark):
    G = nx.cycle_graph(7)
    assert is_k_regular(from_nx(spark, G), 2) == nx.is_k_regular(G, 2)
    assert is_k_regular(from_nx(spark, G), 3) == nx.is_k_regular(G, 3)
    with pytest.raises(NotImplementedForDirected):
        is_k_regular(from_nx(spark, nx.DiGraph([(0, 1)])), 1)


@pytest.mark.parametrize("directed", [False, True])
def test_attribute_mixing(spark, directed):
    G = nx.gnp_random_graph(20, 0.15, seed=9, directed=directed)
    for v in G.nodes:
        G.nodes[v]["color"] = ["red", "blue", "green"][v % 3]
    want = nx.attribute_mixing_dict(G, "color")

    def _g():
        attrs = spark.createDataFrame(
            [(int(v), G.nodes[v]["color"]) for v in G.nodes], "id bigint, color string"
        )
        return from_nx(spark, G).with_node_attrs(attrs)

    got = {}
    for r in attribute_mixing(_g(), "color").collect():
        got.setdefault(r["x"], {})[r["y"]] = r["n"]
    want = {x: {y: c for y, c in d.items() if c} for x, d in want.items()}
    want = {x: d for x, d in want.items() if d}
    assert got == want
    # normalized: joint probabilities sum to 1
    p = attribute_mixing(_g(), "color", normalized=True)
    from pyspark.sql import functions as F

    assert p.agg(F.sum("p")).first()[0] == pytest.approx(1.0)
    want_n = nx.attribute_mixing_dict(G, "color", normalized=True)
    for r in p.collect():
        assert r["p"] == pytest.approx(want_n[r["x"]][r["y"]])


@pytest.mark.parametrize("directed", [False, True])
def test_degree_mixing(spark, directed):
    G = nx.gnp_random_graph(20, 0.18, seed=13, directed=directed)
    want = nx.degree_mixing_dict(G)
    got = {}
    for r in degree_mixing(from_nx(spark, G)).collect():
        got.setdefault(r["x"], {})[r["y"]] = r["n"]
    want = {x: {y: c for y, c in d.items() if c} for x, d in want.items()}
    want = {x: d for x, d in want.items() if d}
    assert got == want


def test_degree_mixing_weighted(spark):
    G = nx.gnp_random_graph(16, 0.2, seed=17)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = 1.0 + (i % 3)
    want = nx.degree_mixing_dict(G, weight="weight")
    got = {}
    for r in degree_mixing(from_nx(spark, G), weight="weight").collect():
        got.setdefault(r["x"], {})[r["y"]] = r["n"]
    want = {x: {y: c for y, c in d.items() if c} for x, d in want.items()}
    want = {x: d for x, d in want.items() if d}
    assert got == want
