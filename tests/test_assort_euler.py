"""Parity tests for attribute/numeric assortativity and eulerian checks."""

import math

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.assortativity import (
    attribute_assortativity_coefficient,
    numeric_assortativity_coefficient,
)
from linkgraph.algos.cycles import is_eulerian, has_eulerian_path


def _with_attr(G, fn, name="grp"):
    for n in G.nodes():
        G.nodes[n][name] = fn(n)
    return G


def _g_attr(spark, G, name, vals):
    g = from_nx(spark, G)
    attrs = spark.createDataFrame(
        [(int(n), v) for n, v in vals.items()], f"id long, {name} string"
    )
    return g.with_node_attrs(attrs)


def test_attribute_assortativity(spark):
    G = nx.gnp_random_graph(40, 0.12, seed=3)
    vals = {n: str(n % 3) for n in G.nodes()}
    _with_attr(G, lambda n: str(n % 3))
    want = nx.attribute_assortativity_coefficient(G, "grp")
    got = attribute_assortativity_coefficient(
        _g_attr(spark, G, "grp", vals), "grp"
    )
    assert got == pytest.approx(want, abs=1e-9)


def test_attribute_assortativity_directed(spark):
    G = nx.gnp_random_graph(30, 0.1, seed=7, directed=True)
    vals = {n: "ab"[n % 2] for n in G.nodes()}
    _with_attr(G, lambda n: "ab"[n % 2])
    want = nx.attribute_assortativity_coefficient(G, "grp")
    got = attribute_assortativity_coefficient(
        _g_attr(spark, G, "grp", vals), "grp"
    )
    assert got == pytest.approx(want, abs=1e-9)


def test_numeric_assortativity(spark):
    G = nx.gnp_random_graph(40, 0.12, seed=11)
    vals = {n: float((n * 7) % 5 + 1) for n in G.nodes()}
    for n, v in vals.items():
        G.nodes[n]["size"] = v
    want = nx.numeric_assortativity_coefficient(G, "size")
    g = from_nx(spark, G)
    attrs = spark.sparkContext.parallelize(
        [(int(n), v) for n, v in vals.items()]
    ).toDF(["id", "size"])
    got = numeric_assortativity_coefficient(g.with_node_attrs(attrs), "size")
    assert got == pytest.approx(want, abs=1e-9)


@pytest.mark.parametrize(
    "G,want",
    [
        (nx.cycle_graph(6), True),
        (nx.path_graph(5), False),
        (nx.complete_graph(5), True),  # all degrees 4, connected
        (nx.Graph([(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]), False),
    ],
)
def test_is_eulerian(spark, G, want):
    assert is_eulerian(from_nx(spark, G)) is want
    assert nx.is_eulerian(G) is want


def test_is_eulerian_directed(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    assert is_eulerian(from_nx(spark, G)) is True
    G2 = nx.DiGraph([(0, 1), (1, 2)])
    assert is_eulerian(from_nx(spark, G2)) is False


@pytest.mark.parametrize(
    "edges,directed",
    [
        ([(0, 1), (1, 2), (2, 3)], False),           # path: 2 odd -> True
        ([(0, 1), (1, 2), (2, 0)], False),           # cycle -> eulerian
        ([(0, 1), (1, 2), (2, 0), (0, 3), (3, 4)], False),
        ([(0, 1), (2, 3)], False),                   # disconnected
        ([(0, 1), (1, 2)], True),                    # directed path
        ([(0, 1), (1, 2), (2, 0), (0, 3)], True),
    ],
)
def test_has_eulerian_path(spark, edges, directed):
    G = nx.DiGraph(edges) if directed else nx.Graph(edges)
    assert has_eulerian_path(from_nx(spark, G)) is nx.has_eulerian_path(G)


def _lap_want(G, normalized=True):
    """Pure-python replica of the reference definition (no scipy in the
    container): energy = tr(L^2) via numpy on the dense Laplacian, node
    removal = row/col deletion (laplacian.py:12 semantics)."""
    import numpy as np

    nodes = list(G.nodes())
    A = nx.to_numpy_array(G, nodelist=nodes)
    L = np.diag(A.sum(axis=1)) - A
    E = np.trace(L @ L)
    out = {}
    for i, n in enumerate(nodes):
        keep = [j for j in range(len(nodes)) if j != i]
        A2 = A[np.ix_(keep, keep)]
        L2 = np.diag(A2.sum(axis=1)) - A2
        dE = E - np.trace(L2 @ L2)
        out[n] = dE / E if normalized else dE
    return out


def test_laplacian_centrality(spark):
    from linkgraph.algos.degrees import laplacian_centrality

    G = nx.gnp_random_graph(30, 0.15, seed=13)
    want = _lap_want(G)
    got = {
        r["id"]: r["laplacian_centrality"]
        for r in laplacian_centrality(from_nx(spark, G)).collect()
    }
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)


def test_laplacian_centrality_unnormalized(spark):
    from linkgraph.algos.degrees import laplacian_centrality

    G = nx.gnp_random_graph(20, 0.2, seed=17)
    want = _lap_want(G, normalized=False)
    got = {
        r["id"]: r["laplacian_centrality"]
        for r in laplacian_centrality(from_nx(spark, G), normalized=False).collect()
    }
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)
