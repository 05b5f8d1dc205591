"""Parity tests for the conversion bridges and dense linalg pack vs the
reference (convert.py, convert_matrix.py, json_graph/, linalg/,
non_randomness.py)."""

import math

import networkx as nx
import numpy as np
import pytest

from linkgraph.graph import from_nx
from linkgraph import convert as C
from linkgraph import linalg as LA


def _G(directed=False, seed=3):
    return nx.gnp_random_graph(12, 0.3, seed=seed, directed=directed)


def _edges(g):
    return {
        (r["src"], r["dst"]) if g.directed else tuple(sorted((r["src"], r["dst"])))
        for r in g.edges.select("src", "dst").collect()
    }


def _nx_edges(G):
    return {
        (u, v) if G.is_directed() else tuple(sorted((u, v))) for u, v in G.edges()
    }


@pytest.mark.parametrize("directed", [False, True])
def test_dict_of_dicts_roundtrip(spark, directed):
    G = _G(directed)
    g = from_nx(spark, G)
    d = C.to_dict_of_dicts(g)
    want = nx.to_dict_of_dicts(G)
    assert {u: set(v) for u, v in d.items()} == {
        u: set(v) for u, v in want.items()
    }
    g2 = C.from_dict_of_dicts(spark, d, directed=directed)
    assert _edges(g2) == _nx_edges(G)


@pytest.mark.parametrize("directed", [False, True])
def test_dict_of_lists_roundtrip(spark, directed):
    G = _G(directed, seed=5)
    g = from_nx(spark, G)
    d = C.to_dict_of_lists(g)
    want = nx.to_dict_of_lists(G)
    assert d == {u: sorted(v) for u, v in want.items()}
    g2 = C.from_dict_of_lists(spark, d, directed=directed)
    assert _edges(g2) == _nx_edges(G)


def test_edgelist_and_pandas(spark):
    G = _G(seed=7)
    g = from_nx(spark, G)
    el = C.to_edgelist(g)
    assert {tuple(sorted(e[:2])) for e in el} == _nx_edges(G)
    pdf = C.to_pandas_edgelist(g)
    assert set(pdf.columns) >= {"source", "target", "weight"}
    g2 = C.from_pandas_edgelist(spark, pdf, edge_attr=True)
    assert _edges(g2) == _nx_edges(G)


def test_pandas_adjacency_roundtrip(spark):
    G = _G(seed=9)
    g = from_nx(spark, G)
    adf = C.to_pandas_adjacency(g)
    want = nx.to_pandas_adjacency(G, nodelist=sorted(G))
    assert np.allclose(adf.values, want.values)
    g2 = C.from_pandas_adjacency(spark, adf)
    assert _edges(g2) == _nx_edges(G)
    import pandas as pd

    with pytest.raises(Exception):
        C.from_pandas_adjacency(spark, pd.DataFrame([[0, 1]]))


def test_cytoscape_roundtrip(spark):
    G = _G(seed=11)
    g = from_nx(spark, G)
    data = C.cytoscape_data(g)
    want = nx.cytoscape_data(G)
    assert data["directed"] == want["directed"]
    assert len(data["elements"]["nodes"]) == len(want["elements"]["nodes"])
    assert len(data["elements"]["edges"]) == len(want["elements"]["edges"])
    g2 = C.cytoscape_graph(spark, data)
    assert _edges(g2) == _nx_edges(G)
    # our data round-trips through the reference's loader too
    G2 = nx.cytoscape_graph(data)
    assert {tuple(sorted(e)) for e in G2.edges()} == _nx_edges(G)


def test_adjacency_json_roundtrip(spark):
    G = _G(seed=13)
    g = from_nx(spark, G)
    data = C.adjacency_data(g)
    g2 = C.adjacency_graph(spark, data)
    assert _edges(g2) == _nx_edges(G)


def test_tree_json_roundtrip(spark):
    G = nx.bfs_tree(nx.balanced_tree(2, 3), 0)
    g = from_nx(spark, G)
    data = C.tree_data(g, 0)
    want = nx.tree_data(G, 0)

    def norm(d):
        return (
            d["id"],
            tuple(sorted(norm(c) for c in d.get("children", []))),
        )

    assert norm(data) == norm(want)
    g2 = C.tree_graph(spark, data)
    assert _edges(g2) == _nx_edges(G)
    with pytest.raises(TypeError):
        C.tree_data(from_nx(spark, nx.cycle_graph(3, create_using=nx.DiGraph)), 0)


def _dense_adj(G, weight=None):
    nodes = sorted(G.nodes)
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for u, v, d in G.edges(data=True):
        w = float(d.get(weight, 1)) if weight else 1.0
        A[idx[u], idx[v]] += w
        if not G.is_directed() and u != v:
            A[idx[v], idx[u]] += w
    return A


@pytest.mark.parametrize("directed", [False, True])
def test_adjacency_matrix(spark, directed):
    G = _G(directed, seed=15)
    g = from_nx(spark, G)
    A, ids = LA.adjacency_matrix(g)
    assert np.allclose(A, _dense_adj(G))


def test_laplacian_and_spectra(spark):
    G = _G(seed=17)
    g = from_nx(spark, G)
    A = _dense_adj(G)
    L = np.diag(A.sum(1)) - A
    got_L, _ = LA.laplacian_matrix(g)
    assert np.allclose(got_L, L)
    assert np.allclose(LA.laplacian_spectrum(g), np.sort(np.linalg.eigvalsh(L)))
    got_adj = LA.adjacency_spectrum(g)
    assert np.allclose(
        np.sort(got_adj.real), np.sort(np.linalg.eigvals(A).real), atol=1e-8
    )
    # normalized Laplacian eigenvalues live in [0, 2]
    ns = LA.normalized_laplacian_spectrum(g)
    assert ns.min() > -1e-9 and ns.max() < 2 + 1e-9
    # modularity matrix: rows sum to 0
    B, _ = LA.modularity_matrix(g)
    assert np.allclose(B.sum(axis=1), 0.0)
    d = A.sum(1)
    r = (d**2).sum() / d.sum() - 1
    H, _ = LA.bethe_hessian_matrix(g)
    want_H = (r**2 - 1) * np.eye(len(d)) - r * A + np.diag(d)
    assert np.allclose(H, want_H)


def test_incidence_matrix(spark):
    G = nx.path_graph(4)
    g = from_nx(spark, G)
    B, ids = LA.incidence_matrix(g, oriented=True)
    # B Bᵀ = L for oriented incidence
    L = np.diag(_dense_adj(G).sum(1)) - _dense_adj(G)
    assert np.allclose(B @ B.T, L)


def test_non_randomness(spark):
    G = nx.karate_club_graph()
    g = from_nx(spark, G)
    nr, nr_rd = LA.non_randomness(g, k=2)
    # replicate eq 4.4/4.5 densely with sorted eigenvalues (karate carries
    # real edge weights; both sides default to the weight column)
    ev = np.sort(np.linalg.eigvals(_dense_adj(G, weight="weight")).real)[::-1]
    n, m, k = G.number_of_nodes(), G.number_of_edges(), 2
    p = 2 * k * m / (n * (n - k))
    want_nr = float(ev[:2].sum())
    want_rd = (want_nr - ((n - 2 * k) * p + k)) / math.sqrt(2 * k * p * (1 - p))
    assert nr == pytest.approx(want_nr, rel=1e-6)
    assert nr_rd == pytest.approx(want_rd, rel=1e-6)
    with pytest.raises(Exception):
        LA.non_randomness(from_nx(spark, nx.Graph([(0, 1), (2, 3)])))
