"""Parity tests for algebraic connectivity / Fiedler vector vs the
reference (networkx/linalg/algebraicconnectivity.py)."""

import networkx as nx
import numpy as np
import pytest

from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError
from linkgraph.algos.fiedler import (
    algebraic_connectivity,
    fiedler_vector,
    spectral_ordering,
    spectral_bisection,
)


def _fv_dict(df):
    return {r["id"]: r["value"] for r in df.collect()}


def _dense_l(G, weight=None):
    nodes = sorted(G.nodes)
    idx = {n: i for i, n in enumerate(nodes)}
    L = np.zeros((len(nodes), len(nodes)))
    for u, v, d in G.edges(data=True):
        w = abs(float(d.get(weight, 1.0))) if weight else 1.0
        if u == v or w == 0:
            continue
        L[idx[u], idx[v]] -= w
        L[idx[v], idx[u]] -= w
        L[idx[u], idx[u]] += w
        L[idx[v], idx[v]] += w
    return nodes, L


def _np_fiedler(G, weight=None):
    """Dense replica of the reference (algebraicconnectivity.py needs
    scipy, absent in this container): lambda_2 + eigenvector via eigh."""
    nodes, L = _dense_l(G, weight)
    vals, vecs = np.linalg.eigh(L)
    return nodes, float(vals[1]), vecs[:, 1]


@pytest.mark.parametrize(
    "G",
    [
        nx.path_graph(8),
        nx.cycle_graph(9),
        nx.gnp_random_graph(16, 0.3, seed=22),
        nx.barbell_graph(4, 1),
    ],
)
def test_algebraic_connectivity_parity(spark, G):
    _, want, _ = _np_fiedler(G)
    got = algebraic_connectivity(from_nx(spark, G), tol=1e-10)
    assert got == pytest.approx(want, rel=1e-5)


def test_fiedler_vector_parity(spark):
    G = nx.barbell_graph(4, 1)  # clean spectral gap
    nodes, _, want = _np_fiedler(G)
    got = _fv_dict(fiedler_vector(from_nx(spark, G), tol=1e-10))
    gv = np.array([got[n] for n in nodes])
    wv = np.asarray(want, dtype=float)
    # sign-free comparison of unit eigenvectors
    err = min(np.abs(gv - wv).max(), np.abs(gv + wv).max())
    assert err < 1e-4


def test_weighted_algebraic_connectivity(spark):
    G = nx.path_graph(6)
    for i, (u, v) in enumerate(G.edges):
        G.edges[u, v]["weight"] = float(i + 1)
    _, want, _ = _np_fiedler(G, weight="weight")
    got = algebraic_connectivity(from_nx(spark, G), tol=1e-10)
    assert got == pytest.approx(want, rel=1e-5)


def test_spectral_bisection_parity(spark):
    G = nx.barbell_graph(3, 0)
    nodes, _, vec = _np_fiedler(G)
    want = {
        frozenset(n for n, v in zip(nodes, vec) if v < 0),
        frozenset(n for n, v in zip(nodes, vec) if v >= 0),
    }
    neg, pos = spectral_bisection(from_nx(spark, G))
    got = {
        frozenset(r["id"] for r in neg.collect()),
        frozenset(r["id"] for r in pos.collect()),
    }
    assert got == want


def test_spectral_ordering_path(spark):
    # the Fiedler ordering of a path is the path order (or its reverse)
    G = nx.path_graph(7)
    rows = spectral_ordering(from_nx(spark, G)).collect()
    order = [r["id"] for r in sorted(rows, key=lambda r: r["pos"])]
    assert order in (list(range(7)), list(range(6, -1, -1)))


def test_fiedler_guards(spark):
    with pytest.raises(NetworkXError):
        algebraic_connectivity(from_nx(spark, nx.Graph([(0, 1)])).subgraph(
            from_nx(spark, nx.Graph([(0, 1)])).spark.createDataFrame(
                [(0,)], "id long"
            )
        ))
    disconnected = nx.Graph([(0, 1), (2, 3)])
    with pytest.raises(NetworkXError):
        algebraic_connectivity(from_nx(spark, disconnected))
