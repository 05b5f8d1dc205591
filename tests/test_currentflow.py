"""Parity tests for current-flow closeness / information centrality and
the Kemeny constant (current_flow_closeness.py:16, distance_measures.py:1008).

scipy is absent in this container, so the reference functions cannot run;
parity is against dense numpy replicas of the reference formulas (pinv of
the Laplacian / eigvalsh of D^-1/2 A D^-1/2) plus closed forms.
"""

import math

import networkx as nx
import numpy as np
import pytest

from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError, NotImplementedForDirected
from linkgraph.algos.currentflow import (
    current_flow_closeness_centrality,
    information_centrality,
    kemeny_constant,
)


def _dense_cfcc(G):
    nodes = sorted(G.nodes())
    n = len(nodes)
    A = np.zeros((n, n))
    for u, v in G.edges():
        A[u, v] = A[v, u] = 1.0
    L = np.diag(A.sum(1)) - A
    Lp = np.linalg.pinv(L)
    return {v: 1.0 / (n * Lp[v, v] + np.trace(Lp)) for v in nodes}


def _dense_kemeny(G):
    nodes = sorted(G.nodes())
    n = len(nodes)
    A = np.zeros((n, n))
    for u, v in G.edges():
        A[u, v] = A[v, u] = 1.0
    d = A.sum(1)
    DH = np.diag(1 / np.sqrt(d))
    eig = np.sort(np.linalg.eigvalsh(DH @ A @ DH))
    return float(np.sum(1 / (1 - eig[:-1])))


@pytest.mark.parametrize(
    "G",
    [
        nx.complete_graph(4),
        nx.cycle_graph(8),
        nx.gnp_random_graph(16, 0.3, seed=5),
    ],
)
def test_cfcc_matches_dense_reference_formula(spark, G):
    g = from_nx(spark, G)
    got = {
        r["id"]: r["centrality"]
        for r in current_flow_closeness_centrality(g).collect()
    }
    want = _dense_cfcc(G)
    assert got == pytest.approx(want, abs=1e-7)


def test_cfcc_closed_forms(spark):
    # K_n: r(u,v) = 2/n ⇒ cfcc = n / (2(n-1)); C_n: Σ_k k(n-k)/n
    g = from_nx(spark, nx.complete_graph(4))
    vals = {r["id"]: r["centrality"] for r in information_centrality(g).collect()}
    assert all(v == pytest.approx(4 / 6) for v in vals.values())
    g = from_nx(spark, nx.cycle_graph(8))
    vals = {
        r["id"]: r["centrality"]
        for r in current_flow_closeness_centrality(g).collect()
    }
    assert all(v == pytest.approx(1 / 10.5) for v in vals.values())


@pytest.mark.parametrize(
    "G",
    [
        nx.complete_graph(4),
        nx.cycle_graph(8),
        nx.gnp_random_graph(16, 0.3, seed=5),
    ],
)
def test_kemeny_matches_dense_reference_formula(spark, G):
    g = from_nx(spark, G)
    assert kemeny_constant(g) == pytest.approx(_dense_kemeny(G), abs=1e-7)
    # closed form for K_n: (n-1)^2 / n
    if G.number_of_nodes() == 4 and math.isclose(nx.density(G), 1.0):
        assert kemeny_constant(g) == pytest.approx(9 / 4)


def test_currentflow_guards(spark):
    gd = from_nx(spark, nx.gnp_random_graph(6, 0.5, seed=1, directed=True))
    with pytest.raises(NotImplementedForDirected):
        current_flow_closeness_centrality(gd)
    with pytest.raises(NotImplementedForDirected):
        kemeny_constant(gd)
    disc = from_nx(spark, nx.disjoint_union(nx.path_graph(3), nx.path_graph(3)))
    with pytest.raises(NetworkXError):
        current_flow_closeness_centrality(disc)
    with pytest.raises(NetworkXError):
        kemeny_constant(disc)


def _dense_cfb(G, weighted=False, normalized=True):
    nodes = sorted(G.nodes())
    N = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((N, N))
    for u, v in G.edges():
        w = G[u][v].get("weight", 1.0) if weighted else 1.0
        A[idx[u], idx[v]] = A[idx[v], idx[u]] = w
    Lp = np.linalg.pinv(np.diag(A.sum(1)) - A)
    b = np.zeros(N)
    eb = {}
    for u, v in sorted(sorted((idx[a], idx[c])) for a, c in G.edges()):
        c = A[u, v]
        row = c * (Lp[u] - Lp[v])
        pos = np.empty(N, dtype=int)
        pos[np.argsort(row)[::-1]] = np.arange(N)
        for i in range(N):
            b[u] += (i - pos[i]) * row[i]
            b[v] += (N - i - 1 - pos[i]) * row[i]
        eb[(nodes[u], nodes[v])] = sum(
            (N + 1 - 2 * (pos[i] + 1)) * row[i] for i in range(N)
        )
    nb = (N - 1.0) * (N - 2.0) if normalized else 2.0
    return (
        {nodes[i]: (b[i] - i) * 2.0 / nb for i in range(N)},
        {e: w / nb for e, w in eb.items()},
    )


@pytest.mark.parametrize(
    "G", [nx.balanced_tree(2, 3), nx.cycle_graph(8), nx.gnp_random_graph(14, 0.3, seed=7)]
)
def test_cf_betweenness_matches_dense_reference_formula(spark, G):
    from linkgraph.algos.currentflow import (
        current_flow_betweenness_centrality,
        edge_current_flow_betweenness_centrality,
    )

    g = from_nx(spark, G)
    got = {
        r["id"]: r["betweenness"]
        for r in current_flow_betweenness_centrality(g).collect()
    }
    want, ewant = _dense_cfb(G)
    assert got == pytest.approx(want, abs=1e-8)
    egot = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_current_flow_betweenness_centrality(g).collect()
    }
    assert egot == pytest.approx(
        {(min(u, v), max(u, v)): w for (u, v), w in ewant.items()}, abs=1e-8
    )


def test_cf_betweenness_tree_equals_shortest_path(spark):
    # Newman 2005: on trees, current flows only along the unique path, so
    # current-flow betweenness == shortest-path betweenness exactly.
    from linkgraph.algos.currentflow import current_flow_betweenness_centrality

    T = nx.balanced_tree(3, 2)
    g = from_nx(spark, T)
    got = {
        r["id"]: r["betweenness"]
        for r in current_flow_betweenness_centrality(g).collect()
    }
    assert got == pytest.approx(nx.betweenness_centrality(T, normalized=True))
