"""Parity tests for chain_decomposition, prefix_tree, google_matrix, and
number_of_spanning_trees vs the reference (chains.py, generators/trees.py,
pagerank_alg.py:330, matrix-tree)."""

import networkx as nx
import numpy as np
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.chains import chain_decomposition, prefix_tree
from linkgraph.algos.matrices import google_matrix, number_of_spanning_trees


@pytest.mark.parametrize("seed", [2, 6, 9])
def test_chain_decomposition_invariants(spark, seed):
    G = nx.gnp_random_graph(16, 0.22, seed=seed)
    g = from_nx(spark, G)
    chains = chain_decomposition(g)
    want_chains = list(nx.chain_decomposition(G))
    assert len(chains) == len(want_chains)
    # every non-bridge edge in exactly one chain; bridges in none
    in_chain = {}
    for ci, ch in enumerate(chains):
        for u, v in ch:
            e = tuple(sorted((u, v)))
            assert G.has_edge(u, v)
            assert e not in in_chain, e
            in_chain[e] = ci
    bridges = {tuple(sorted(e)) for e in nx.bridges(G)}
    all_edges = {tuple(sorted(e)) for e in G.edges()}
    assert set(in_chain) == all_edges - bridges


def test_chain_decomposition_cycle(spark):
    G = nx.cycle_graph(5)
    chains = chain_decomposition(from_nx(spark, G))
    assert len(chains) == 1
    assert len(chains[0]) == 5


def test_prefix_tree_parity(spark):
    paths = [["a", "b"], ["a", "c", "d"], ["a", "c"], ["x"]]
    g, nodes = prefix_tree(spark, paths)
    want = nx.prefix_tree(paths)
    assert g.number_of_nodes() == want.number_of_nodes()
    assert g.number_of_edges() == want.number_of_edges()
    # recovered root->NIL paths == input path set, as in the reference
    src = {r["id"]: r["source"] for r in nodes.collect()}
    succ = {}
    for r in g.edges.select("src", "dst").collect():
        succ.setdefault(r["src"], []).append(r["dst"])

    def walk(u, acc, out):
        for v in succ.get(u, []):
            if v == -1:
                out.add(tuple(acc))
            else:
                walk(v, acc + [src[v]], out)

    got_paths = set()
    walk(0, [], got_paths)
    assert got_paths == {tuple(p) for p in paths}


def test_google_matrix_parity(spark):
    G = nx.gnp_random_graph(12, 0.25, seed=7, directed=True)
    g = from_nx(spark, G)
    M, ids = google_matrix(g, alpha=0.85)
    # numpy replica of the reference (google_matrix needs scipy-free numpy
    # path; rebuild it directly)
    n = len(ids)
    A = nx.to_numpy_array(G, nodelist=ids)
    out = A.sum(axis=1)
    dang = np.full(n, 1.0 / n)
    A[out == 0] = dang
    A = A / A.sum(axis=1)[:, None]
    want = 0.85 * A + 0.15 / n
    assert np.allclose(M, want)
    # stationary vector of M^T equals the power-iterated pagerank of the
    # independently built reference matrix (nx.pagerank needs scipy,
    # absent here)
    vals, vecs = np.linalg.eig(M.T)
    k = np.argmin(np.abs(vals - 1.0))
    pi = np.real(vecs[:, k])
    pi = pi / pi.sum()
    pr = np.full(n, 1.0 / n)
    for _ in range(500):
        pr = pr @ want
    assert np.allclose(pi, pr, atol=1e-8)


def test_google_matrix_personalization(spark):
    G = nx.path_graph(5, create_using=nx.DiGraph)
    g = from_nx(spark, G)
    pers = {0: 1.0}
    M, ids = google_matrix(g, alpha=0.9, personalization=pers)
    assert M.shape == (5, 5)
    assert np.allclose(M.sum(axis=1), 1.0)


@pytest.mark.parametrize(
    "G,want",
    [
        (nx.cycle_graph(5), 5),
        (nx.complete_graph(4), 16),  # Cayley: n^{n-2}
        (nx.path_graph(6), 1),
        (nx.complete_graph(5), 125),
    ],
)
def test_number_of_spanning_trees(spark, G, want):
    got = number_of_spanning_trees(from_nx(spark, G))
    assert round(got) == want


def test_number_of_spanning_trees_weighted(spark):
    G = nx.cycle_graph(3)
    for i, (u, v) in enumerate(G.edges):
        G.edges[u, v]["weight"] = float(i + 1)
    # weighted count = sum over spanning trees of the product of weights:
    # trees of C3 drop one edge each -> 2*3 + 1*3 + 1*2 = 11
    got = number_of_spanning_trees(from_nx(spark, G), weight="weight")
    assert got == pytest.approx(11.0)


def test_spanning_trees_disconnected(spark):
    G = nx.Graph([(0, 1), (2, 3)])
    assert number_of_spanning_trees(from_nx(spark, G)) == 0.0
