"""Parity tests for lowest_common_ancestors on DAGs."""

import itertools

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.dag import lowest_common_ancestors


def _check(spark, G, pairs):
    g = from_nx(spark, G)
    pdf = spark.createDataFrame(pairs, "u long, v long")
    got = {
        (r["u"], r["v"]): r["lca"]
        for r in lowest_common_ancestors(g, pdf).collect()
    }
    want = dict(nx.all_pairs_lowest_common_ancestor(G, pairs=pairs))
    assert set(got) == set(want)
    anc = {n: nx.ancestors(G, n) | {n} for n in G}
    for (u, v), lca in got.items():
        common = anc[u] & anc[v]
        assert lca in common
        # lowest: no other common ancestor lies strictly below ours
        assert not any(lca in nx.ancestors(G, c) for c in common)


def test_tree_lca_exact(spark):
    # on a tree the LCA is unique, so ours must equal the reference's
    G = nx.DiGraph(
        [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (4, 6), (4, 7)]
    )
    pairs = [(3, 6), (6, 7), (3, 5), (5, 7), (0, 6), (6, 6)]
    g = from_nx(spark, G)
    pdf = spark.createDataFrame(pairs, "u long, v long")
    got = {
        (r["u"], r["v"]): r["lca"]
        for r in lowest_common_ancestors(g, pdf).collect()
    }
    want = dict(nx.all_pairs_lowest_common_ancestor(G, pairs=pairs))
    assert got == want


def test_diamond_valid(spark):
    G = nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])
    _check(spark, G, [(1, 2), (3, 4), (1, 4)])


def test_no_common_ancestor_absent(spark):
    G = nx.DiGraph([(0, 1), (2, 3)])
    g = from_nx(spark, G)
    pdf = spark.createDataFrame([(1, 3), (0, 1)], "u long, v long")
    got = {(r["u"], r["v"]) for r in lowest_common_ancestors(g, pdf).collect()}
    assert got == {(0, 1)}


def test_random_dags_valid(spark):
    for seed in (4, 9):
        R = nx.gnp_random_graph(18, 0.18, seed=seed, directed=True)
        G = nx.DiGraph((u, v) for u, v in R.edges if u < v)
        G.add_nodes_from(R)
        pairs = list(itertools.combinations(range(0, 18, 3), 2))
        _check(spark, G, pairs)
