"""SimRank parity vs the reference (`similarity.py:1190`)."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.simrank import simrank_similarity, ExceededMaxIterations


def _to_dict(df):
    return {(r["u"], r["v"]): r["simrank"] for r in df.collect()}


def _assert_matches(got, G, want, tol=5e-4):
    for u in G:
        for v in G:
            assert abs(got.get((u, v), 0.0) - want[u][v]) <= tol, (u, v)


def test_simrank_undirected_gnp(spark):
    G = nx.gnp_random_graph(12, 0.3, seed=5)
    want = nx.simrank_similarity(G, tolerance=1e-6)
    g = from_nx(spark, G)
    got = _to_dict(simrank_similarity(g, tolerance=1e-6))
    _assert_matches(got, G, want)


def test_simrank_directed(spark):
    G = nx.gnp_random_graph(10, 0.3, seed=9, directed=True)
    want = nx.simrank_similarity(G, tolerance=1e-6)
    g = from_nx(spark, G)
    got = _to_dict(simrank_similarity(g, tolerance=1e-6))
    _assert_matches(got, G, want)


def test_simrank_cycle2_doc_example(spark):
    G = nx.cycle_graph(2)
    g = from_nx(spark, G)
    got = _to_dict(simrank_similarity(g))
    assert got[(0, 0)] == 1.0 and got[(1, 1)] == 1.0
    assert got.get((0, 1), 0.0) == 0.0


def test_simrank_importance_factor(spark):
    G = nx.star_graph(4)
    want = nx.simrank_similarity(G, importance_factor=0.8, tolerance=1e-6)
    g = from_nx(spark, G)
    got = _to_dict(simrank_similarity(g, importance_factor=0.8, tolerance=1e-6))
    _assert_matches(got, G, want)


def test_simrank_raises_on_max_iterations(spark):
    G = nx.cycle_graph(5)
    g = from_nx(spark, G)
    with pytest.raises(ExceededMaxIterations):
        simrank_similarity(g, max_iterations=1, tolerance=1e-12)


def test_simrank_min_sim_prunes_but_keeps_big_pairs(spark):
    G = nx.gnp_random_graph(12, 0.3, seed=5)
    want = nx.simrank_similarity(G, tolerance=1e-6)
    g = from_nx(spark, G)
    full = _to_dict(simrank_similarity(g, tolerance=1e-6))
    pruned = _to_dict(simrank_similarity(g, tolerance=1e-6, min_sim=0.05))
    assert len(pruned) <= len(full)
    for (u, v), s in pruned.items():
        if u != v:
            # pruning may shave mass flowing through dropped pairs,
            # but surviving values stay close to exact
            assert abs(s - want[u][v]) <= 0.05
