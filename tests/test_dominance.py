"""Parity tests for dominance (immediate dominators / dominance frontiers)
vs the reference's Cooper-Harvey-Kennedy implementation
(``networkx/algorithms/dominance.py``)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos import dominance as DOM


def _check(spark, G, start):
    g = from_nx(spark, G)
    want = nx.immediate_dominators(G, start)
    got = {r["id"]: r["idom"] for r in DOM.immediate_dominators(g, start).collect()}
    assert got == want

    want_df = {
        n: fs for n, fs in nx.dominance_frontiers(G, start).items() if fs
    }
    got_df = {}
    for r in DOM.dominance_frontiers(g, start).collect():
        got_df.setdefault(r["id"], set()).add(r["frontier"])
    assert got_df == want_df


def test_chain(spark):
    _check(spark, nx.path_graph(8, create_using=nx.DiGraph), 0)


def test_diamond_merge(spark):
    # classic CFG diamond: idom(3) is the branch head 0, not either arm
    G = nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])
    _check(spark, G, 0)


def test_cycle(spark):
    _check(spark, nx.cycle_graph(9, create_using=nx.DiGraph), 0)


def test_loop_with_backedge(spark):
    # irreducible-ish shape: the iterative dataflow must not be fooled by
    # the back edge 4 -> 1
    G = nx.DiGraph([(0, 1), (1, 2), (2, 3), (3, 4), (4, 1), (2, 5), (5, 4)])
    _check(spark, G, 0)


def test_cooper_harvey_kennedy_figure(spark):
    # the example from the CHK paper (the reference's own doctest graph)
    G = nx.DiGraph(
        [(1, 2), (2, 1), (2, 3), (3, 2), (6, 5), (6, 4), (5, 1), (4, 2), (4, 3)]
    )
    _check(spark, G, 6)


def test_unreachable_nodes_excluded(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (5, 6)])
    g = from_nx(spark, G)
    got = {r["id"] for r in DOM.immediate_dominators(g, 0).collect()}
    assert got == {1, 2}


def test_gnp_digraphs(spark):
    for seed in (1, 7, 13):
        G = nx.gnp_random_graph(30, 0.08, seed=seed, directed=True)
        start = 0
        # restrict parity to what the reference defines: reachable from start
        _check(spark, G, start)


def test_dag(spark):
    G = nx.gnp_random_graph(25, 0.15, seed=3, directed=True)
    D = nx.DiGraph((u, v) for u, v in G.edges if u < v)
    D.add_nodes_from(range(25))
    roots = [n for n in D if D.in_degree(n) == 0]
    D.add_edges_from((99, r) for r in roots)
    _check(spark, D, 99)


def test_frontier_of_branch_arms(spark):
    G = nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3)])
    g = from_nx(spark, G)
    got = {
        (r["id"], r["frontier"])
        for r in DOM.dominance_frontiers(g, 0).collect()
    }
    assert got == {(1, 3), (2, 3)}
