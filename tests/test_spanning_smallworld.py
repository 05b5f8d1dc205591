"""Spanning-tree iteration/sampling and the smallworld reference tail."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph as lg
from linkgraph.graph import from_nx


def _tree_edges(t):
    return frozenset(
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in t.edges.collect()
    )


def test_spanning_tree_iterator_enumerates_all(spark):
    G = nx.Graph()
    G.add_weighted_edges_from(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 3.0), (2, 3, 1.0), (3, 0, 4.0)]
    )
    g = from_nx(spark, G)
    got = [
        (
            sum(r["weight"] for r in t.edges.collect()),
            _tree_edges(t),
        )
        for t in lg.SpanningTreeIterator(g)
    ]
    ref = [
        (
            sum(G[u][v]["weight"] for u, v in t.edges),
            frozenset(tuple(sorted(e)) for e in t.edges),
        )
        for t in nx.SpanningTreeIterator(G)
    ]
    assert sorted(w for w, _ in got) == sorted(w for w, _ in ref)
    assert {e for _, e in got} == {e for _, e in ref}
    # nondecreasing order
    ws = [w for w, _ in got]
    assert ws == sorted(ws)
    # maximum direction
    got_max = [
        sum(r["weight"] for r in t.edges.collect())
        for t in lg.SpanningTreeIterator(g, minimum=False)
    ]
    assert got_max == sorted(got_max, reverse=True)


def test_partition_spanning_tree(spark):
    G = nx.Graph()
    rows = []
    for u, v, w in [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 3.0), (2, 3, 1.0)]:
        G.add_edge(u, v, weight=w)
        rows.append((u, v, w, lg.EdgePartition.OPEN))
    # force the heavy edge (2, 0) into the tree
    rows = [
        (u, v, w, lg.EdgePartition.INCLUDED if (u, v) == (2, 0) else p)
        for u, v, w, p in rows
    ]
    e = spark.createDataFrame(
        rows, "src long, dst long, weight double, partition int"
    )
    from linkgraph.graph import SparkGraph

    g = SparkGraph(e, directed=False, coalesce_edges=False)
    t = lg.partition_spanning_tree(g)
    edges = _tree_edges(t)
    assert (0, 2) in edges
    assert len(edges) == 3


def test_random_spanning_tree_multiplicative(spark):
    G = nx.cycle_graph(5)
    g = from_nx(spark, G)
    from linkgraph.algos.tree import is_tree

    seen = set()
    for seed in range(6):
        t = lg.random_spanning_tree(g, seed=seed)
        assert is_tree(t)
        assert t.number_of_nodes() == 5
        seen.add(_tree_edges(t))
    assert len(seen) > 1  # the sampler actually randomizes


def test_random_spanning_tree_additive(spark):
    G = nx.Graph()
    G.add_weighted_edges_from([(0, 1, 1.0), (1, 2, 1.0), (2, 0, 5.0)])
    g = from_nx(spark, G)
    from linkgraph.algos.tree import is_tree

    t = lg.random_spanning_tree(g, weight="weight", multiplicative=False, seed=1)
    assert is_tree(t)


def test_connected_double_edge_swap(spark):
    G = nx.karate_club_graph()
    g = from_nx(spark, G)
    swapped, n = lg.connected_double_edge_swap(g, nswap=20, seed=5)
    assert n > 0
    from linkgraph.algos.components import is_connected

    assert is_connected(swapped)
    got_degs = sorted(r["degree"] for r in lg.degrees(swapped).collect())
    ref_degs = sorted(d for _, d in G.degree)
    assert got_degs == ref_degs


def test_lattice_reference_properties(spark):
    G = nx.random_reference(nx.watts_strogatz_graph(24, 4, 0.3, seed=2), seed=1)
    g = from_nx(spark, G)
    latt = lg.lattice_reference(g, niter=2, seed=3)
    got_degs = sorted(r["degree"] for r in lg.degrees(latt).collect())
    assert got_degs == sorted(d for _, d in G.degree)
    assert latt.number_of_edges() == G.number_of_edges()


def test_omega_range(spark):
    # a lattice-ish WS graph should have omega below ~0; a random graph near 0+
    WS = nx.watts_strogatz_graph(16, 4, 0.05, seed=4)
    g = from_nx(spark, WS)
    om = lg.omega(g, niter=1, nrand=2, seed=7)
    assert -1.5 <= om <= 1.5
