"""Bounded simple_cycles parity vs the reference (`cycles.py:106`)."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.cycles import simple_cycles


def _canon(cycle):
    """Min-first rotation; for the direction, prefer the smaller second
    element — one unique tuple per cycle regardless of traversal."""
    cycle = list(cycle)
    if len(cycle) == 1:
        return (cycle[0],)
    i = cycle.index(min(cycle))
    fwd = tuple(cycle[i:] + cycle[:i])
    rev = tuple([fwd[0]] + list(reversed(fwd[1:])))
    return min(fwd, rev)


def _nx_cycles(G, k):
    return {_canon(c) for c in nx.simple_cycles(G, length_bound=k)}


def _got(df):
    return {_canon(r["cycle"]) for r in df.collect()}


def test_directed_cycles_match_nx(spark):
    G = nx.gnp_random_graph(10, 0.25, seed=8, directed=True)
    g = from_nx(spark, G)
    for k in (2, 3, 4, 5):
        assert _got(simple_cycles(g, k)) == _nx_cycles(G, k), k


def test_undirected_cycles_match_nx(spark):
    G = nx.gnp_random_graph(10, 0.3, seed=5)
    g = from_nx(spark, G)
    for k in (3, 4, 5):
        assert _got(simple_cycles(g, k)) == _nx_cycles(G, k), k


def test_self_loop_cycle(spark):
    G = nx.DiGraph([(1, 1), (1, 2), (2, 1)])
    g = from_nx(spark, G)
    got = _got(simple_cycles(g, 3))
    assert (1,) in got and (1, 2) in got


def test_ring_has_single_cycle(spark):
    G = nx.cycle_graph(6)
    g = from_nx(spark, G)
    got = _got(simple_cycles(g, 6))
    assert got == {_canon(list(range(6)))}
    # bound below the girth finds nothing
    assert _got(simple_cycles(g, 5)) == set()


def test_length_bound_required(spark):
    G = nx.cycle_graph(4)
    g = from_nx(spark, G)
    with pytest.raises(ValueError):
        simple_cycles(g, 0)
