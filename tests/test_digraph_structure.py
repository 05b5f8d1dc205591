"""Parity tests for attracting components, semiconnectivity, aperiodicity
(networkx components/attracting.py, semiconnected.py, dag.py:575)."""

import networkx as nx
import pytest

from linkgraph.exceptions import NetworkXError, NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.strongly_connected import (
    attracting_components,
    number_attracting_components,
    is_semiconnected,
    is_aperiodic,
)


def _attr_sets(spark, G):
    rows = attracting_components(from_nx(spark, G)).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r["component"], set()).add(r["id"])
    return set(map(frozenset, comps.values()))


@pytest.mark.parametrize("seed", [3, 11])
def test_attracting_components(spark, seed):
    G = nx.gnp_random_graph(20, 0.08, seed=seed, directed=True)
    want = set(map(frozenset, nx.attracting_components(G)))
    assert _attr_sets(spark, G) == want
    assert number_attracting_components(from_nx(spark, G)) == len(want)


def test_semiconnected(spark):
    for G, want in [
        (nx.DiGraph([(0, 1), (1, 2)]), True),  # chain
        (nx.DiGraph([(0, 1), (2, 1)]), False),  # two sources
        (nx.DiGraph([(0, 1), (1, 0), (1, 2)]), True),  # scc then tail
        (nx.cycle_graph(4, create_using=nx.DiGraph), True),
    ]:
        assert is_semiconnected(from_nx(spark, G)) == nx.is_semiconnected(G) == want
    D = nx.DiGraph([(0, 1)])
    D.add_node(5)  # not weakly connected
    assert is_semiconnected(from_nx(spark, D)) == nx.is_semiconnected(D) == False
    with pytest.raises(NotImplementedForDirected):
        is_semiconnected(from_nx(spark, nx.path_graph(3)))


@pytest.mark.parametrize(
    "edges,want",
    [
        ([(0, 1), (1, 2), (2, 0)], False),  # pure 3-cycle: period 3
        ([(0, 1), (1, 2), (2, 0), (1, 0)], True),  # 2-cycle + 3-cycle
        ([(0, 1), (1, 0)], False),  # period 2
        ([(0, 0)], True),  # self-loop
    ],
)
def test_is_aperiodic(spark, edges, want):
    G = nx.DiGraph(edges)
    assert is_aperiodic(from_nx(spark, G)) == nx.is_aperiodic(G) == want


def test_is_aperiodic_errors(spark):
    with pytest.raises(NetworkXError):
        is_aperiodic(from_nx(spark, nx.path_graph(3)))
    with pytest.raises(NetworkXError):
        is_aperiodic(from_nx(spark, nx.DiGraph([(0, 1)])))  # not strongly conn.
