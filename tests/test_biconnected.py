"""Parity tests for biconnected components and articulation points."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos import biconnected as BC
from linkgraph.exceptions import NotImplementedForDirected


def _want_blocks(G):
    return {frozenset(frozenset(e) for e in nx.biconnected_component_edges(G))}


def _blocks_as_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["block"], set()).add(frozenset((r["u"], r["v"])))
    return set(frozenset(v) for v in out.values())


def _check(spark, G):
    want = {
        frozenset(frozenset(e) for e in comp)
        for comp in nx.biconnected_component_edges(G)
    }
    rows = BC.biconnected_components(from_nx(spark, G)).collect()
    got = _blocks_as_sets(rows)
    assert got == want
    want_ap = set(nx.articulation_points(G))
    got_ap = {r["id"] for r in BC.articulation_points(from_nx(spark, G)).collect()}
    assert got_ap == want_ap


def test_path(spark):
    _check(spark, nx.path_graph(8))


def test_cycle(spark):
    _check(spark, nx.cycle_graph(9))


def test_barbell(spark):
    _check(spark, nx.barbell_graph(5, 3))


def test_lollipop(spark):
    _check(spark, nx.lollipop_graph(5, 4))


def test_two_cycles_sharing_a_vertex(spark):
    G = nx.Graph()
    nx.add_cycle(G, [0, 1, 2, 3])
    nx.add_cycle(G, [3, 4, 5, 6])
    _check(spark, G)


def test_gnp_sparse(spark):
    _check(spark, nx.gnp_random_graph(40, 0.06, seed=5))


def test_gnp_denser(spark):
    _check(spark, nx.gnp_random_graph(30, 0.12, seed=11))


def test_disconnected_mixed(spark):
    G = nx.gnp_random_graph(30, 0.05, seed=17)
    nx.add_cycle(G, [100, 101, 102])
    G.add_edge(102, 103)
    _check(spark, G)


def test_directed_raises(spark):
    with pytest.raises(NotImplementedForDirected):
        BC.biconnected_components(from_nx(spark, nx.DiGraph([(1, 2)])))


# --------------------------- is_biconnected ---------------------------- #

from linkgraph.algos.biconnected import is_biconnected


def test_is_biconnected(spark):
    for G in [
        nx.cycle_graph(6),
        nx.path_graph(5),
        nx.complete_graph(4),
        nx.barbell_graph(3, 1),
        nx.Graph([(0, 1)]),
        nx.empty_graph(1),
        nx.disjoint_union(nx.cycle_graph(3), nx.cycle_graph(3)),
    ]:
        assert is_biconnected(from_nx(spark, G)) == nx.is_biconnected(G), G.edges
