"""Parity tests for tree/forest recognition and cycle_basis."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos import tree as T
from linkgraph.algos.cycles import cycle_basis
from linkgraph.exceptions import NetworkXError, NotImplementedForDirected


# ---------------------------------------------------------------- trees


UNDIRECTED_CASES = [
    nx.path_graph(7),
    nx.star_graph(5),
    nx.cycle_graph(6),
    nx.complete_graph(5),
    nx.Graph([(0, 1), (2, 3), (3, 4)]),  # forest, 2 components
    nx.Graph([(0, 1), (1, 2), (2, 0), (5, 6)]),  # cycle + tree
]


@pytest.mark.parametrize("G", UNDIRECTED_CASES)
def test_is_tree_forest_undirected(spark, G):
    g = from_nx(spark, G)
    assert T.is_tree(g) == nx.is_tree(G)
    assert T.is_forest(g) == nx.is_forest(G)


def test_selfloop_is_cycle(spark):
    G = nx.Graph([(0, 1), (1, 1)])
    g = from_nx(spark, G)
    assert T.is_tree(g) == nx.is_tree(G) == False
    assert T.is_forest(g) == nx.is_forest(G) == False


DIRECTED_CASES = [
    nx.DiGraph([(0, 1), (0, 2), (2, 3), (3, 4)]),  # arborescence
    nx.DiGraph([(0, 1), (2, 3)]),  # branching, 2 components
    nx.DiGraph([(0, 1), (1, 0)]),  # reciprocal arcs = undirected 2-cycle
    nx.DiGraph([(0, 1), (2, 1)]),  # tree underlying, in-degree 2
    nx.DiGraph([(0, 1), (1, 2), (2, 0)]),  # directed triangle
]


@pytest.mark.parametrize("G", DIRECTED_CASES)
def test_directed_recognition(spark, G):
    g = from_nx(spark, G)
    assert T.is_tree(g) == nx.is_tree(G)
    assert T.is_forest(g) == nx.is_forest(G)
    assert T.is_branching(g) == nx.is_branching(G)
    assert T.is_arborescence(g) == nx.is_arborescence(G)


def test_null_graph_raises(spark):
    with pytest.raises(NetworkXError):
        T.is_tree(from_nx(spark, nx.Graph()))


def test_branching_raises_undirected(spark):
    with pytest.raises(NotImplementedForDirected):
        T.is_branching(from_nx(spark, nx.path_graph(3)))


# ---------------------------------------------------------- cycle_basis


def _gf2_rank(cycles, G):
    edge_idx = {frozenset(e): i for i, e in enumerate(G.edges())}
    rows = []
    for cyc in cycles:
        vec = 0
        n = len(cyc)
        if n == 1:
            continue  # self-loop: always independent, count separately
        for i in range(n):
            e = frozenset((cyc[i], cyc[(i + 1) % n]))
            vec ^= 1 << edge_idx[e]
        rows.append(vec)
    rank = 0
    basis = []
    for v in rows:
        for b in basis:
            v = min(v, v ^ b)
        if v:
            basis.append(v)
            rank += 1
    return rank


def _check_basis(spark, G):
    g = from_nx(spark, G)
    got = [list(r["cycle"]) for r in cycle_basis(g).collect()]
    want_dim = len(nx.cycle_basis(G))  # nx includes self-loop cycles
    assert len(got) == want_dim
    n_selfloops = 0
    for cyc in got:
        if len(cyc) == 1:
            assert G.has_edge(cyc[0], cyc[0])
            n_selfloops += 1
            continue
        assert len(set(cyc)) == len(cyc) and len(cyc) >= 3
        for i in range(len(cyc)):
            assert G.has_edge(cyc[i], cyc[(i + 1) % len(cyc)]), cyc
    # independence over GF(2): rank of the edge-incidence vectors equals
    # the number of non-selfloop cycles
    assert _gf2_rank(got, G) == len(got) - n_selfloops


def test_basis_triangle_plus_tail(spark):
    _check_basis(spark, nx.Graph([(0, 1), (1, 2), (2, 0), (2, 3)]))


def test_basis_two_squares(spark):
    G = nx.Graph()
    nx.add_cycle(G, [0, 1, 2, 3])
    nx.add_cycle(G, [2, 3, 4, 5])
    _check_basis(spark, G)


def test_basis_complete(spark):
    _check_basis(spark, nx.complete_graph(6))


def test_basis_disconnected(spark):
    G = nx.Graph()
    nx.add_cycle(G, [0, 1, 2])
    nx.add_cycle(G, [10, 11, 12, 13])
    G.add_edge(20, 21)
    _check_basis(spark, G)


def test_basis_forest_is_empty(spark):
    G = nx.random_labeled_tree(12, seed=4)
    assert cycle_basis(from_nx(spark, G)).count() == 0


def test_basis_selfloop(spark):
    _check_basis(spark, nx.Graph([(0, 1), (1, 1), (0, 0)]))


def test_basis_gnp(spark):
    _check_basis(spark, nx.gnp_random_graph(25, 0.12, seed=9))


def test_basis_grid(spark):
    G = nx.convert_node_labels_to_integers(nx.grid_2d_graph(4, 5))
    _check_basis(spark, G)


def test_basis_raises_directed(spark):
    with pytest.raises(NotImplementedForDirected):
        cycle_basis(from_nx(spark, nx.DiGraph([(0, 1)])))
