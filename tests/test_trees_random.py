"""Uniform random tree/forest tail + nonisomorphic-tree enumeration
(``networkx/generators/{trees,nonisomorphic_trees}.py``)."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph.random_graphs as rg
from linkgraph.nonisomorphic_trees import (
    nonisomorphic_trees,
    number_of_nonisomorphic_trees,
)
from linkgraph.exceptions import NetworkXError


def _to_nx(g):
    G = nx.Graph()
    G.add_nodes_from(r["id"] for r in g.vertices.select("id").collect())
    G.add_edges_from(
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    )
    return G


def test_random_labeled_rooted_tree(spark):
    g = rg.random_labeled_rooted_tree(spark, 12, seed=3)
    G = _to_nx(g)
    assert nx.is_tree(G)
    assert 0 <= g.graph["root"] < 12


def test_random_labeled_rooted_forest(spark):
    g = rg.random_labeled_rooted_forest(spark, 10, seed=5)
    G = _to_nx(g)
    assert nx.is_forest(G)
    roots = g.graph["roots"]
    assert roots and all(0 <= r < 10 for r in roots)
    # every component contains exactly one root
    for comp in nx.connected_components(G):
        assert len(comp & roots) == 1


@pytest.mark.parametrize("n", [1, 2, 5, 9])
def test_random_unlabeled_rooted_tree(spark, n):
    g = rg.random_unlabeled_rooted_tree(spark, n, seed=7)
    G = _to_nx(g)
    assert nx.is_tree(G) and G.number_of_nodes() == n
    assert g.graph["root"] == 0
    many = rg.random_unlabeled_rooted_tree(spark, 4, number_of_trees=3, seed=7)
    assert len(many) == 3


def test_random_unlabeled_rooted_forest(spark):
    g = rg.random_unlabeled_rooted_forest(spark, 8, q=3, seed=9)
    G = _to_nx(g)
    assert nx.is_forest(G) and G.number_of_nodes() == 8
    for comp in nx.connected_components(G):
        assert len(comp) <= 3
    assert len(g.graph["roots"]) == nx.number_connected_components(G)
    with pytest.raises(NetworkXError):
        rg.random_unlabeled_rooted_forest(spark, 5, q=0)


@pytest.mark.parametrize("n", [1, 2, 6, 11])
def test_random_unlabeled_tree(spark, n):
    g = rg.random_unlabeled_tree(spark, n, seed=11)
    G = _to_nx(g)
    assert nx.is_tree(G) and G.number_of_nodes() == n
    with pytest.raises(NetworkXError):
        rg.random_unlabeled_tree(spark, 0)


def test_unlabeled_tree_distribution_covers_classes(spark):
    # n=4 has 2 free trees (path, star): both should appear across seeds
    shapes = set()
    for s in range(12):
        G = _to_nx(rg.random_unlabeled_tree(spark, 4, seed=s))
        shapes.add(max(d for _, d in G.degree()))
    assert shapes == {2, 3}


@pytest.mark.parametrize("order,count", [(0, 1), (1, 1), (4, 2), (7, 11), (10, 106)])
def test_number_of_nonisomorphic_trees(order, count):
    if order == 0:
        assert number_of_nonisomorphic_trees(0) in (0, 1)  # OEIS offset
    else:
        assert number_of_nonisomorphic_trees(order) == nx.number_of_nonisomorphic_trees(order)


@pytest.mark.parametrize("order", [2, 5, 7])
def test_nonisomorphic_trees_enumeration(spark, order):
    got = [(g, _to_nx(g)) for g in nonisomorphic_trees(spark, order)]
    assert len(got) == nx.number_of_nonisomorphic_trees(order)
    for _, G in got:
        assert nx.is_tree(G) and G.number_of_nodes() == order
    # pairwise nonisomorphic
    for i in range(len(got)):
        for j in range(i + 1, len(got)):
            assert not nx.is_isomorphic(got[i][1], got[j][1])
