"""Clique enumeration parity vs the reference (`clique.py`)."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.cliques import (
    k_cliques,
    k_clique_count,
    node_clique_counts,
    find_cliques,
)
from linkgraph.exceptions import NotImplementedForDirected


@pytest.fixture
def G():
    G = nx.gnp_random_graph(18, 0.35, seed=21)
    G.add_node(99)  # isolated vertex
    return G


def _nx_k_cliques(G, k):
    return {tuple(sorted(c)) for c in nx.enumerate_all_cliques(G) if len(c) == k}


def test_k_clique_counts_match_nx(spark, G):
    g = from_nx(spark, G)
    for k in (2, 3, 4, 5):
        assert k_clique_count(g, k) == len(_nx_k_cliques(G, k)), k


def test_k_cliques_membership_exact(spark, G):
    g = from_nx(spark, G)
    got = {
        tuple(sorted(r["members"])) for r in k_cliques(g, 4).collect()
    }
    assert got == _nx_k_cliques(G, 4)


def test_node_clique_counts_match_nx(spark, G):
    g = from_nx(spark, G)
    got = {r["id"]: r["cliques"] for r in node_clique_counts(g, 3).collect()}
    want = {n: 0 for n in G}
    for c in _nx_k_cliques(G, 3):
        for n in c:
            want[n] += 1
    assert got == want


def test_find_cliques_maximal_match_nx(spark, G):
    g = from_nx(spark, G)
    got = {tuple(sorted(r["members"])) for r in find_cliques(g).collect()}
    want = {tuple(sorted(c)) for c in nx.find_cliques(G)}
    assert got == want  # includes the isolated vertex as a 1-clique


def test_find_cliques_max_size_cap(spark, G):
    g = from_nx(spark, G)
    got = {tuple(sorted(r["members"])) for r in find_cliques(g, max_size=3).collect()}
    # every maximal clique of size <= 3 must be present
    for c in nx.find_cliques(G):
        if len(c) <= 3:
            assert tuple(sorted(c)) in got


def test_cliques_raise_on_directed(spark):
    G = nx.gnp_random_graph(6, 0.4, seed=1, directed=True)
    g = from_nx(spark, G)
    with pytest.raises(NotImplementedForDirected):
        k_cliques(g, 3)


def test_k1_cliques_are_vertices(spark, G):
    g = from_nx(spark, G)
    assert k_clique_count(g, 1) == G.number_of_nodes()
