"""Parity tests for tournament recognition/scores and the vertex-cover
2-approximation (networkx tournament.py, approximation/vertex_cover.py)."""

import networkx as nx
import pytest

from linkgraph.exceptions import NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.tournament import is_tournament, score_sequence
from linkgraph.algos.selection import min_vertex_cover_approx


def _rand_tournament(n, seed):
    import random

    rng = random.Random(seed)
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    for u in range(n):
        for v in range(u + 1, n):
            G.add_edge(u, v) if rng.random() < 0.5 else G.add_edge(v, u)
    return G


@pytest.mark.parametrize("seed", [1, 4])
def test_is_tournament(spark, seed):
    T = _rand_tournament(9, seed)
    assert is_tournament(from_nx(spark, T)) == nx.is_tournament(T) == True
    T2 = T.copy()
    u, v = next(iter(T2.edges()))
    T2.add_edge(v, u)  # reciprocal pair breaks it
    assert is_tournament(from_nx(spark, T2)) == nx.is_tournament(T2) == False
    T3 = T.copy()
    T3.remove_edge(u, v)  # missing pair breaks it
    assert is_tournament(from_nx(spark, T3)) == nx.is_tournament(T3) == False
    with pytest.raises(NotImplementedForDirected):
        is_tournament(from_nx(spark, nx.path_graph(3)))


def test_score_sequence(spark):
    T = _rand_tournament(10, 7)
    got = [r["score"] for r in score_sequence(from_nx(spark, T)).collect()]
    assert got == nx.tournament.score_sequence(T)


@pytest.mark.parametrize("seed", [3, 9])
def test_vertex_cover(spark, seed):
    G = nx.gnp_random_graph(40, 0.12, seed=seed)
    cover = {r["id"] for r in min_vertex_cover_approx(from_nx(spark, G)).collect()}
    # validity: every edge covered
    assert all(u in cover or v in cover for u, v in G.edges())
    # factor 2: any matching lower-bounds OPT, and |cover| = 2*|matching|
    ref = nx.approximation.min_weighted_vertex_cover(G)
    assert len(cover) <= 2 * len(ref)
