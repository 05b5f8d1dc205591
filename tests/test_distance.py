"""Parity tests for closeness/harmonic centrality, eccentricity family and
average_shortest_path_length vs the reference."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos import distance as D


def _gnp(n=40, p=0.12, seed=7, directed=False):
    return nx.gnp_random_graph(n, p, seed=seed, directed=directed)


# ------------------------- all-pairs BFS table ------------------------ #


def test_all_pairs_matches_nx(spark):
    G = _gnp()
    want = dict(nx.all_pairs_shortest_path_length(G))
    got = {}
    for r in D.all_pairs_shortest_path_lengths(from_nx(spark, G)).collect():
        got.setdefault(r["source"], {})[r["id"]] = r["distance"]
    assert got == {s: dict(d) for s, d in want.items()}


def test_all_pairs_directed_reverse(spark):
    G = _gnp(30, 0.1, seed=3, directed=True)
    g = from_nx(spark, G)
    want = dict(nx.all_pairs_shortest_path_length(G.reverse()))
    got = {}
    for r in D.all_pairs_shortest_path_lengths(g, reverse=True).collect():
        got.setdefault(r["source"], {})[r["id"]] = r["distance"]
    assert got == {s: dict(d) for s, d in want.items()}


# ---------------------------- closeness ------------------------------- #


@pytest.mark.parametrize("wf", [True, False])
def test_closeness_undirected(spark, wf):
    G = _gnp()
    want = nx.closeness_centrality(G, wf_improved=wf)
    got = {
        r["id"]: r["closeness"]
        for r in D.closeness_centrality(from_nx(spark, G), wf_improved=wf).collect()
    }
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)


def test_closeness_directed_and_disconnected(spark):
    G = nx.DiGraph([(1, 2), (2, 3), (3, 1), (4, 5)])
    G.add_node(6)  # isolate
    want = nx.closeness_centrality(G)
    got = {
        r["id"]: r["closeness"]
        for r in D.closeness_centrality(from_nx(spark, G)).collect()
    }
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)


def test_harmonic(spark):
    G = _gnp(35, 0.1, seed=11)
    G.add_node(99)
    want = nx.harmonic_centrality(G)
    got = {
        r["id"]: r["harmonic"]
        for r in D.harmonic_centrality(from_nx(spark, G)).collect()
    }
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)


def test_harmonic_directed(spark):
    G = _gnp(25, 0.12, seed=5, directed=True)
    want = nx.harmonic_centrality(G)
    got = {
        r["id"]: r["harmonic"]
        for r in D.harmonic_centrality(from_nx(spark, G)).collect()
    }
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)


# ------------------- eccentricity / diameter family ------------------- #


def test_eccentricity_family(spark):
    G = nx.karate_club_graph()
    g = from_nx(spark, G)
    want = nx.eccentricity(G)
    got = {r["id"]: r["eccentricity"] for r in D.eccentricity(g).collect()}
    assert got == want
    assert D.diameter(g) == nx.diameter(G)
    assert D.radius(g) == nx.radius(G)
    assert sorted(r["id"] for r in D.center(g).collect()) == sorted(nx.center(G))
    assert sorted(r["id"] for r in D.periphery(g).collect()) == sorted(
        nx.periphery(G)
    )


def test_eccentricity_disconnected_raises(spark):
    G = nx.Graph([(1, 2), (3, 4)])
    with pytest.raises(ValueError, match="[Ii]nfinite path length"):
        D.eccentricity(from_nx(spark, G))


def test_average_shortest_path_length(spark):
    G = nx.karate_club_graph()
    got = D.average_shortest_path_length(from_nx(spark, G))
    assert got == pytest.approx(nx.average_shortest_path_length(G), abs=1e-12)


def test_average_shortest_path_length_directed(spark):
    G = nx.DiGraph([(1, 2), (2, 3), (3, 1)])
    got = D.average_shortest_path_length(from_nx(spark, G))
    assert got == pytest.approx(nx.average_shortest_path_length(G), abs=1e-12)


def test_average_shortest_path_length_disconnected_raises(spark):
    G = nx.Graph([(1, 2), (3, 4)])
    with pytest.raises(ValueError, match="not connected"):
        D.average_shortest_path_length(from_nx(spark, G))
