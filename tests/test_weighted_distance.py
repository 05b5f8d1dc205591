"""Weighted closeness/harmonic (distance=) parity vs nx."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.distance import (
    closeness_centrality,
    harmonic_centrality,
    all_pairs_shortest_path_lengths,
)


def _wG(directed=False):
    G = nx.DiGraph() if directed else nx.Graph()
    for u, v, w in [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (2, 3, 1.5),
                    (3, 4, 2.0), (1, 4, 6.0)]:
        G.add_edge(u, v, weight=w)
    return G


@pytest.mark.parametrize("directed", [False, True])
def test_weighted_closeness(spark, directed):
    G = _wG(directed)
    g = from_nx(spark, G)
    for wf in (True, False):
        want = nx.closeness_centrality(G, distance="weight", wf_improved=wf)
        got = {
            r["id"]: r["closeness"]
            for r in closeness_centrality(
                g, distance="weight", wf_improved=wf
            ).collect()
        }
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9), (v, wf)


@pytest.mark.parametrize("directed", [False, True])
def test_weighted_harmonic(spark, directed):
    G = _wG(directed)
    g = from_nx(spark, G)
    want = nx.harmonic_centrality(G, distance="weight")
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(g, distance="weight").collect()
    }
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_weighted_apsp_matches_dijkstra(spark):
    G = _wG(False)
    g = from_nx(spark, G)
    sp = all_pairs_shortest_path_lengths(g, distance="weight")
    got = {(r["source"], r["id"]): r["distance"] for r in sp.collect()}
    want = dict(nx.all_pairs_dijkstra_path_length(G))
    for s, dd in want.items():
        for t, d in dd.items():
            assert got[(s, t)] == pytest.approx(d, abs=1e-12), (s, t)
    assert len(got) == sum(len(dd) for dd in want.values())


def test_negative_distance_raises(spark):
    G = nx.Graph()
    G.add_edge(0, 1, weight=-1.0)
    g = from_nx(spark, G)
    with pytest.raises(ValueError):
        all_pairs_shortest_path_lengths(g, distance="weight").collect()


def test_weighted_ecc_family(spark):
    from linkgraph.algos.distance import (
        eccentricity, diameter, radius, center, periphery,
        average_shortest_path_length,
    )

    G = _wG(False)
    g = from_nx(spark, G)
    want_ecc = nx.eccentricity(G, weight="weight")
    got_ecc = {
        r["id"]: r["eccentricity"]
        for r in eccentricity(g, weight="weight").collect()
    }
    for v in want_ecc:
        assert got_ecc[v] == pytest.approx(want_ecc[v], abs=1e-12), v
    assert diameter(g, weight="weight") == pytest.approx(
        nx.diameter(G, weight="weight")
    )
    assert radius(g, weight="weight") == pytest.approx(
        nx.radius(G, weight="weight")
    )
    assert {r["id"] for r in center(g, weight="weight").collect()} == set(
        nx.center(G, weight="weight")
    )
    assert {r["id"] for r in periphery(g, weight="weight").collect()} == set(
        nx.periphery(G, weight="weight")
    )
    assert average_shortest_path_length(g, weight="weight") == pytest.approx(
        nx.average_shortest_path_length(G, weight="weight")
    )
