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


def test_eccentricity_sources_subset(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.distance import eccentricity

    G = nx.gnp_random_graph(30, 0.15, seed=7)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    G = nx.convert_node_labels_to_integers(G)
    g = from_nx(spark, G)
    subset = [0, 1, 2]
    got = {
        r["id"]: r["eccentricity"]
        for r in eccentricity(
            g, spark.createDataFrame([(i,) for i in subset], "id long")
        ).collect()
    }
    want = {v: nx.eccentricity(G, v) for v in subset}
    assert got == want


def test_eccentricity_bounds_bracket_exact(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.distance import eccentricity, eccentricity_bounds

    G = nx.gnp_random_graph(40, 0.12, seed=11)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    G = nx.convert_node_labels_to_integers(G)
    g = from_nx(spark, G)
    landmarks = spark.createDataFrame([(0,), (5,), (9,)], "id long")
    bounds = {
        r["id"]: (r["ecc_lower"], r["ecc_upper"])
        for r in eccentricity_bounds(g, landmarks).collect()
    }
    exact = nx.eccentricity(G)
    assert set(bounds) == set(G.nodes())
    for v, (lo, hi) in bounds.items():
        assert lo <= exact[v] <= hi
    # landmarks themselves are tight
    assert bounds[0][0] == exact[0]


def test_approximate_diameter_lower_bound_and_tree_exact(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.distance import approximate_diameter

    # two-sweep is exact on trees
    T = nx.balanced_tree(2, 4)
    gt = from_nx(spark, T)
    assert approximate_diameter(gt) == nx.diameter(T)

    G = nx.gnp_random_graph(40, 0.12, seed=3)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    G = nx.convert_node_labels_to_integers(G)
    g = from_nx(spark, G)
    approx = approximate_diameter(g)
    assert approx <= nx.diameter(G)
    assert approx >= nx.diameter(G) - 1  # empirically tight on these fixtures


def test_incremental_closeness_centrality(spark):
    """Parity with closeness.py:142 — incremental result equals the full
    recomputation on the modified graph, for insertions and deletions."""
    import networkx as nx
    import pytest
    from linkgraph.graph import from_nx
    from linkgraph.algos.distance import (
        closeness_centrality,
        incremental_closeness_centrality,
    )
    from linkgraph.exceptions import NetworkXError

    G = nx.gnp_random_graph(20, 0.15, seed=6)
    g = from_nx(spark, G)
    prev = closeness_centrality(g)

    # insertion of a distance-shrinking edge
    far = nx.periphery(G.subgraph(max(nx.connected_components(G), key=len)))
    u, v = far[0], far[-1]
    got = {
        r["id"]: r["closeness"]
        for r in incremental_closeness_centrality(g, (u, v), prev).collect()
    }
    H = G.copy()
    H.add_edge(u, v)
    want = nx.closeness_centrality(H)
    assert got == pytest.approx(want)
    # matches nx's own incremental form
    want_inc = nx.incremental_closeness_centrality(G.copy(), (u, v), nx.closeness_centrality(G))
    assert got == pytest.approx(want_inc)

    # deletion
    e = next(iter(G.edges()))
    got = {
        r["id"]: r["closeness"]
        for r in incremental_closeness_centrality(g, e, prev, insertion=False).collect()
    }
    H = G.copy()
    H.remove_edge(*e)
    assert got == pytest.approx(nx.closeness_centrality(H))

    # prev_cc node mismatch raises
    bad = prev.filter(prev.id != 0)
    with pytest.raises(NetworkXError):
        incremental_closeness_centrality(g, (u, v), bad)
