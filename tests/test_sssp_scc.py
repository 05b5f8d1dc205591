"""Weighted shortest paths + strongly connected components parity vs the
reference (``networkx/algorithms/shortest_paths/tests/test_weighted.py``,
``networkx/algorithms/components/tests/test_strongly_connected.py``)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx, from_edgelist
from linkgraph.algos.sssp import (
    weighted_shortest_path_lengths,
    single_source_weighted_path_length,
    NegativeCycleError,
    has_path,
)
from linkgraph.algos.strongly_connected import (
    strongly_connected_components,
    number_strongly_connected_components,
    is_strongly_connected,
    condensation,
)


def _dist(spark, G, sources):
    g = from_nx(spark, G)
    return {
        r["id"]: r["distance"]
        for r in weighted_shortest_path_lengths(g, sources).collect()
    }


def _scc_partition(spark, G):
    g = from_nx(spark, G)
    rows = strongly_connected_components(g).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["id"])
    return {frozenset(s) for s in by_comp.values()}


# ------------------------------------------------------------------ #
# weighted shortest paths
# ------------------------------------------------------------------ #


def test_sssp_simple_weighted_path(spark):
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 2.0), (1, 2, 2.0), (0, 2, 10.0), (2, 3, 1.0)])
    got = _dist(spark, G, [0])
    want = nx.single_source_dijkstra_path_length(G, 0)
    assert got == pytest.approx(want)


def test_sssp_unreachable_absent(spark):
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 1.0)])
    G.add_node(5)
    got = _dist(spark, G, [0])
    assert set(got) == {0, 1}


@pytest.mark.parametrize("seed", [7, 42])
def test_sssp_random_directed_parity(spark, seed):
    G = nx.gnp_random_graph(60, 0.08, seed=seed, directed=True)
    rng = __import__("random").Random(seed)
    for u, v in G.edges():
        G[u][v]["weight"] = round(rng.uniform(0.1, 5.0), 3)
    got = _dist(spark, G, [0])
    want = nx.single_source_dijkstra_path_length(G, 0)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_sssp_random_undirected_parity(spark):
    G = nx.gnp_random_graph(50, 0.1, seed=3)
    rng = __import__("random").Random(3)
    for u, v in G.edges():
        G[u][v]["weight"] = round(rng.uniform(0.5, 4.0), 3)
    got = _dist(spark, G, [0])
    want = nx.single_source_dijkstra_path_length(G, 0)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_sssp_multisource(spark):
    G = nx.path_graph(10)
    for u, v in G.edges():
        G[u][v]["weight"] = 1.0
    got = _dist(spark, G, [0, 9])
    want = nx.multi_source_dijkstra_path_length(G, {0, 9})
    assert got == pytest.approx(want)


def test_sssp_negative_weights_bellman_ford(spark):
    # negative arcs, no negative cycle: matches bellman_ford
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 5.0), (1, 2, -3.0), (0, 2, 4.0), (2, 3, 1.0)])
    got = _dist(spark, G, [0])
    want = nx.single_source_bellman_ford_path_length(G, 0)
    assert got == pytest.approx(want)


def test_sssp_negative_cycle_raises(spark):
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 1.0), (1, 2, -2.0), (2, 1, 0.5)])
    with pytest.raises(nx.NetworkXUnbounded):
        nx.single_source_bellman_ford_path_length(G, 0)
    g = from_nx(spark, G)
    with pytest.raises(NegativeCycleError):
        weighted_shortest_path_lengths(g, [0])


def test_has_path(spark):
    g = from_edgelist(spark, [(0, 1), (1, 2)], directed=True)
    assert has_path(g, 0, 2)
    assert not has_path(g, 2, 0)


# ------------------------------------------------------------------ #
# strongly connected components
# ------------------------------------------------------------------ #


def test_scc_eppstein_fixture(spark):
    # the Eppstein graph from test_strongly_connected.py:14-21
    G = nx.DiGraph()
    G.add_edges_from(
        [
            (1, 2), (2, 3), (2, 8), (3, 4), (3, 7), (4, 5),
            (5, 3), (5, 6), (7, 4), (7, 6), (8, 1), (8, 7),
        ]
    )
    want = {frozenset(c) for c in nx.strongly_connected_components(G)}
    assert _scc_partition(spark, G) == want


def test_scc_path_all_singletons(spark):
    G = nx.path_graph(12, create_using=nx.DiGraph)
    want = {frozenset(c) for c in nx.strongly_connected_components(G)}
    assert _scc_partition(spark, G) == want


def test_scc_cycle_single_component(spark):
    G = nx.cycle_graph(9, create_using=nx.DiGraph)
    assert _scc_partition(spark, G) == {frozenset(range(9))}
    g = from_nx(spark, G)
    assert is_strongly_connected(g)


@pytest.mark.parametrize("n,p,seed", [(60, 0.05, 11), (80, 0.03, 5)])
def test_scc_random_parity(spark, n, p, seed):
    G = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    want = {frozenset(c) for c in nx.strongly_connected_components(G)}
    assert _scc_partition(spark, G) == want
    g = from_nx(spark, G)
    assert number_strongly_connected_components(g) == len(want)


def test_scc_isolated_nodes(spark):
    G = nx.DiGraph()
    G.add_edges_from([(0, 1), (1, 0)])
    G.add_node(7)
    want = {frozenset(c) for c in nx.strongly_connected_components(G)}
    assert _scc_partition(spark, G) == want


def test_condensation_structure(spark):
    G = nx.DiGraph()
    G.add_edges_from(
        [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5)]
    )
    g = from_nx(spark, G)
    scc = strongly_connected_components(g)
    C = condensation(g, scc)
    # SCC-min labels: {1,2}->1, {3,4}->3, {5}->5; arcs 1->3->5
    edges = {(r["src"], r["dst"]) for r in C.edges.collect()}
    assert edges == {(1, 3), (3, 5)}
    nodes = {r["id"] for r in C.vertices.collect()}
    assert nodes == {1, 3, 5}
    # acyclic like nx.condensation
    nxC = nx.condensation(G)
    assert nx.is_directed_acyclic_graph(nxC)
    assert len(nodes) == nxC.number_of_nodes()
    assert len(edges) == nxC.number_of_edges()


# -------------------- per-source weighted APSP ------------------------- #

from linkgraph.algos.sssp import all_pairs_bellman_ford_path_lengths


def test_all_pairs_bellman_ford(spark):
    import random

    rng = random.Random(7)
    G = nx.gnp_random_graph(18, 0.2, seed=7, directed=True)
    for u, v in G.edges():
        G[u][v]["weight"] = round(rng.uniform(0.5, 3.0), 3)
    got = {
        (r["source"], r["id"]): r["distance"]
        for r in all_pairs_bellman_ford_path_lengths(from_nx(spark, G)).collect()
    }
    want = {
        (s, t): d
        for s, dd in nx.all_pairs_bellman_ford_path_length(G, weight="weight")
        for t, d in dd.items()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_all_pairs_bellman_ford_landmarks_and_negative(spark):
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 2.0), (1, 2, -1.0), (2, 3, 4.0), (0, 3, 6.0)])
    lm = spark.createDataFrame([(0,), (1,)], "id bigint")
    got = {
        (r["source"], r["id"]): r["distance"]
        for r in all_pairs_bellman_ford_path_lengths(
            from_nx(spark, G), lm
        ).collect()
    }
    assert got[(0, 3)] == pytest.approx(5.0)
    assert got[(1, 3)] == pytest.approx(3.0)
    assert set(s for s, _ in got) == {0, 1}
    # negative cycle raises
    C = nx.DiGraph()
    C.add_weighted_edges_from([(0, 1, 1.0), (1, 0, -2.0)])
    from linkgraph.algos.sssp import NegativeCycleError

    with pytest.raises(NegativeCycleError):
        all_pairs_bellman_ford_path_lengths(from_nx(spark, C)).count()
