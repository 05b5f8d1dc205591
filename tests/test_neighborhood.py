"""Parity tests for neighborhood stats, boundaries, structural holes,
wiener index and efficiency measures vs the reference."""

import math

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos import neighborhood as NB


def _gnp(n=40, p=0.12, seed=7, directed=False):
    return nx.gnp_random_graph(n, p, seed=seed, directed=directed)


# ---------------------- average neighbor degree ----------------------- #


def test_average_neighbor_degree(spark):
    G = _gnp()
    G.add_node(99)  # isolate -> 0.0
    want = nx.average_neighbor_degree(G)
    got = {
        r["id"]: r["avg_nbr_deg"]
        for r in NB.average_neighbor_degree(from_nx(spark, G)).collect()
    }
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)


def test_average_neighbor_degree_weighted(spark):
    G = _gnp(30, 0.15, seed=3)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = 1.0 + (i % 5)
    want = nx.average_neighbor_degree(G, weight="weight")
    got = {
        r["id"]: r["avg_nbr_deg"]
        for r in NB.average_neighbor_degree(
            from_nx(spark, G), weight="weight"
        ).collect()
    }
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)


def test_average_neighbor_degree_directed(spark):
    G = _gnp(30, 0.1, seed=5, directed=True)
    want = nx.average_neighbor_degree(G)  # source="out", target="out"
    got = {
        r["id"]: r["avg_nbr_deg"]
        for r in NB.average_neighbor_degree(from_nx(spark, G)).collect()
    }
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)


def test_average_degree_connectivity(spark):
    G = _gnp()
    want = nx.average_degree_connectivity(G)
    got = {
        r["degree"]: r["knn"]
        for r in NB.average_degree_connectivity(from_nx(spark, G)).collect()
    }
    # nx includes k=0 entries only when a degree-0 node exists with nbrs (it
    # can't); our table omits degrees with no arcs, matching nonzero keys.
    for k, v in want.items():
        if k == 0:
            continue
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_average_degree_connectivity_directed(spark):
    G = _gnp(30, 0.1, seed=9, directed=True)
    want = nx.average_degree_connectivity(G)
    got = {
        r["degree"]: r["knn"]
        for r in NB.average_degree_connectivity(from_nx(spark, G)).collect()
    }
    for k, v in want.items():
        if k == 0:
            continue
        assert got[k] == pytest.approx(v, abs=1e-9)


# ----------------------------- boundaries ------------------------------ #


def _nodes_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def test_node_boundary(spark):
    G = _gnp()
    s1 = set(range(0, 15))
    want = nx.node_boundary(G, s1)
    g = from_nx(spark, G)
    got = {r["id"] for r in NB.node_boundary(g, _nodes_df(spark, s1)).collect()}
    assert got == want


def test_node_boundary_restricted(spark):
    G = _gnp()
    s1, s2 = set(range(0, 15)), set(range(10, 30))
    want = nx.node_boundary(G, s1, s2)
    got = {
        r["id"]
        for r in NB.node_boundary(
            from_nx(spark, G), _nodes_df(spark, s1), _nodes_df(spark, s2)
        ).collect()
    }
    assert got == want


def test_edge_boundary(spark):
    G = _gnp()
    s1 = set(range(0, 15))
    want = {frozenset(e) for e in nx.edge_boundary(G, s1)}
    got = {
        frozenset((r["src"], r["dst"]))
        for r in NB.edge_boundary(from_nx(spark, G), _nodes_df(spark, s1)).collect()
    }
    assert got == want


def test_edge_boundary_directed(spark):
    G = _gnp(30, 0.1, seed=4, directed=True)
    s1 = set(range(0, 12))
    want = set(nx.edge_boundary(G, s1))
    got = {
        (r["src"], r["dst"])
        for r in NB.edge_boundary(from_nx(spark, G), _nodes_df(spark, s1)).collect()
    }
    assert got == want


# ---------------------------- local bridges ---------------------------- #


def test_local_bridges(spark):
    G = _gnp(40, 0.08, seed=13)
    want = {frozenset((u, v)) for u, v, _ in nx.local_bridges(G)}
    got = {
        frozenset((r["u"], r["v"]))
        for r in NB.local_bridges(from_nx(spark, G)).collect()
    }
    assert got == want


def test_local_bridges_span(spark):
    G = _gnp(30, 0.1, seed=17)
    want = {frozenset((u, v)): s for u, v, s in nx.local_bridges(G)}
    rows = NB.local_bridges(from_nx(spark, G), with_span=True, max_span=25).collect()
    got = {frozenset((r["u"], r["v"])): r["span"] for r in rows}
    assert set(got) == set(want)
    for k, s in want.items():
        if s == float("inf"):
            assert got[k] is None
        else:
            assert got[k] == s


# -------------------------- structural holes --------------------------- #


def test_effective_size(spark):
    G = _gnp(35, 0.15, seed=19)
    G.add_node(99)  # isolate -> nan in nx, NULL here
    want = nx.effective_size(G)
    got = {
        r["id"]: r["effective_size"]
        for r in NB.effective_size(from_nx(spark, G)).collect()
    }
    assert set(got) == set(want)
    for n, v in want.items():
        if math.isnan(v):
            assert got[n] is None
        else:
            assert got[n] == pytest.approx(v, abs=1e-9)


def test_constraint(spark):
    G = _gnp(30, 0.15, seed=23)
    G.add_node(99)
    want = nx.constraint(G)
    got = {
        r["id"]: r["constraint"]
        for r in NB.constraint(from_nx(spark, G)).collect()
    }
    assert set(got) == set(want)
    for n, v in want.items():
        if math.isnan(v):
            assert got[n] is None
        else:
            assert got[n] == pytest.approx(v, abs=1e-9)


def test_constraint_weighted(spark):
    G = _gnp(25, 0.18, seed=29)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = 1.0 + (i % 4)
    want = nx.constraint(G, weight="weight")
    got = {
        r["id"]: r["constraint"]
        for r in NB.constraint(from_nx(spark, G), weight="weight").collect()
    }
    for n, v in want.items():
        if isinstance(v, float) and math.isnan(v):
            assert got[n] is None
        else:
            assert got[n] == pytest.approx(v, abs=1e-9)


def test_constraint_directed(spark):
    G = _gnp(20, 0.12, seed=31, directed=True)
    want = nx.constraint(G)
    got = {
        r["id"]: r["constraint"]
        for r in NB.constraint(from_nx(spark, G)).collect()
    }
    for n, v in want.items():
        if isinstance(v, float) and math.isnan(v):
            assert got[n] is None
        else:
            assert got[n] == pytest.approx(v, abs=1e-9)


# -------------------- wiener index and efficiency ---------------------- #


def test_wiener_index(spark):
    G = nx.path_graph(12)
    assert NB.wiener_index(from_nx(spark, G)) == nx.wiener_index(G)


def test_wiener_index_disconnected(spark):
    G = nx.path_graph(6)
    G.add_node(100)
    assert NB.wiener_index(from_nx(spark, G)) == float("inf")


def test_wiener_index_directed(spark):
    G = nx.DiGraph([(1, 2), (2, 3), (3, 1)])
    assert NB.wiener_index(from_nx(spark, G)) == nx.wiener_index(G)


def test_global_efficiency(spark):
    G = _gnp(30, 0.1, seed=37)
    assert NB.global_efficiency(from_nx(spark, G)) == pytest.approx(
        nx.global_efficiency(G), abs=1e-9
    )


def test_local_efficiency(spark):
    G = _gnp(25, 0.15, seed=41)
    assert NB.local_efficiency(from_nx(spark, G)) == pytest.approx(
        nx.local_efficiency(G), abs=1e-9
    )


# ------------------- wiener-family distance indices -------------------- #

from linkgraph.algos.neighborhood import schultz_index, gutman_index, harmonic_diameter


def test_schultz_gutman(spark):
    G = nx.gnp_random_graph(20, 0.2, seed=9)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    g = from_nx(spark, G)
    assert schultz_index(g) == pytest.approx(nx.schultz_index(G))
    assert gutman_index(g) == pytest.approx(nx.gutman_index(G))
    disc = from_nx(spark, nx.disjoint_union(nx.path_graph(2), nx.path_graph(2)))
    assert schultz_index(disc) == float("inf")
    assert gutman_index(disc) == float("inf")


def test_harmonic_diameter(spark):
    G = nx.gnp_random_graph(18, 0.2, seed=5)
    assert harmonic_diameter(from_nx(spark, G)) == pytest.approx(
        nx.harmonic_diameter(G)
    )
    D = nx.gnp_random_graph(15, 0.12, seed=7, directed=True)
    assert harmonic_diameter(from_nx(spark, D)) == pytest.approx(
        nx.harmonic_diameter(D)
    )


def test_closeness_vitality(spark):
    from linkgraph.algos.neighborhood import closeness_vitality

    G = nx.gnp_random_graph(16, 0.3, seed=3)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    g = from_nx(spark, G)
    want = nx.closeness_vitality(G)
    for v in list(G.nodes)[:3]:
        assert closeness_vitality(g, v) == pytest.approx(want[v])


def test_group_centralities(spark):
    from linkgraph.algos.neighborhood import (
        group_degree_centrality,
        group_closeness_centrality,
    )

    G = nx.gnp_random_graph(22, 0.15, seed=11)
    g = from_nx(spark, G)
    S = [0, 3, 7]
    sdf = spark.createDataFrame([(int(v),) for v in S], "id bigint")
    assert group_degree_centrality(g, sdf) == pytest.approx(
        nx.group_degree_centrality(G, S)
    )
    assert group_closeness_centrality(g, sdf) == pytest.approx(
        nx.group_closeness_centrality(G, S)
    )
    D = nx.gnp_random_graph(18, 0.15, seed=13, directed=True)
    gd = from_nx(spark, D)
    sdf2 = spark.createDataFrame([(1,), (4,)], "id bigint")
    assert group_closeness_centrality(gd, sdf2) == pytest.approx(
        nx.group_closeness_centrality(D, [1, 4])
    )
