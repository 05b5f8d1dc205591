"""Parity tests for flow hierarchy, trophic levels, and reaching
centrality vs the reference (networkx/algorithms/hierarchy.py,
centrality/trophic.py, centrality/reaching.py)."""

import networkx as nx
import pytest

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import from_nx
from linkgraph.algos import hierarchy as H


def _digraph(n=40, p=0.08, seed=17):
    return nx.gnp_random_graph(n, p, seed=seed, directed=True)


# --------------------------- flow hierarchy --------------------------- #


def test_flow_hierarchy(spark):
    G = _digraph(seed=3)
    assert H.flow_hierarchy(from_nx(spark, G)) == pytest.approx(
        nx.flow_hierarchy(G)
    )


def test_flow_hierarchy_weighted(spark):
    G = _digraph(30, 0.12, seed=9)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = 1.0 + (i % 3)
    assert H.flow_hierarchy(from_nx(spark, G), weight="weight") == pytest.approx(
        nx.flow_hierarchy(G, weight="weight")
    )


def test_flow_hierarchy_dag_is_one(spark):
    G = nx.gnr_graph(25, 0.2, seed=4)  # a tree (DAG): no cycles
    assert H.flow_hierarchy(from_nx(spark, G)) == pytest.approx(1.0)


def test_flow_hierarchy_rejects(spark):
    with pytest.raises(NetworkXError):
        H.flow_hierarchy(from_nx(spark, nx.empty_graph(3, nx.DiGraph)))
    with pytest.raises(NetworkXError):
        H.flow_hierarchy(from_nx(spark, nx.path_graph(4)))  # undirected


# --------------------------- trophic levels --------------------------- #


def _feedable_digraph(n=30, p=0.1, seed=7):
    """Random digraph where every node is reachable from a basal node
    (guaranteeing the reference's (I-P) is invertible)."""
    G = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    G.add_node(n)  # basal source feeding everything
    for v in range(n):
        if G.in_degree(v) == 0 or v % 7 == 0:
            G.add_edge(n, v)
    return G


def _nx_trophic_levels(G, weight="weight"):
    """Dense-numpy replica of the reference computation (``trophic.py:12``
    builds a = adjacency^T, drops zero-in-degree rows/cols, solves
    (I - P) x = 1, levels = x + 1; basal nodes = 1). The container lacks
    scipy, which nx.trophic_levels imports for the sparse matrix."""
    import numpy as np

    nodes = list(G.nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)))
    for u, v, d in G.edges(data=True):
        a[idx[v], idx[u]] += d.get(weight, 1)
    rowsum = a.sum(axis=1)
    fed = rowsum != 0
    p = a[fed][:, fed] / rowsum[fed][:, np.newaxis]
    y = np.linalg.inv(np.eye(p.shape[0]) - p).sum(axis=1) + 1
    levels = {}
    fed_nodes = [v for v in nodes if fed[idx[v]]]
    for v in nodes:
        if not fed[idx[v]]:
            levels[v] = 1.0
    for i, v in enumerate(fed_nodes):
        levels[v] = y[i]
    return levels


def test_trophic_levels(spark):
    G = _feedable_digraph()
    want = _nx_trophic_levels(G)
    got = {
        r["id"]: r["trophic_level"]
        for r in H.trophic_levels(from_nx(spark, G)).collect()
    }
    assert set(got) == set(want)
    for v, s in want.items():
        assert got[v] == pytest.approx(s, abs=1e-6)


def test_trophic_levels_weighted(spark):
    G = _feedable_digraph(24, 0.12, seed=13)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = 1.0 + (i % 4)
    want = _nx_trophic_levels(G, weight="weight")
    got = {
        r["id"]: r["trophic_level"]
        for r in H.trophic_levels(from_nx(spark, G), weight="weight").collect()
    }
    for v, s in want.items():
        assert got[v] == pytest.approx(s, abs=1e-6)


def test_trophic_levels_diverges_without_basal(spark):
    G = nx.cycle_graph(4, create_using=nx.DiGraph)
    with pytest.raises(NetworkXError):
        H.trophic_levels(from_nx(spark, G), max_iter=30)


def test_trophic_incoherence(spark):
    import numpy as np

    G = _feedable_digraph(20, 0.15, seed=21)  # no self-loops in the fixture
    g = from_nx(spark, G)
    s = _nx_trophic_levels(G)
    want = {(u, v): s[v] - s[u] for u, v in G.edges}  # trophic.py:80
    want_q = float(np.std(list(want.values())))  # trophic.py:110
    lv = H.trophic_levels(g).persist()  # compute once, reuse for both
    got_q = H.trophic_incoherence_parameter(g, levels=lv)
    assert got_q == pytest.approx(want_q, abs=1e-6)
    diffs = {
        (r["src"], r["dst"]): r["diff"]
        for r in H.trophic_differences(g, levels=lv).collect()
    }
    assert set(diffs) == set(want)
    for e, d in want.items():
        assert diffs[e] == pytest.approx(d, abs=1e-6)


# -------------------------- reaching centrality ------------------------ #


def test_local_reaching_directed(spark):
    G = _digraph(seed=29)
    got = {
        r["id"]: r["lrc"]
        for r in H.local_reaching_centrality(from_nx(spark, G)).collect()
    }
    for v in G.nodes:
        assert got[v] == pytest.approx(nx.local_reaching_centrality(G, v))


def test_local_reaching_undirected(spark):
    G = nx.gnp_random_graph(25, 0.1, seed=33)
    got = {
        r["id"]: r["lrc"]
        for r in H.local_reaching_centrality(from_nx(spark, G)).collect()
    }
    for v in G.nodes:
        assert got[v] == pytest.approx(nx.local_reaching_centrality(G, v))


def test_global_reaching(spark):
    G = _digraph(seed=41)
    assert H.global_reaching_centrality(from_nx(spark, G)) == pytest.approx(
        nx.global_reaching_centrality(G)
    )
    # the reference's doc example
    G2 = nx.DiGraph([(1, 2), (1, 3)])
    assert H.global_reaching_centrality(from_nx(spark, G2)) == pytest.approx(1.0)
    G2.add_edge(3, 2)
    assert H.global_reaching_centrality(from_nx(spark, G2)) == pytest.approx(0.75)
