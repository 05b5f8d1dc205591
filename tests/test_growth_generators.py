"""Growth-process generator tail (``networkx/generators/{directed,
duplication,random_graphs,cographs,degree_seq,random_clustered}.py``):
structural/distributional parity vs the reference models."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph.random_graphs as rg
from linkgraph.exceptions import NetworkXError


def _to_nx(g):
    G = nx.DiGraph() if g.directed else nx.Graph()
    G.add_nodes_from(r["id"] for r in g.vertices.select("id").collect())
    G.add_edges_from(
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    )
    return G


def test_scale_free_graph(spark):
    g = rg.scale_free_graph(spark, 80, seed=4)
    assert g.directed
    assert g.vertices.count() == 80
    # multi-arc process: arc count grows one per step beyond the seed cycle
    assert g.edges.count() >= 3
    # heavy-tail sanity: max in-degree well above the mean
    indeg = [r["cnt"] for r in
             g.edges.groupBy("dst").count().withColumnRenamed("count", "cnt").collect()]
    assert max(indeg) >= 3 * (sum(indeg) / len(indeg))
    # seeded determinism
    h1 = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    g2 = rg.scale_free_graph(spark, 80, seed=4)
    h2 = sorted((r["src"], r["dst"]) for r in g2.edges.collect())
    assert h1 == h2
    with pytest.raises(ValueError):
        rg.scale_free_graph(spark, 10, alpha=0.5, beta=0.5, gamma=0.5)


def test_random_k_out_graph(spark):
    g = rg.random_k_out_graph(spark, 20, 3, alpha=1.0, seed=2)
    out = {r["src"]: r["cnt"] for r in
           g.edges.groupBy("src").count().withColumnRenamed("count", "cnt").collect()}
    assert all(out.get(v, 0) == 3 for v in range(20))
    g2 = rg.random_k_out_graph(spark, 20, 2, alpha=0.5, self_loops=False, seed=2)
    assert g2.edges.filter("src = dst").count() == 0
    with pytest.raises(ValueError):
        rg.random_k_out_graph(spark, 5, 2, alpha=-1.0)


def test_duplication_divergence(spark):
    g = rg.duplication_divergence_graph(spark, 30, 0.4, seed=3)
    G = _to_nx(g)
    assert G.number_of_nodes() == 30
    assert min(dict(G.degree()).values()) >= 1  # replicas keep >= 1 link
    with pytest.raises(NetworkXError):
        rg.duplication_divergence_graph(spark, 1, 0.4)
    with pytest.raises(NetworkXError):
        rg.duplication_divergence_graph(spark, 10, 1.4)


def test_partial_duplication(spark):
    g = rg.partial_duplication_graph(spark, 25, 5, 0.4, 0.3, seed=5)
    G = _to_nx(g)
    assert G.number_of_nodes() == 25
    # the K_5 core survives
    for u in range(5):
        for v in range(u + 1, 5):
            assert G.has_edge(u, v)
    with pytest.raises(NetworkXError):
        rg.partial_duplication_graph(spark, 5, 10, 0.5, 0.5)


def test_dual_barabasi_albert(spark):
    g = rg.dual_barabasi_albert_graph(spark, 50, 3, 1, 0.5, seed=6)
    G = _to_nx(g)
    assert G.number_of_nodes() == 50
    assert nx.is_connected(G)
    # edges between star seed and mixture growth: bounded by the m1 path
    assert 3 + (50 - 4) * 1 <= G.number_of_edges() <= 3 + (50 - 4) * 3
    with pytest.raises(NetworkXError):
        rg.dual_barabasi_albert_graph(spark, 10, 2, 1, 1.5)


def test_extended_barabasi_albert(spark):
    g = rg.extended_barabasi_albert_graph(spark, 40, 2, 0.2, 0.2, seed=7)
    G = _to_nx(g)
    assert G.number_of_nodes() == 40
    assert max(dict(G.degree()).values()) >= 5  # hubs form
    with pytest.raises(NetworkXError):
        rg.extended_barabasi_albert_graph(spark, 10, 2, 0.6, 0.5)


def test_random_powerlaw_tree(spark):
    seq = rg.random_powerlaw_tree_sequence(20, gamma=3, seed=1, tries=2000)
    assert sum(seq) == 2 * (20 - 1) and min(seq) >= 1
    g = rg.random_powerlaw_tree(spark, 20, gamma=3, seed=1, tries=2000)
    G = _to_nx(g)
    assert nx.is_tree(G)
    assert sorted(d for _, d in G.degree()) == sorted(seq)


def test_random_clustered_graph(spark):
    joint = [(1, 1), (1, 1), (1, 1), (2, 0), (0, 0), (1, 0)]
    g = rg.random_clustered_graph(spark, joint, seed=8)
    assert g.vertices.count() == 6
    # stub math: 6 independent halves -> 3 edges; 4... triangles need %3
    with pytest.raises(NetworkXError):
        rg.random_clustered_graph(spark, [(1, 1), (0, 1)], seed=8)


def test_random_shell_graph(spark):
    g = rg.random_shell_graph(spark, [(10, 20, 0.8), (20, 40, 0.8)], seed=9)
    G = _to_nx(g)
    assert G.number_of_nodes() == 30
    # shells only connect to adjacent shells (here: all edges valid anyway)
    assert G.number_of_edges() > 0


def test_random_cograph(spark):
    g = rg.random_cograph(spark, 4, seed=10)
    G = _to_nx(g)
    assert G.number_of_nodes() == 16
    # cograph invariant: no induced P4
    from itertools import combinations

    p4 = nx.path_graph(4)
    for quad in list(combinations(sorted(G), 4))[:400]:
        sub = G.subgraph(quad)
        assert not nx.is_isomorphic(sub, p4)


def test_random_degree_sequence_graph(spark):
    seq = [3, 2, 2, 2, 1, 2]
    g = rg.random_degree_sequence_graph(spark, seq, seed=11, tries=200)
    G = _to_nx(g)
    assert sorted(d for _, d in G.degree()) == sorted(seq)
    with pytest.raises(NetworkXError):
        rg.random_degree_sequence_graph(spark, [5, 1], seed=1)


def test_random_lobster_graph_alias(spark):
    a = rg.random_lobster(spark, 8, 0.4, 0.3, seed=12)
    b = rg.random_lobster_graph(spark, 8, 0.4, 0.3, seed=12)
    ea = sorted((r["src"], r["dst"]) for r in a.edges.collect())
    eb = sorted((r["src"], r["dst"]) for r in b.edges.collect())
    assert ea == eb
