"""Community tail (``networkx/algorithms/community/*``)."""

from __future__ import annotations

import networkx as nx
import pytest
from networkx.algorithms import community as nxc

import linkgraph as lg
from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError


def _sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["community"], set()).add(r["id"])
    return sorted(out.values(), key=lambda s: min(s))


def test_is_partition(spark):
    G = nx.path_graph(5)
    g = from_nx(spark, G)
    assert lg.is_partition(g, [{0, 1}, {2, 3, 4}])
    assert not lg.is_partition(g, [{0, 1}, {2, 3}])
    assert not lg.is_partition(g, [{0, 1, 2}, {2, 3, 4}])


def test_girvan_newman_barbell_parity(spark):
    G = nx.barbell_graph(4, 0)
    g = from_nx(spark, G)
    got = _sets(next(lg.girvan_newman(g)))
    want = sorted(next(nxc.girvan_newman(G)), key=lambda s: min(s))
    assert got == want


def test_kernighan_lin_bisection(spark):
    G = nx.barbell_graph(5, 0)
    g = from_nx(spark, G)
    A, B = lg.kernighan_lin_bisection(g, seed=3)
    assert {frozenset(A), frozenset(B)} == {
        frozenset(range(5)), frozenset(range(5, 10))
    }
    with pytest.raises(NetworkXError):
        lg.kernighan_lin_bisection(g, partition=({0}, {1}))


def test_k_clique_communities_parity(spark):
    G = nx.ring_of_cliques(4, 4)
    g = from_nx(spark, G)
    got = _sets(lg.k_clique_communities(g, 3))
    want = sorted(
        (set(c) for c in nxc.k_clique_communities(G, 3)), key=lambda s: min(s)
    )
    assert got == want


def test_lukes_partitioning_parity(spark):
    G = nx.path_graph(7)
    g = from_nx(spark, G)
    got = sorted(lg.lukes_partitioning(g, 3), key=lambda s: min(s))
    want = sorted(nxc.lukes_partitioning(G, 3), key=lambda s: min(s))
    # both must be valid partitions with the same (optimal) value
    def value(parts):
        return sum(
            1 for u, v in G.edges()
            if any(u in p and v in p for p in parts)
        )

    assert value(got) == value(want)
    assert all(len(p) <= 3 for p in got)
    with pytest.raises(NetworkXError):
        lg.lukes_partitioning(from_nx(spark, nx.cycle_graph(4)), 2)


def test_edge_betweenness_partition_parity(spark):
    G = nx.barbell_graph(3, 0)
    g = from_nx(spark, G)
    got = _sets(lg.edge_betweenness_partition(g, 2))
    want = sorted(nxc.edge_betweenness_partition(G, 2), key=lambda s: min(s))
    assert got == want
    assert _sets(lg.edge_betweenness_partition(g, 1)) == [set(G)]
    with pytest.raises(NetworkXError):
        lg.edge_betweenness_partition(g, 0)


def test_edge_current_flow_partition(spark):
    G = nx.barbell_graph(3, 0)
    g = from_nx(spark, G)
    got = _sets(lg.edge_current_flow_betweenness_partition(g, 2))
    assert got == [set(range(3)), set(range(3, 6))]


def test_naive_greedy_modularity(spark):
    G = nx.karate_club_graph()
    g = from_nx(spark, G)
    a = _sets(lg.naive_greedy_modularity_communities(g))
    b = _sets(lg.greedy_modularity_communities(g))
    assert a == b


def test_louvain_leiden_partitions(spark):
    G = nx.ring_of_cliques(4, 5)
    g = from_nx(spark, G)
    levels = list(lg.louvain_partitions(g, seed=3, max_levels=5))
    assert 1 <= len(levels) <= 5
    final = _sets(levels[-1])
    assert all(len(c) >= 1 for c in final)
    levels2 = list(lg.leiden_partitions(g, seed=3, max_levels=5))
    assert len(levels2) >= 1


def test_spectral_modularity_bipartition(spark):
    G = nx.barbell_graph(4, 0)
    g = from_nx(spark, G)
    L, R = lg.spectral_modularity_bipartition(g)
    assert {frozenset(L), frozenset(R)} == {
        frozenset(range(4)), frozenset(range(4, 8))
    }


def test_greedy_node_swap_bipartition(spark):
    G = nx.barbell_graph(4, 0)
    g = from_nx(spark, G)
    L, R = lg.greedy_node_swap_bipartition(
        g, init_split=({0, 1, 2, 4}, {3, 5, 6, 7})
    )
    # converges to a split at least as good as the initial one
    q = nxc.modularity(G, [set(L), set(R)])
    q0 = nxc.modularity(G, [{0, 1, 2, 4}, {3, 5, 6, 7}])
    assert q >= q0 - 1e-12


def test_greedy_source_expansion(spark):
    G = nx.barbell_graph(5, 2)
    g = from_nx(spark, G)
    C = lg.greedy_source_expansion(g, source=0)
    assert set(range(5)) <= C
    assert len(C) < G.number_of_nodes()
    with pytest.raises(ValueError):
        lg.greedy_source_expansion(g, source=0, method="bogus")
