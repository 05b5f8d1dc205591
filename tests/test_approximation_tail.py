"""Approximation tail (``networkx/algorithms/approximation/*`` —
SciPy-free in the reference, so direct parity where deterministic)."""

from __future__ import annotations

import networkx as nx
import pytest
from networkx.algorithms import approximation as nxap

import linkgraph as lg
from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError


def test_ramsey_parity(spark):
    G = nx.gnp_random_graph(12, 0.4, seed=3)
    g = from_nx(spark, G)
    clique, iset = lg.ramsey_R2(g)
    # both certificates valid; sizes >= reference's greedy sizes - slack
    assert all(G.has_edge(u, v) for u in clique for v in clique if u < v)
    assert all(not G.has_edge(u, v) for u in iset for v in iset if u < v)
    nc, ni = nxap.ramsey_R2(G)
    assert len(clique) >= max(2, len(nc) - 1)
    assert len(iset) >= max(2, len(ni) - 1)


def test_clique_removal_and_mis(spark):
    G = nx.gnp_random_graph(14, 0.35, seed=5)
    g = from_nx(spark, G)
    iset, cliques = lg.clique_removal(g)
    assert all(not G.has_edge(u, v) for u in iset for v in iset if u < v)
    covered = set().union(*cliques)
    assert covered == set(G)
    mis = lg.maximum_independent_set(g)
    assert all(not G.has_edge(u, v) for u in mis for v in mis if u < v)


def test_max_clique_and_large_clique_size(spark):
    G = nx.complete_graph(5)
    G.add_edges_from([(4, 5), (5, 6)])
    g = from_nx(spark, G)
    c = lg.max_clique(g)
    assert all(G.has_edge(u, v) for u in c for v in c if u < v)
    assert len(c) >= 4
    assert lg.large_clique_size(g) >= 4


def test_min_weighted_vertex_cover(spark):
    G = nx.gnp_random_graph(15, 0.3, seed=7)
    g = from_nx(spark, G)
    cover = lg.min_weighted_vertex_cover(g)
    for u, v in G.edges():
        assert u in cover or v in cover
    # 2-approximation bound vs an exact small instance
    P = nx.path_graph(4)
    gp = from_nx(spark, P)
    assert len(lg.min_weighted_vertex_cover(gp)) <= 2 * 2


def test_min_weighted_dominating_set(spark):
    G = nx.star_graph(6)
    g = from_nx(spark, G)
    dom = lg.min_weighted_dominating_set(g)
    for v in G:
        assert v in dom or any(u in dom for u in G[v])
    assert len(dom) == 1  # the hub


def test_matching_approximations(spark):
    G = nx.gnp_random_graph(12, 0.3, seed=9)
    g = from_nx(spark, G)
    for fn in (lg.min_maximal_matching, lg.min_edge_dominating_set):
        rows = fn(g).collect()
        used = set()
        for r in rows:
            assert r[0] not in used and r[1] not in used
            used.update((r[0], r[1]))


def test_local_node_connectivity_parity(spark):
    G = nx.barbell_graph(4, 1)
    g = from_nx(spark, G)
    got = lg.local_node_connectivity(g, 0, 8)
    want = nxap.local_node_connectivity(G, 0, 8)
    assert got == want == 1
    K = nx.complete_graph(5)
    gk = from_nx(spark, K)
    assert lg.local_node_connectivity(gk, 0, 4) == \
        nxap.local_node_connectivity(K, 0, 4)
    with pytest.raises(NetworkXError):
        lg.local_node_connectivity(g, 2, 2)


def test_metric_closure_parity(spark):
    G = nx.cycle_graph(6)
    g = from_nx(spark, G)
    mc = lg.metric_closure(g)
    got = {
        (r["src"], r["dst"]): r["weight"] for r in mc.edges.collect()
    }
    for (u, v), w in got.items():
        assert w == nx.shortest_path_length(G, u, v)
    assert len(got) == 15
    with pytest.raises(NetworkXError):
        lg.metric_closure(from_nx(spark, nx.disjoint_union(
            nx.path_graph(3), nx.path_graph(2))))


def _complete_weighted(spark, n, seed):
    G = nx.complete_graph(n)
    rng = __import__("random").Random(seed)
    for u, v in G.edges():
        G.edges[u, v]["weight"] = rng.randint(1, 20)
    return G, from_nx(spark, G)


def test_sa_and_ta_tsp(spark):
    G, g = _complete_weighted(spark, 7, 3)

    def cost(cycle):
        return sum(G[u][v]["weight"] for u, v in zip(cycle, cycle[1:]))

    greedy_rows = lg.greedy_tsp(g, weight="weight").orderBy("order").collect()
    greedy_cycle = [r["id"] for r in greedy_rows]
    sa = lg.simulated_annealing_tsp(g, "greedy", weight="weight", seed=5)
    ta = lg.threshold_accepting_tsp(g, "greedy", weight="weight", seed=5)
    for cyc in (sa, ta):
        assert cyc[0] == cyc[-1]
        assert sorted(cyc[:-1]) == sorted(G)
        assert cost(cyc) <= cost(greedy_cycle)
    with pytest.raises(NetworkXError):
        lg.simulated_annealing_tsp(g, [0, 1, 2], weight="weight")


def test_traveling_salesman_problem(spark):
    G = nx.cycle_graph(6)
    g = from_nx(spark, G)
    tour = lg.traveling_salesman_problem(g)
    assert set(tour) == set(G)
    assert tour[0] == tour[-1]
    # every hop is a real edge after path expansion
    for u, v in zip(tour, tour[1:]):
        assert G.has_edge(u, v)
    sub = lg.traveling_salesman_problem(g, nodes=[0, 2, 4], cycle=False)
    assert {0, 2, 4} <= set(sub)


def test_treewidth_min_fill_in(spark):
    for G, tw in [(nx.path_graph(6), 1), (nx.cycle_graph(6), 2),
                  (nx.complete_graph(5), 4)]:
        g = from_nx(spark, G)
        width, bags = lg.treewidth_min_fill_in(g)
        assert width == tw
        # bags cover all edges
        members = [set(r["members"]) for r in bags.collect()]
        for u, v in G.edges():
            assert any({u, v} <= b for b in members)
