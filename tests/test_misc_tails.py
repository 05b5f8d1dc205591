"""Tournament / tree-branching / flow-alias / isomorphism-helper tails
(``networkx/algorithms/{tournament,tree/branchings,flow,isomorphism}``)."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest
from networkx.algorithms import tournament as nxt

import linkgraph as lg
from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError


def test_random_tournament(spark):
    g = lg.random_tournament(spark, 8, seed=3)
    G = nx.DiGraph()
    G.add_nodes_from(range(8))
    G.add_edges_from(
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    )
    assert nxt.is_tournament(G)


def test_hamiltonian_path(spark):
    G = nx.DiGraph()
    G.add_nodes_from(range(7))
    rng = __import__("random").Random(5)
    for u in range(7):
        for v in range(u + 1, 7):
            if rng.random() < 0.5:
                G.add_edge(u, v)
            else:
                G.add_edge(v, u)
    g = from_nx(spark, G)
    path = lg.hamiltonian_path(g)
    assert sorted(path) == list(range(7))
    for u, v in zip(path, path[1:]):
        assert G.has_edge(u, v)


def test_is_reachable_parity(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)])
    g = from_nx(spark, G)
    for s, t in [(0, 2), (3, 0), (1, 0), (2, 1)]:
        assert lg.is_reachable(g, s, t) == nxt.is_reachable(G, s, t)


def test_tournament_matrix(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    g = from_nx(spark, G)
    T, ids = lg.tournament_matrix(g)
    assert np.allclose(T, -T.T)
    assert T[0, 1] == 1 and T[1, 0] == -1


def test_branching_weight_and_greedy(spark):
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 5), (1, 2, 3), (0, 2, 1), (2, 3, 4)])
    g = from_nx(spark, G)
    assert lg.branching_weight(g) == 13
    b = lg.greedy_branching(g)
    rows = [(r["src"], r["dst"]) for r in b.collect()]
    # branching: in-degree <= 1, no cycle
    heads = [v for _, v in rows]
    assert len(heads) == len(set(heads))
    H = nx.DiGraph(rows)
    assert nx.is_forest(H.to_undirected())
    # greedy (max) picks the heavy arcs first
    want = nx.tree.greedy_branching(G, seed=0)
    assert lg.branching_weight(
        from_nx(spark, nx.DiGraph(
            [(u, v, {"weight": G[u][v]["weight"]}) for u, v in rows]))
    ) >= sum(G[u][v]["weight"] for u, v in want.edges) - 1e-9


def test_minimal_branching_parity(spark):
    G = nx.DiGraph()
    G.add_weighted_edges_from(
        [(0, 1, 2), (0, 2, 5), (1, 2, 1), (2, 3, 2), (1, 3, 9)]
    )
    g = from_nx(spark, G)
    got = lg.minimal_branching(g)
    total = sum(r["weight"] for r in got.collect())
    want = nx.tree.minimal_branching(G.copy())
    want_total = sum(d["weight"] for _, _, d in want.edges(data=True))
    assert abs(total - want_total) < 1e-9


def test_centroid_parity(spark):
    for G in [nx.path_graph(7), nx.star_graph(5), nx.balanced_tree(2, 3),
              nx.path_graph(6)]:
        g = from_nx(spark, G)
        assert sorted(lg.centroid(g)) == sorted(nx.tree.centroid(G))
    with pytest.raises(NetworkXError):
        lg.centroid(from_nx(spark, nx.cycle_graph(4)))


def test_flow_alias_values(spark):
    G = nx.DiGraph()
    G.add_edge(0, 1, capacity=3.0)
    G.add_edge(0, 2, capacity=2.0)
    G.add_edge(1, 3, capacity=2.0)
    G.add_edge(2, 3, capacity=3.0)
    g = from_nx(spark, G)
    gcap = lg.SparkGraph(
        from_nx(spark, G).edges.join(
            spark.createDataFrame(
                [(u, v, d["capacity"]) for u, v, d in G.edges(data=True)],
                "src long, dst long, capacity double",
            ),
            ["src", "dst"],
        ),
        directed=True,
        coalesce_edges=False,
    )
    want = nx.maximum_flow_value(G, 0, 3)
    for fn in (lg.dinitz, lg.edmonds_karp, lg.shortest_augmenting_path,
               lg.boykov_kolmogorov, lg.preflow_push):
        value, flow = fn(gcap, 0, 3)
        assert value == want
    d = lg.build_flow_dict(gcap, flow)
    assert sum(d.get(0, {}).values()) == want
    res = lg.build_residual_network(gcap)
    assert res.edges.filter("capacity = 0").count() > 0


def test_matcher_classes(spark):
    G1 = nx.cycle_graph(5)
    G2 = nx.relabel_nodes(G1, {i: i + 10 for i in G1})
    m = lg.GraphMatcher(from_nx(spark, G1), from_nx(spark, G2))
    assert m.is_isomorphic()
    assert m.mapping is not None
    count = sum(1 for _ in m.isomorphisms_iter())
    assert count == 10  # dihedral group of C5
    # matchers are supported since round 5: an always-true node_match
    # changes nothing, an always-false one kills every mapping
    assert lg.GraphMatcher(
        from_nx(spark, G1), from_nx(spark, G2), node_match=lambda a, b: True
    ).is_isomorphic()
    assert not lg.GraphMatcher(
        from_nx(spark, G1), from_nx(spark, G2), node_match=lambda a, b: False
    ).is_isomorphic()


def test_match_factories():
    eq = lg.categorical_node_match("color", None)
    assert eq({"color": "r"}, {"color": "r"})
    assert not eq({"color": "r"}, {"color": "b"})
    num = lg.numerical_edge_match("weight", 1.0)
    assert num({"weight": 1.0000000001}, {"weight": 1.0})
    gen = lg.generic_node_match("size", 0, lambda a, b: abs(a - b) <= 1)
    assert gen({"size": 3}, {"size": 4})
    multi = lg.categorical_multiedge_match("color", None)
    assert multi({0: {"color": "r"}}, {0: {"color": "b"}, 1: {"color": "r"}})


def test_tree_isomorphism_parity(spark):
    T1 = nx.balanced_tree(2, 2)
    T2 = nx.relabel_nodes(T1, {i: (i * 3 + 1) % 17 for i in T1})
    g1, g2 = from_nx(spark, T1), from_nx(spark, T2)
    m = lg.tree_isomorphism(g1, g2)
    assert m
    md = dict(m)
    for u, v in T1.edges():
        assert T2.has_edge(md[u], md[v])
    # non-isomorphic trees
    g3 = from_nx(spark, nx.path_graph(7))
    assert lg.tree_isomorphism(g1, g3) == []
    # rooted variant
    mr = lg.rooted_tree_isomorphism(g1, 0, g1, 0)
    assert dict(mr)[0] == 0
