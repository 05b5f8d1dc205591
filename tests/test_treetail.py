"""Parity for the tree/chordal tail: k_factor, connected dominating
sets, broadcast centers, chordal completion, junction trees, tree
codings, perfect graphs, asteroidal triples."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph as lg
from linkgraph.graph import from_nx


def test_k_factor(spark):
    G = nx.grid_2d_graph(4, 4)
    G = nx.convert_node_labels_to_integers(G)
    got = lg.k_factor(from_nx(spark, G), 2)
    # a 2-factor: spanning, every degree exactly 2
    degs = {r["id"]: r["degree"] for r in lg.degrees(got).collect()}
    assert set(degs) == set(G)
    assert all(d == 2 for d in degs.values())
    edges = {(r["src"], r["dst"]) for r in got.edges.collect()}
    assert all(G.has_edge(u, v) for u, v in edges)


def test_k_factor_unfeasible(spark):
    G = nx.path_graph(4)
    with pytest.raises(lg.NetworkXUnfeasible):
        lg.k_factor(from_nx(spark, G), 2)


def test_connected_dominating_set(spark):
    G = nx.karate_club_graph()
    got = lg.connected_dominating_set(from_nx(spark, G))
    assert nx.is_connected_dominating_set(G, got)
    assert lg.is_connected_dominating_set(from_nx(spark, G), got)
    # greedy sizes should match the reference's schedule on ties-free runs
    ref = nx.connected_dominating_set(G)
    assert len(got) <= len(ref) + 2


def test_is_connected_dominating_set_negative(spark):
    G = nx.path_graph(6)
    g = from_nx(spark, G)
    assert lg.is_connected_dominating_set(g, [1, 2, 3, 4])
    assert not lg.is_connected_dominating_set(g, [1, 4])  # not connected
    assert not lg.is_connected_dominating_set(g, [0, 1])  # not dominating


def test_tree_broadcast_center_and_time(spark):
    for tree in [
        nx.path_graph(7),
        nx.star_graph(5),
        nx.balanced_tree(2, 3),
        nx.random_labeled_tree(12, seed=5),
    ]:
        g = from_nx(spark, tree)
        bt, bc = lg.tree_broadcast_center(g)
        ref_bt, ref_bc = nx.tree_broadcast_center(tree)
        assert bt == ref_bt
        assert bc == ref_bc
        assert lg.tree_broadcast_time(g) == nx.tree_broadcast_time(tree)
        assert lg.tree_broadcast_time(g, 0) == nx.tree_broadcast_time(tree, 0)


def test_complete_to_chordal_graph(spark):
    G = nx.cycle_graph(6)
    H, alpha = lg.complete_to_chordal_graph(from_nx(spark, G))
    refH, ref_alpha = nx.complete_to_chordal_graph(G)
    from linkgraph.algos.chordal import is_chordal

    assert is_chordal(H)
    got_edges = {
        tuple(sorted((r["src"], r["dst"]))) for r in H.edges.collect()
    }
    assert set(map(tuple, map(sorted, G.edges))) <= got_edges
    # same numbering schedule -> identical fill-in
    assert got_edges == {tuple(sorted(e)) for e in refH.edges}
    assert alpha == ref_alpha


def test_junction_tree(spark):
    B = nx.DiGraph(
        [("A", "C"), ("B", "C"), ("C", "D"), ("C", "E")]
    )
    B = nx.relabel_nodes(B, {n: i for i, n in enumerate(sorted(B))})
    tree, nodes = lg.junction_tree(from_nx(spark, B))
    ref = nx.junction_tree(B)
    got_cliques = {
        frozenset(r["members"])
        for r in nodes.filter("type = 'clique'").collect()
    }
    ref_cliques = {
        frozenset(n) for n, d in ref.nodes(data=True) if d["type"] == "clique"
    }
    assert got_cliques == ref_cliques
    # bipartite clique-sepset structure with the same edge count
    assert tree.number_of_edges() == ref.number_of_edges()


def test_join_trees(spark):
    t1 = from_nx(spark, nx.path_graph(3))
    t2 = from_nx(spark, nx.star_graph(3))
    joined = lg.join_trees([(t1, 0), (t2, 0)])
    from linkgraph.algos.tree import is_tree

    assert is_tree(joined)
    assert joined.number_of_nodes() == 3 + 4 + 1
    # root 0 has exactly the two tree roots as children
    deg0 = [
        r
        for r in joined.symmetric_edges().filter("src = 0").collect()
    ]
    assert len(deg0) == 2


def test_nested_tuple_roundtrip(spark):
    T = nx.random_labeled_tree(9, seed=3)
    g = from_nx(spark, T)
    enc = lg.to_nested_tuple(g, 0)
    ref = nx.to_nested_tuple(T, 0)
    assert lg.to_nested_tuple(g, 0, canonical_form=True) == nx.to_nested_tuple(
        T, 0, canonical_form=True
    )
    back = lg.from_nested_tuple(spark, enc)
    assert back.number_of_nodes() == T.number_of_nodes()
    assert back.number_of_edges() == T.number_of_edges()
    # decode parity against the reference decoder
    refback = nx.from_nested_tuple(ref)
    assert lg.to_nested_tuple(back, 0, canonical_form=True) == nx.to_nested_tuple(
        refback, 0, canonical_form=True
    )


def test_is_perfect_graph(spark):
    assert lg.is_perfect_graph(from_nx(spark, nx.complete_graph(5)))
    assert lg.is_perfect_graph(from_nx(spark, nx.cycle_graph(4)))
    assert not lg.is_perfect_graph(from_nx(spark, nx.cycle_graph(5)))
    assert not lg.is_perfect_graph(from_nx(spark, nx.cycle_graph(7)))
    G = nx.gnp_random_graph(9, 0.4, seed=8)
    assert lg.is_perfect_graph(from_nx(spark, G)) == nx.is_perfect_graph(G)


def test_asteroidal(spark):
    # C6 contains an asteroidal triple; interval graphs are AT-free
    C6 = nx.cycle_graph(6)
    g = from_nx(spark, C6)
    got = lg.find_asteroidal_triple(g)
    assert got is not None
    assert nx.is_at_free(C6) is False
    assert lg.is_at_free(g) is False
    P = nx.path_graph(6)
    assert lg.is_at_free(from_nx(spark, P)) is True
    G = nx.gnp_random_graph(10, 0.35, seed=2)
    assert lg.is_at_free(from_nx(spark, G)) == nx.is_at_free(G)
