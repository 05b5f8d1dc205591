"""Parity: exact k_components / all_node_cuts / all_pairs_node_connectivity
and the DAG enumeration tail (all_topological_sorts, antichains,
dag_to_branching) vs the reference."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph as lg
from linkgraph.graph import from_nx


def _norm_kc(d):
    return {k: sorted(sorted(s) for s in v) for k, v in d.items()}


def test_k_components_torrents_ferraro(spark):
    G = nx.davis_southern_women_graph()
    G = nx.convert_node_labels_to_integers(G)
    got = lg.k_components(from_nx(spark, G))
    ref = nx.k_components(G)
    assert _norm_kc(got) == _norm_kc(ref)


def test_k_components_karate(spark):
    G = nx.karate_club_graph()
    got = lg.k_components(from_nx(spark, G))
    ref = nx.k_components(G)
    assert _norm_kc(got) == _norm_kc(ref)


def test_k_components_disconnected(spark):
    G = nx.Graph()
    G.add_edges_from(nx.cycle_graph(4).edges)
    G.add_edges_from((u + 10, v + 10) for u, v in nx.complete_graph(5).edges)
    G.add_node(99)
    got = lg.k_components(from_nx(spark, G))
    ref = nx.k_components(G)
    assert _norm_kc(got) == _norm_kc(ref)


def test_all_node_cuts_grid(spark):
    G = nx.grid_2d_graph(3, 3)
    G = nx.convert_node_labels_to_integers(G)
    got = sorted(sorted(c) for c in lg.all_node_cuts(from_nx(spark, G)))
    ref = sorted(sorted(c) for c in nx.all_node_cuts(G))
    assert got == ref


def test_all_node_cuts_cycle_and_complete(spark):
    C = nx.cycle_graph(6)
    got = sorted(sorted(c) for c in lg.all_node_cuts(from_nx(spark, C)))
    ref = sorted(sorted(c) for c in nx.all_node_cuts(C))
    assert got == ref
    K = nx.complete_graph(5)
    assert lg.all_node_cuts(from_nx(spark, K)) == list(nx.all_node_cuts(K))


def test_all_pairs_node_connectivity(spark):
    G = nx.gnp_random_graph(9, 0.4, seed=7)
    got = {
        (r["u"], r["v"]): r["connectivity"]
        for r in lg.all_pairs_node_connectivity(from_nx(spark, G)).collect()
    }
    ref = nx.all_pairs_node_connectivity(G)
    for u in ref:
        for v, k in ref[u].items():
            if u < v:
                assert got[(u, v)] == k, (u, v)


def test_all_pairs_node_connectivity_directed(spark):
    D = nx.gnp_random_graph(7, 0.35, seed=3, directed=True)
    got = {
        (r["u"], r["v"]): r["connectivity"]
        for r in lg.all_pairs_node_connectivity(from_nx(spark, D)).collect()
    }
    ref = nx.all_pairs_node_connectivity(D)
    for u in ref:
        for v, k in ref[u].items():
            if u != v:
                assert got[(u, v)] == k, (u, v)


def test_all_topological_sorts(spark):
    D = nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3)])
    got = sorted(map(tuple, lg.all_topological_sorts(from_nx(spark, D))))
    ref = sorted(map(tuple, nx.all_topological_sorts(D)))
    assert got == ref


def test_all_topological_sorts_cycle_raises(spark):
    D = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    with pytest.raises(lg.NetworkXUnfeasible):
        list(lg.all_topological_sorts(from_nx(spark, D)))


def test_antichains(spark):
    D = nx.DiGraph([(0, 1), (1, 2), (0, 3)])
    got = sorted(map(tuple, map(sorted, lg.antichains(from_nx(spark, D)))))
    ref = sorted(map(tuple, map(sorted, nx.antichains(D))))
    assert got == ref


def test_dag_to_branching(spark):
    D = nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])
    branching, nodes = lg.dag_to_branching(from_nx(spark, D))
    ref = nx.dag_to_branching(D)
    # same number of nodes/edges and a bijection of root-to-leaf paths
    assert branching.number_of_nodes() == ref.number_of_nodes()
    assert branching.number_of_edges() == ref.number_of_edges()
    src = {r["id"]: int(r["source"]) for r in nodes.collect()}
    arcs = [(r["src"], r["dst"]) for r in branching.edges.collect()]
    children: dict = {}
    for u, v in arcs:
        children.setdefault(u, []).append(v)
    roots = set(src) - {v for _, v in arcs}

    def paths(node):
        if node not in children:
            return [[src[node]]]
        return [[src[node]] + p for c in children[node] for p in paths(c)]

    got_paths = sorted(tuple(p) for r in roots for p in paths(r))
    ref_paths = sorted(tuple(p) for p in nx.dag.root_to_leaf_paths(D))
    assert got_paths == ref_paths


def test_root_to_leaf_paths(spark):
    D = nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3)])
    got = sorted(tuple(r["path"]) for r in lg.root_to_leaf_paths(from_nx(spark, D)).collect())
    ref = sorted(tuple(p) for p in nx.dag.root_to_leaf_paths(D))
    assert got == ref
