"""Parity tests for the clique-derived APIs, max_weight_clique, and
lexicographical_topological_sort vs the reference (clique.py, dag.py)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.cliques import (
    node_clique_number,
    number_of_cliques,
    enumerate_all_cliques,
    make_max_clique_graph,
    make_clique_bipartite,
    max_weight_clique,
)
from linkgraph.algos.dag import lexicographical_topological_sort


def _G(seed=3):
    return nx.gnp_random_graph(13, 0.35, seed=seed)


def test_node_clique_number(spark):
    G = _G()
    got = {
        r["id"]: r["clique_number"]
        for r in node_clique_number(from_nx(spark, G)).collect()
    }
    assert got == nx.node_clique_number(G)


def test_number_of_cliques(spark):
    G = _G(5)
    got = {
        r["id"]: r["n_cliques"]
        for r in number_of_cliques(from_nx(spark, G)).collect()
    }
    assert got == nx.number_of_cliques(G)


def test_enumerate_all_cliques(spark):
    G = _G(7)
    got = {
        tuple(sorted(r["members"]))
        for r in enumerate_all_cliques(from_nx(spark, G)).collect()
    }
    want = {tuple(sorted(c)) for c in nx.enumerate_all_cliques(G)}
    assert got == want


def test_make_max_clique_graph(spark):
    G = _G(9)
    cg, mc = make_max_clique_graph(from_nx(spark, G))
    want = nx.make_max_clique_graph(G)
    assert cg.number_of_nodes() == want.number_of_nodes()
    assert cg.number_of_edges() == want.number_of_edges()


def test_make_clique_bipartite(spark):
    G = _G(11)
    bg, mc = make_clique_bipartite(from_nx(spark, G))
    want = nx.make_clique_bipartite(G)
    assert bg.number_of_nodes() == want.number_of_nodes()
    assert bg.number_of_edges() == want.number_of_edges()


def test_max_weight_clique(spark):
    G = _G(13)
    for n in G.nodes:
        G.nodes[n]["weight"] = (n % 5) + 1
    g0 = from_nx(spark, G)
    rows = [(int(n), float((n % 5) + 1)) for n in G.nodes]
    g = g0.with_node_attrs(g0.spark.createDataFrame(rows, ["id", "w"]))
    clique, wgt = max_weight_clique(g, weight="w")
    want_clique, want_w = nx.max_weight_clique(G, weight="weight")
    assert wgt == pytest.approx(want_w)
    for i, u in enumerate(clique):
        for v in clique[i + 1 :]:
            assert G.has_edge(u, v)
    # unit weights = maximum clique size
    c2, w2 = max_weight_clique(g, weight=None)
    wc2, ww2 = nx.max_weight_clique(G, weight=None)
    assert w2 == ww2


def test_lexicographical_topological_sort(spark):
    G = nx.gnp_random_graph(14, 0.25, seed=17, directed=True)
    D = nx.DiGraph((u, v) for u, v in G.edges if u < v)  # a DAG
    D.add_nodes_from(G.nodes)
    got = lexicographical_topological_sort(from_nx(spark, D))
    want = list(nx.lexicographical_topological_sort(D))
    assert got == want
    C = nx.DiGraph([(0, 1), (1, 0)])
    with pytest.raises(ValueError):
        lexicographical_topological_sort(from_nx(spark, C))
