"""Parity for the cores family (k_shell/k_crust/k_corona/k_truss/onion) and
DAG ops vs the reference's own test semantics
(``networkx/algorithms/tests/test_core.py``, ``tests/test_dag.py``)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.cores import (
    core_number,
    k_core,
    k_shell,
    k_crust,
    k_corona,
    k_truss,
    onion_layers,
)
from linkgraph.algos.dag import (
    topological_generations,
    topological_sort,
    is_directed_acyclic_graph,
    transitive_closure,
    dag_longest_path_length,
    GraphContainsCycle,
)


def _nodes(g):
    return {r["id"] for r in g.vertices.collect()}


def _edges(g):
    return {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}


def _hh():
    # the reference test fixture: havel_hakimi of [0,1,2,2,2,2,3]
    return nx.havel_hakimi_graph([0, 1, 2, 2, 2, 2, 3])


def test_k_shell_crust_corona_hh(spark):
    G = _hh()
    g = from_nx(spark, G)
    assert _nodes(k_shell(g, k=1)) == set(nx.k_shell(G, k=1).nodes)
    assert _nodes(k_crust(g, k=1)) == set(nx.k_crust(G, k=1).nodes)
    assert _nodes(k_corona(g, k=2)) == set(nx.k_corona(G, k=2).nodes)
    # defaults (max core / max core - 1)
    assert _nodes(k_shell(g)) == set(nx.k_shell(G).nodes)
    assert _nodes(k_crust(g)) == set(nx.k_crust(G).nodes)


@pytest.mark.parametrize("n,p,seed", [(60, 0.12, 2)])
def test_cores_family_random(spark, n, p, seed):
    G = nx.gnp_random_graph(n, p, seed=seed)
    g = from_nx(spark, G)
    cn = {r["id"]: r["core"] for r in core_number(g).collect()}
    assert cn == nx.core_number(G)
    for k in (1, 2, 3):
        assert _nodes(k_shell(g, k=k)) == set(nx.k_shell(G, k=k).nodes)
        assert _nodes(k_corona(g, k=k)) == set(nx.k_corona(G, k=k).nodes)


def test_k_truss_hh_and_random(spark):
    G = _hh()
    g = from_nx(spark, G)
    H = nx.k_truss(G, 2)
    t = k_truss(g, 2)
    assert _nodes(t) == set(H.nodes)
    assert _edges(t) == {(min(u, v), max(u, v)) for u, v in H.edges}

    G2 = nx.gnp_random_graph(50, 0.15, seed=9)
    g2 = from_nx(spark, G2)
    for k in (3, 4):
        H2 = nx.k_truss(G2, k)
        t2 = k_truss(g2, k)
        assert _nodes(t2) == set(H2.nodes)
        assert _edges(t2) == {(min(u, v), max(u, v)) for u, v in H2.edges}


def test_onion_layers_parity(spark):
    G = _hh()
    g = from_nx(spark, G)
    got = {r["id"]: r["layer"] for r in onion_layers(g).collect()}
    assert got == nx.onion_layers(G)
    G2 = nx.gnp_random_graph(70, 0.08, seed=4)
    g2 = from_nx(spark, G2)
    got2 = {r["id"]: r["layer"] for r in onion_layers(g2).collect()}
    assert got2 == nx.onion_layers(G2)


def test_k_core_still_green(spark):
    G = nx.gnp_random_graph(50, 0.1, seed=8)
    g = from_nx(spark, G)
    assert _nodes(k_core(g, 2)) == set(nx.k_core(G, 2).nodes)


# ------------------------------------------------------------------ #
# DAG ops
# ------------------------------------------------------------------ #


def _random_dag(n, p, seed):
    G = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    D = nx.DiGraph((u, v) for u, v in G.edges() if u < v)
    D.add_nodes_from(G.nodes())
    return D


def test_topological_generations_parity(spark):
    D = _random_dag(40, 0.1, 6)
    g = from_nx(spark, D)
    got = {}
    for r in topological_generations(g).collect():
        got.setdefault(r["generation"], set()).add(r["id"])
    want = {
        i: set(layer) for i, layer in enumerate(nx.topological_generations(D))
    }
    assert got == want


def test_topological_sort_valid_order(spark):
    D = _random_dag(30, 0.15, 13)
    g = from_nx(spark, D)
    pos = {r["id"]: r["position"] for r in topological_sort(g).collect()}
    assert sorted(pos.values()) == list(range(D.number_of_nodes()))
    for u, v in D.edges():
        assert pos[u] < pos[v]


def test_cycle_raises(spark):
    G = nx.cycle_graph(5, create_using=nx.DiGraph)
    g = from_nx(spark, G)
    with pytest.raises(GraphContainsCycle):
        topological_generations(g)
    assert not is_directed_acyclic_graph(g)
    assert is_directed_acyclic_graph(from_nx(spark, _random_dag(20, 0.2, 1)))


def test_transitive_closure_parity(spark):
    D = _random_dag(25, 0.15, 21)
    g = from_nx(spark, D)
    tc = transitive_closure(g)
    want = {(u, v) for u, v in nx.transitive_closure(D).edges()}
    assert _edges(tc) == want
    # works on cyclic digraphs too (dag.py:718 handles any digraph)
    C = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    gc = from_nx(spark, C)
    assert _edges(transitive_closure(gc)) == {
        (u, v) for u, v in nx.transitive_closure(C).edges()
    }


def test_dag_longest_path_length(spark):
    D = _random_dag(30, 0.15, 33)
    g = from_nx(spark, D)
    assert dag_longest_path_length(g) == nx.dag_longest_path_length(D)
