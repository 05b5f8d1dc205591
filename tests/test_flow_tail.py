"""Parity tests for the flow tail: minimum edge/node cuts (cut sets),
edge/node disjoint paths, Gomory-Hu tree, k_edge_components vs the
reference (connectivity/cuts.py, disjoint_paths.py, flow/gomoryhu.py,
connectivity/edge_kcomponents.py)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.flow import (
    minimum_edge_cut,
    minimum_node_cut,
    edge_disjoint_paths,
    node_disjoint_paths,
    gomory_hu_tree,
    k_edge_components,
)


def _mk(seed=2, n=14, p=0.3, directed=False):
    G = nx.gnp_random_graph(n, p, seed=seed, directed=directed)
    if directed:
        # keep a strongly connected core
        G = G.subgraph(max(nx.strongly_connected_components(G), key=len)).copy()
        G = nx.relabel_nodes(G, {v: i for i, v in enumerate(sorted(G))})
    else:
        G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
        G = nx.relabel_nodes(G, {v: i for i, v in enumerate(sorted(G))})
    return G


@pytest.mark.parametrize("directed", [False, True])
def test_minimum_edge_cut_st(spark, directed):
    G = _mk(directed=directed)
    g = from_nx(spark, G)
    s, t = 0, max(G.nodes)
    want = nx.minimum_edge_cut(G, s, t)
    got = [(r["src"], r["dst"]) for r in minimum_edge_cut(g, s, t).collect()]
    assert len(got) == len(want)
    # validity: removing the cut disconnects t from s
    H = G.copy()
    for u, v in got:
        H.remove_edge(u, v)
    assert not nx.has_path(H, s, t)


@pytest.mark.parametrize("directed", [False, True])
def test_minimum_edge_cut_global(spark, directed):
    G = _mk(seed=5, directed=directed)
    g = from_nx(spark, G)
    want = nx.minimum_edge_cut(G)
    got = [(r["src"], r["dst"]) for r in minimum_edge_cut(g).collect()]
    assert len(got) == len(want)
    H = G.copy()
    for u, v in got:
        H.remove_edge(u, v)
    if directed:
        assert not nx.is_strongly_connected(H)
    else:
        assert not nx.is_connected(H)


def test_minimum_node_cut_st(spark):
    G = _mk(seed=7, n=16, p=0.25)
    g = from_nx(spark, G)
    s = 0
    t = next(v for v in sorted(G.nodes, reverse=True) if not G.has_edge(0, v))
    want = nx.minimum_node_cut(G, s, t)
    got = sorted(r["id"] for r in minimum_node_cut(g, s, t).collect())
    assert len(got) == len(want)
    H = G.copy()
    H.remove_nodes_from(got)
    assert not nx.has_path(H, s, t)


def test_minimum_node_cut_global(spark):
    G = _mk(seed=9, n=12, p=0.3)
    g = from_nx(spark, G)
    want = nx.minimum_node_cut(G)
    got = sorted(r["id"] for r in minimum_node_cut(g).collect())
    assert len(got) == len(want)
    H = G.copy()
    H.remove_nodes_from(got)
    assert not nx.is_connected(H) or H.number_of_nodes() <= 1


def test_minimum_node_cut_adjacent_raises(spark):
    G = nx.path_graph(3)
    with pytest.raises(ValueError):
        minimum_node_cut(from_nx(spark, G), 0, 1)


@pytest.mark.parametrize("directed", [False, True])
def test_edge_disjoint_paths(spark, directed):
    G = _mk(seed=11, directed=directed)
    g = from_nx(spark, G)
    s, t = 0, max(G.nodes)
    want = list(nx.edge_disjoint_paths(G, s, t))
    got = edge_disjoint_paths(g, s, t)
    assert len(got) == len(want)
    used = set()
    for p in got:
        assert p[0] == s and p[-1] == t
        for u, v in zip(p, p[1:]):
            assert G.has_edge(u, v), (u, v)
            key = (u, v) if directed else tuple(sorted((u, v)))
            assert key not in used  # edge-disjoint
            used.add(key)


def test_node_disjoint_paths(spark):
    G = _mk(seed=13, n=16, p=0.3)
    g = from_nx(spark, G)
    s = 0
    t = next(v for v in sorted(G.nodes, reverse=True) if not G.has_edge(0, v))
    want = list(nx.node_disjoint_paths(G, s, t))
    got = node_disjoint_paths(g, s, t)
    assert len(got) == len(want)
    interior = []
    for p in got:
        assert p[0] == s and p[-1] == t
        for u, v in zip(p, p[1:]):
            assert G.has_edge(u, v)
        interior.extend(p[1:-1])
    assert len(interior) == len(set(interior))  # internally disjoint


def test_node_disjoint_paths_adjacent(spark):
    G = nx.cycle_graph(6)
    G.add_edge(0, 1)  # already there; keep simple adjacency case
    g = from_nx(spark, G)
    want = list(nx.node_disjoint_paths(G, 0, 1))
    got = node_disjoint_paths(g, 0, 1)
    assert len(got) == len(want) == 2


def test_gomory_hu_tree_invariant(spark):
    G = _mk(seed=17, n=10, p=0.4)
    for u, v in G.edges:
        G.edges[u, v]["capacity"] = ((u + v) % 5) + 1.0
    g0 = from_nx(spark, G)
    caps = [(u, v, float(G.edges[u, v]["capacity"])) for u, v in G.edges]
    g = g0.with_edge_attrs(
        spark.createDataFrame(caps, "src long, dst long, capacity double")
    )
    T = gomory_hu_tree(g)
    TE = nx.Graph()
    for r in T.collect():
        TE.add_edge(r["u"], r["v"], weight=r["weight"])
    assert TE.number_of_nodes() == G.number_of_nodes()
    assert nx.is_tree(TE)
    for s in G.nodes:
        for t in G.nodes:
            if s < t:
                path = nx.shortest_path(TE, s, t)
                got = min(
                    TE.edges[u, v]["weight"] for u, v in zip(path, path[1:])
                )
                want = nx.minimum_cut_value(G, s, t)
                assert got == pytest.approx(want), (s, t)


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_k_edge_components_parity(spark, k):
    G = nx.gnp_random_graph(18, 0.22, seed=19)
    g = from_nx(spark, G)
    want = {frozenset(c) for c in nx.k_edge_components(G, k)}
    rows = k_edge_components(g, k).collect()
    by = {}
    for r in rows:
        by.setdefault(r["component"], set()).add(r["id"])
    got = {frozenset(c) for c in by.values()}
    assert got == want


def test_k_edge_components_guards(spark):
    g = from_nx(spark, nx.path_graph(3))
    with pytest.raises(ValueError):
        k_edge_components(g, 0)
