"""Brandes betweenness parity vs nx (exact with all sources)."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.betweenness import betweenness_centrality


def _ours(spark, G, **kw):
    g = from_nx(spark, G)
    return {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(g, **kw).collect()
    }


def _close(got, want, tol=1e-9):
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=tol), v


def test_path_graph(spark):
    G = nx.path_graph(6)
    _close(_ours(spark, G), nx.betweenness_centrality(G))


def test_star_and_unnormalized(spark):
    G = nx.star_graph(5)
    _close(_ours(spark, G), nx.betweenness_centrality(G))
    _close(
        _ours(spark, G, normalized=False),
        nx.betweenness_centrality(G, normalized=False),
    )


def test_krackhardt_kite(spark):
    G = nx.krackhardt_kite_graph()
    _close(_ours(spark, G), nx.betweenness_centrality(G))


def test_directed(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 3), (0, 3), (3, 4), (1, 4)])
    _close(_ours(spark, G), nx.betweenness_centrality(G))
    _close(
        _ours(spark, G, normalized=False),
        nx.betweenness_centrality(G, normalized=False),
    )


def test_random_gnp(spark):
    G = nx.gnp_random_graph(25, 0.15, seed=42)
    _close(_ours(spark, G), nx.betweenness_centrality(G))


def test_disconnected(spark):
    G = nx.disjoint_union(nx.path_graph(4), nx.cycle_graph(4))
    _close(_ours(spark, G), nx.betweenness_centrality(G))


def test_sampled_deterministic(spark):
    G = nx.gnp_random_graph(30, 0.2, seed=3)
    a = _ours(spark, G, k=10, seed=5)
    b = _ours(spark, G, k=10, seed=5)
    assert a == b
    # sampled values approximate the exact ones (loose sanity bound)
    exact = nx.betweenness_centrality(G)
    top_exact = max(exact, key=exact.get)
    assert a[top_exact] > 0


# ------------------------- edge betweenness --------------------------- #

from linkgraph.algos.betweenness import edge_betweenness_centrality


def _ours_edges(spark, G, **kw):
    df = edge_betweenness_centrality(from_nx(spark, G), **kw)
    return {(r["src"], r["dst"]): r["betweenness"] for r in df.collect()}


def _close_edges(got, want, directed):
    # ours keys by stored canonical (src, dst); the reference by G.edges order
    norm = (lambda e: e) if directed else (lambda e: (min(e), max(e)))
    want = {norm(e): v for e, v in want.items()}
    got = {norm(e): v for e, v in got.items()}
    assert set(got) == set(want)
    for e, v in want.items():
        assert got[e] == pytest.approx(v, abs=1e-9), e


def test_edge_path(spark):
    G = nx.path_graph(5)
    _close_edges(_ours_edges(spark, G), nx.edge_betweenness_centrality(G), False)


def test_edge_gnp_undirected(spark):
    G = nx.gnp_random_graph(22, 0.18, seed=7)
    _close_edges(_ours_edges(spark, G), nx.edge_betweenness_centrality(G), False)
    _close_edges(
        _ours_edges(spark, G, normalized=False),
        nx.edge_betweenness_centrality(G, normalized=False),
        False,
    )


def test_edge_directed(spark):
    G = nx.gnp_random_graph(20, 0.15, seed=11, directed=True)
    _close_edges(_ours_edges(spark, G), nx.edge_betweenness_centrality(G), True)
    _close_edges(
        _ours_edges(spark, G, normalized=False),
        nx.edge_betweenness_centrality(G, normalized=False),
        True,
    )


def test_edge_disconnected(spark):
    G = nx.disjoint_union(nx.path_graph(4), nx.cycle_graph(5))
    _close_edges(_ours_edges(spark, G), nx.edge_betweenness_centrality(G), False)


def test_edge_sampled_deterministic(spark):
    G = nx.gnp_random_graph(24, 0.2, seed=9)
    a = _ours_edges(spark, G, k=8, seed=3)
    b = _ours_edges(spark, G, k=8, seed=3)
    assert a == b
    assert all(v >= 0 for v in a.values()) and any(v > 0 for v in a.values())


# ------------------------ percolation centrality ----------------------- #

from linkgraph.algos.betweenness import percolation_centrality


def _nx_percolation(G, states):
    """Replica of percolation.py:16 (the installed reference needs node
    attrs; this lets us drive explicit state dicts identically)."""
    return nx.percolation_centrality(G, states=states)


def _ours_perc(spark, G, states):
    g = from_nx(spark, G)
    sdf = g.spark.createDataFrame(
        [(int(v), float(x)) for v, x in states.items()], "id bigint, state double"
    )
    df = percolation_centrality(g, states=sdf)
    return {r["id"]: r["percolation"] for r in df.collect()}


def test_percolation_uniform_states_matches_reference(spark):
    G = nx.gnp_random_graph(18, 0.2, seed=19)
    states = {v: 0.4 for v in G.nodes}
    got = _ours_perc(spark, G, states)
    want = _nx_percolation(G, states)
    for v in G.nodes:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_percolation_varied_states(spark):
    G = nx.gnp_random_graph(16, 0.22, seed=23)
    states = {v: 0.1 + (v % 5) * 0.2 for v in G.nodes}
    got = _ours_perc(spark, G, states)
    want = _nx_percolation(G, states)
    for v in G.nodes:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_percolation_directed(spark):
    G = nx.gnp_random_graph(14, 0.18, seed=29, directed=True)
    states = {v: 0.05 * (v + 1) for v in G.nodes}
    got = _ours_perc(spark, G, states)
    want = _nx_percolation(G, states)
    for v in G.nodes:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_percolation_default_states_from_attr(spark):
    G = nx.path_graph(6)
    g = from_nx(spark, G)
    attrs = spark.createDataFrame(
        [(int(v), 0.5) for v in G.nodes], "id bigint, percolation double"
    )
    g = g.with_node_attrs(attrs)
    got = {
        r["id"]: r["percolation"] for r in percolation_centrality(g).collect()
    }
    want = nx.percolation_centrality(G, states={v: 0.5 for v in G.nodes})
    for v in G.nodes:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
