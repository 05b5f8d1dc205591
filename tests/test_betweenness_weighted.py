"""Weighted Brandes betweenness parity vs nx (Dijkstra kernel,
``networkx/algorithms/centrality/betweenness.py:430``
``_single_source_dijkstra_path_basic``)."""

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


def test_weighted_path(spark):
    G = nx.path_graph(6)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = float(i + 1)
    _close(
        _ours(spark, G, weight="weight"),
        nx.betweenness_centrality(G, weight="weight"),
    )


def test_weight_changes_routing(spark):
    # direct edge 0-2 is heavier than the two-hop detour: hop-shortest
    # and weight-shortest disagree, so an unweighted kernel would differ.
    G = nx.Graph()
    G.add_edge(0, 1, weight=1.0)
    G.add_edge(1, 2, weight=1.0)
    G.add_edge(0, 2, weight=5.0)
    G.add_edge(2, 3, weight=1.0)
    want = nx.betweenness_centrality(G, weight="weight")
    got = _ours(spark, G, weight="weight")
    _close(got, want)
    un = nx.betweenness_centrality(G)
    assert any(abs(want[v] - un[v]) > 1e-9 for v in want)


def test_equal_weight_diamond_sigma(spark):
    # two equal-cost shortest paths 0->3: sigma counting must split delta
    G = nx.Graph()
    for u, v in [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]:
        G.add_edge(u, v, weight=2.0)
    _close(
        _ours(spark, G, weight="weight"),
        nx.betweenness_centrality(G, weight="weight"),
    )


def test_weighted_directed(spark):
    G = nx.DiGraph()
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 3.5),
             (3, 4, 2.0), (1, 4, 6.0), (4, 0, 1.0)]
    for u, v, w in edges:
        G.add_edge(u, v, weight=w)
    _close(
        _ours(spark, G, weight="weight"),
        nx.betweenness_centrality(G, weight="weight"),
    )
    _close(
        _ours(spark, G, weight="weight", normalized=False),
        nx.betweenness_centrality(G, weight="weight", normalized=False),
    )


def test_weighted_random(spark):
    G = nx.gnp_random_graph(20, 0.2, seed=7)
    import random

    rng = random.Random(13)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 9))
    _close(
        _ours(spark, G, weight="weight"),
        nx.betweenness_centrality(G, weight="weight"),
    )


def test_weighted_disconnected(spark):
    G = nx.disjoint_union(nx.path_graph(4), nx.cycle_graph(4))
    for u, v in G.edges():
        G[u][v]["weight"] = 1.5
    _close(
        _ours(spark, G, weight="weight"),
        nx.betweenness_centrality(G, weight="weight"),
    )


def test_weight_expression_column(spark):
    # the weight-expression surface: 2*weight + 1 routed through the
    # same resolver as the sssp family
    G = nx.Graph()
    G.add_edge(0, 1, weight=1.0)
    G.add_edge(1, 2, weight=1.0)
    G.add_edge(0, 2, weight=1.4)
    G.add_edge(2, 3, weight=1.0)
    H = nx.Graph()
    for u, v in G.edges():
        H.add_edge(u, v, weight=2 * G[u][v]["weight"] + 1)
    _close(
        _ours(spark, G, weight="weight * 2 + 1"),
        nx.betweenness_centrality(H, weight="weight"),
    )


def test_nonpositive_weight_raises(spark):
    G = nx.Graph()
    G.add_edge(0, 1, weight=0.0)
    G.add_edge(1, 2, weight=1.0)
    g = from_nx(spark, G)
    with pytest.raises(ValueError):
        betweenness_centrality(g, weight="weight").collect()


# ------------------------------------------------------------------ #
# weighted edge / subset / group forms
# ------------------------------------------------------------------ #


def _wgraph():
    G = nx.Graph()
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 1.0),
             (3, 4, 2.0), (1, 4, 6.0)]
    for u, v, w in edges:
        G.add_edge(u, v, weight=w)
    return G


def test_weighted_edge_betweenness(spark):
    from linkgraph.algos.betweenness import edge_betweenness_centrality

    G = _wgraph()
    g = from_nx(spark, G)
    want = nx.edge_betweenness_centrality(G, weight="weight")
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness_centrality(g, weight="weight").collect()
    }
    assert len(got) == len(want)
    for (u, v), w in want.items():
        key = (u, v) if (u, v) in got else (v, u)
        assert got[key] == pytest.approx(w, abs=1e-9), (u, v)


def test_weighted_subset_betweenness(spark):
    from linkgraph.algos.betweenness import betweenness_centrality_subset

    G = _wgraph()
    g = from_nx(spark, G)
    want = nx.betweenness_centrality_subset(
        G, sources=[0, 4], targets=[2, 3], weight="weight"
    )
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality_subset(
            g, [0, 4], [2, 3], weight="weight"
        ).collect()
    }
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_weighted_edge_subset_betweenness(spark):
    from linkgraph.algos.betweenness import edge_betweenness_centrality_subset

    G = _wgraph()
    g = from_nx(spark, G)
    want = nx.edge_betweenness_centrality_subset(
        G, sources=[0], targets=[3, 4], weight="weight"
    )
    got = {
        (r["u"], r["v"]): r["betweenness"]
        for r in edge_betweenness_centrality_subset(
            g, [0], [3, 4], weight="weight"
        ).collect()
    }
    for (u, v), w in want.items():
        if w == 0 and (u, v) not in got and (v, u) not in got:
            continue
        key = (u, v) if (u, v) in got else (v, u)
        assert got.get(key, 0.0) == pytest.approx(w, abs=1e-9), (u, v)


def test_weighted_group_betweenness(spark):
    from linkgraph.algos.betweenness import group_betweenness_centrality

    G = _wgraph()
    g = from_nx(spark, G)
    for group in ([2], [1, 3]):
        want = nx.group_betweenness_centrality(G, group, weight="weight")
        got = group_betweenness_centrality(g, group, weight="weight")
        assert got == pytest.approx(want, abs=1e-9), group


def test_weighted_prominent_group(spark):
    from linkgraph.algos.betweenness import prominent_group

    G = _wgraph()
    g = from_nx(spark, G)
    want_val, want_grp = nx.prominent_group(G, 1, weight="weight")
    got_val, got_grp = prominent_group(g, 1, weight="weight")
    assert got_val == pytest.approx(want_val, abs=1e-9)
    assert got_grp == want_grp


def test_endpoints_unweighted(spark):
    from linkgraph.algos.betweenness import betweenness_centrality

    for G in (nx.path_graph(5), nx.krackhardt_kite_graph(),
              nx.disjoint_union(nx.path_graph(3), nx.cycle_graph(4))):
        g = from_nx(spark, G)
        for norm in (True, False):
            want = nx.betweenness_centrality(G, normalized=norm, endpoints=True)
            got = {
                r["id"]: r["betweenness"]
                for r in betweenness_centrality(
                    g, normalized=norm, endpoints=True
                ).collect()
            }
            for v in want:
                assert got[v] == pytest.approx(want[v], abs=1e-9), (v, norm)


def test_endpoints_weighted(spark):
    from linkgraph.algos.betweenness import betweenness_centrality

    G = _wgraph()
    g = from_nx(spark, G)
    want = nx.betweenness_centrality(G, weight="weight", endpoints=True)
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(
            g, weight="weight", endpoints=True
        ).collect()
    }
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_weighted_percolation(spark):
    from linkgraph.graph import SparkGraph
    from linkgraph.algos.betweenness import percolation_centrality

    G = _wgraph()
    states = {0: 0.1, 1: 0.9, 2: 0.4, 3: 0.7, 4: 0.2}
    nx.set_node_attributes(G, states, "percolation")
    want = nx.percolation_centrality(G, weight="weight")
    edf = spark.createDataFrame(
        [(u, v, d["weight"]) for u, v, d in G.edges(data=True)],
        "src long, dst long, weight double",
    )
    vdf = spark.createDataFrame(
        [(n, states[n]) for n in G], "id long, percolation double"
    )
    g = SparkGraph(edf, vertices=vdf, directed=False, coalesce_edges=False)
    got = {
        r["id"]: r["percolation"]
        for r in percolation_centrality(g, weight="weight").collect()
    }
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_weighted_load_centrality(spark):
    from linkgraph.algos.betweenness import load_centrality

    G = _wgraph()
    g = from_nx(spark, G)
    for norm in (True, False):
        want = nx.load_centrality(G, weight="weight", normalized=norm)
        got = {
            r["id"]: r["load"]
            for r in load_centrality(g, normalized=norm, weight="weight").collect()
        }
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9), (v, norm)
    # weighted routing must differ from unweighted here
    un = nx.load_centrality(G)
    w = nx.load_centrality(G, weight="weight")
    assert any(abs(un[v] - w[v]) > 1e-9 for v in un)
