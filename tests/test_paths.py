"""Parity tests for the shortest-path reconstruction / named-path API vs
the reference (shortest_paths/generic.py, unweighted.py, weighted.py,
traversal/breadth_first_search.py)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError
from linkgraph.algos import paths as P


def _wg(seed=3):
    G = nx.gnp_random_graph(18, 0.2, seed=seed)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    G = nx.relabel_nodes(G, {v: i for i, v in enumerate(sorted(G))})
    for u, v in G.edges:
        G.edges[u, v]["weight"] = float((u * 7 + v * 13) % 9 + 1)
    return G


@pytest.mark.parametrize("directed", [False, True])
def test_shortest_path_unweighted(spark, directed):
    G = nx.gnp_random_graph(16, 0.25, seed=5, directed=directed)
    g = from_nx(spark, G)
    for t in [1, 7, 15]:
        try:
            want = nx.shortest_path(G, 0, t)
        except nx.NetworkXNoPath:
            with pytest.raises(NetworkXError):
                P.shortest_path(g, 0, t)
            continue
        got = P.shortest_path(g, 0, t)
        assert len(got) == len(want)
        assert got[0] == 0 and got[-1] == t
        for u, v in zip(got, got[1:]):
            assert G.has_edge(u, v) or (not directed and G.has_edge(v, u))


def test_shortest_path_weighted(spark):
    G = _wg()
    g = from_nx(spark, G)
    t = max(G.nodes)
    want_len = nx.dijkstra_path_length(G, 0, t)
    got = P.dijkstra_path(g, 0, t)
    got_len = sum(G.edges[u, v]["weight"] for u, v in zip(got, got[1:]))
    assert got_len == pytest.approx(want_len)
    assert P.dijkstra_path_length(g, 0, t) == pytest.approx(want_len)
    assert P.bellman_ford_path_length(g, 0, t) == pytest.approx(want_len)
    bf = P.bellman_ford_path(g, 0, t)
    assert sum(
        G.edges[u, v]["weight"] for u, v in zip(bf, bf[1:])
    ) == pytest.approx(want_len)


def test_single_source_lengths(spark):
    G = nx.gnp_random_graph(20, 0.15, seed=9)
    g = from_nx(spark, G)
    want = nx.single_source_shortest_path_length(G, 0, cutoff=3)
    got = {
        r["id"]: r["distance"]
        for r in P.single_source_shortest_path_length(g, 0, cutoff=3).collect()
    }
    assert got == dict(want)


def test_all_pairs_lengths(spark):
    G = nx.gnp_random_graph(12, 0.3, seed=11)
    g = from_nx(spark, G)
    want = {
        (s, v): d
        for s, dd in nx.all_pairs_shortest_path_length(G)
        for v, d in dd.items()
    }
    got = {
        (r["source"], r["id"]): r["distance"]
        for r in P.all_pairs_shortest_path_length(g).collect()
    }
    assert got == want


def test_bidirectional(spark):
    G = nx.cycle_graph(9)
    g = from_nx(spark, G)
    want = nx.bidirectional_shortest_path(G, 0, 4)
    got = P.bidirectional_shortest_path(g, 0, 4)
    assert len(got) == len(want) and got[0] == 0 and got[-1] == 4


def test_predecessor(spark):
    G = nx.gnp_random_graph(15, 0.25, seed=13)
    g = from_nx(spark, G)
    want = {k: sorted(v) for k, v in nx.predecessor(G, 0).items()}
    got = {r["id"]: list(r["preds"]) for r in P.predecessor(g, 0).collect()}
    assert got == want


def test_bfs_pred_succ(spark):
    G = nx.gnp_random_graph(15, 0.25, seed=15, directed=True)
    g = from_nx(spark, G)
    want_pred = dict(nx.bfs_predecessors(G, 0))
    got_pred = {r["id"]: r["pred"] for r in P.bfs_predecessors(g, 0).collect()}
    # the BFS tree parent choice is traversal-order-specific; compare the
    # reached sets and that each parent is one BFS level up
    assert set(got_pred) == set(want_pred)
    dist = nx.single_source_shortest_path_length(G, 0)
    for v, p in got_pred.items():
        assert dist[p] + 1 == dist[v]
        assert G.has_edge(p, v)
    got_succ = {
        r["id"]: set(r["successors"])
        for r in P.bfs_successors(g, 0).collect()
    }
    # every reached non-root appears exactly once as someone's successor
    all_children = [c for s in got_succ.values() for c in s]
    assert sorted(all_children) == sorted(got_pred.keys())
