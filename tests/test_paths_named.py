"""Named shortest-path surface parity vs the reference shortest_paths pkg."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import SparkGraph
from linkgraph.algos import paths as P
from linkgraph.exceptions import NetworkXError


def _weighted_graph(seed=5, n=12, p=0.3, directed=False):
    G = nx.gnp_random_graph(n, p, seed=seed, directed=directed)
    for i, (u, v) in enumerate(sorted(G.edges())):
        G[u][v]["weight"] = float((u * 3 + v * 7 + i) % 5 + 1)
    return G


def _to_spark(spark, G, directed=None):
    directed = G.is_directed() if directed is None else directed
    rows = [(u, v, float(d.get("weight", 1.0))) for u, v, d in G.edges(data=True)]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    v = spark.createDataFrame([(n,) for n in G.nodes()], "id long")
    return SparkGraph(e, v, directed=directed, coalesce_edges=False)


def test_single_source_shortest_path_parity(spark):
    G = _weighted_graph(seed=2)
    g = _to_spark(spark, G)
    want = nx.single_source_shortest_path(G, 0)
    got = {
        r["id"]: list(r["path"])
        for r in P.single_source_shortest_path(g, 0).collect()
    }
    assert set(got) == set(want)
    for n, path in got.items():
        assert len(path) == len(want[n])  # same hop count
        assert nx.is_simple_path(G, path) or len(path) == 1


def test_single_source_dijkstra_path_parity(spark):
    G = _weighted_graph(seed=3)
    g = _to_spark(spark, G)
    want_len = nx.single_source_dijkstra_path_length(G, 0)
    rows = P.single_source_dijkstra_path(g, 0).collect()
    got_len = {r["id"]: r["distance"] for r in rows}
    assert got_len == pytest.approx(want_len)
    for r in rows:
        path = list(r["path"])
        if len(path) > 1:
            w = sum(G[a][b]["weight"] for a, b in zip(path, path[1:]))
            assert w == pytest.approx(r["distance"])


def test_multi_source_dijkstra_path_length(spark):
    G = _weighted_graph(seed=7)
    g = _to_spark(spark, G)
    want = nx.multi_source_dijkstra_path_length(G, {0, 5})
    got = {
        r["id"]: r["distance"]
        for r in P.multi_source_dijkstra_path_length(g, [0, 5]).collect()
    }
    assert got == pytest.approx(dict(want))


def test_multi_source_dijkstra_path(spark):
    G = _weighted_graph(seed=7)
    g = _to_spark(spark, G)
    want = nx.multi_source_dijkstra_path(G, {0, 5})
    rows = P.multi_source_dijkstra_path(g, [0, 5]).collect()
    got = {r["id"]: list(r["path"]) for r in rows}
    assert set(got) == set(want)
    for n, path in got.items():
        assert path[0] in (0, 5)
        assert path[-1] == n
        if len(path) > 1:
            w = sum(G[a][b]["weight"] for a, b in zip(path, path[1:]))
            want_w = sum(
                G[a][b]["weight"] for a, b in zip(want[n], want[n][1:])
            )
            assert w == pytest.approx(want_w)


def test_single_target_shortest_path(spark):
    G = _weighted_graph(seed=11, directed=True)
    g = _to_spark(spark, G)
    want = nx.single_target_shortest_path(G, 3)
    rows = P.single_target_shortest_path(g, 3).collect()
    got = {r["id"]: list(r["path"]) for r in rows}
    assert set(got) == set(want)
    for n, path in got.items():
        assert path[0] == n and path[-1] == 3
        assert len(path) == len(want[n])
    want_len = nx.single_target_shortest_path_length(G, 3)
    got_len = {
        r["id"]: r["distance"]
        for r in P.single_target_shortest_path_length(g, 3).collect()
    }
    assert got_len == dict(want_len)


def test_all_pairs_dijkstra_path_length(spark):
    G = _weighted_graph(seed=13)
    g = _to_spark(spark, G)
    want = {
        (s, t): d
        for s, row in dict(nx.all_pairs_dijkstra_path_length(G)).items()
        for t, d in row.items()
    }
    got = {
        (r["source"], r["id"]): r["distance"]
        for r in P.all_pairs_dijkstra_path_length(g).collect()
    }
    assert got == pytest.approx(want)


def test_all_pairs_shortest_path_guarded(spark):
    G = _weighted_graph(seed=17, n=8)
    g = _to_spark(spark, G)
    want = {
        (s, t): len(p)
        for s, row in dict(nx.all_pairs_shortest_path(G)).items()
        for t, p in row.items()
    }
    got = {
        (r["source"], r["id"]): len(r["path"])
        for r in P.all_pairs_shortest_path(g).collect()
    }
    assert got == want
    with pytest.raises(NetworkXError):
        P.all_pairs_shortest_path(g, max_sources=2)


def test_dijkstra_predecessor_and_distance(spark):
    G = _weighted_graph(seed=19)
    g = _to_spark(spark, G)
    want_pred, want_dist = nx.dijkstra_predecessor_and_distance(G, 0)
    rows = P.dijkstra_predecessor_and_distance(g, 0).collect()
    got_pred = {r["id"]: sorted(r["preds"]) for r in rows}
    got_dist = {r["id"]: r["distance"] for r in rows}
    assert got_dist == pytest.approx(want_dist)
    assert got_pred == {k: sorted(v) for k, v in want_pred.items()}


def test_bellman_ford_predecessor_and_distance_negative(spark):
    G = nx.DiGraph()
    G.add_edge(0, 1, weight=4.0)
    G.add_edge(0, 2, weight=2.0)
    G.add_edge(2, 1, weight=-1.0)
    G.add_edge(1, 3, weight=3.0)
    g = _to_spark(spark, G)
    want_pred, want_dist = nx.bellman_ford_predecessor_and_distance(G, 0)
    rows = P.bellman_ford_predecessor_and_distance(g, 0).collect()
    got_dist = {r["id"]: r["distance"] for r in rows}
    assert got_dist == pytest.approx(want_dist)
    got_pred = {r["id"]: sorted(r["preds"]) for r in rows}
    assert got_pred == {k: sorted(v) for k, v in want_pred.items()}


def test_bidirectional_dijkstra(spark):
    G = _weighted_graph(seed=23)
    g = _to_spark(spark, G)
    want_len, want_path = nx.bidirectional_dijkstra(G, 0, 9)
    got_len, got_path = P.bidirectional_dijkstra(g, 0, 9)
    assert got_len == pytest.approx(want_len)
    w = sum(G[a][b]["weight"] for a, b in zip(got_path, got_path[1:]))
    assert w == pytest.approx(want_len)


def test_johnson_negative_weights(spark):
    G = nx.DiGraph()
    G.add_edge(0, 1, weight=2.0)
    G.add_edge(1, 2, weight=-1.0)
    G.add_edge(0, 2, weight=4.0)
    G.add_edge(2, 3, weight=1.0)
    g = _to_spark(spark, G)
    want = nx.johnson(G)
    rows = P.johnson(g).collect()
    got = {(r["source"], r["id"]): r["distance"] for r in rows}
    for s, row in want.items():
        for t, path in row.items():
            w = sum(G[a][b]["weight"] for a, b in zip(path, path[1:]))
            assert got[(s, t)] == pytest.approx(w)


def test_negative_edge_cycle(spark):
    G = nx.DiGraph()
    G.add_edge(0, 1, weight=1.0)
    G.add_edge(1, 2, weight=-3.0)
    G.add_edge(2, 0, weight=1.0)
    g = _to_spark(spark, G)
    assert nx.negative_edge_cycle(G) is True
    assert P.negative_edge_cycle(g) is True
    H = nx.DiGraph()
    H.add_edge(0, 1, weight=-1.0)
    H.add_edge(1, 2, weight=2.0)
    h = _to_spark(spark, H)
    assert nx.negative_edge_cycle(H) is False
    assert P.negative_edge_cycle(h) is False


def test_find_negative_cycle(spark):
    G = nx.DiGraph()
    G.add_edge(0, 1, weight=1.0)
    G.add_edge(1, 2, weight=-3.0)
    G.add_edge(2, 1, weight=1.0)
    G.add_edge(2, 3, weight=1.0)
    g = _to_spark(spark, G)
    cyc = P.find_negative_cycle(g, 0)
    assert cyc[0] == cyc[-1]
    w = sum(G[a][b]["weight"] for a, b in zip(cyc, cyc[1:]))
    assert w < 0


def test_all_shortest_paths(spark):
    G = nx.cycle_graph(6)  # two equal paths between opposite nodes
    g = _to_spark(spark, G, directed=False)
    want = sorted(nx.all_shortest_paths(G, 0, 3))
    got = P.all_shortest_paths(g, 0, 3)
    assert got == want


def test_single_source_all_shortest_paths(spark):
    G = nx.cycle_graph(6)
    g = _to_spark(spark, G, directed=False)
    want = {
        n: sorted(ps)
        for n, ps in nx.single_source_all_shortest_paths(G, 0)
    }
    got = P.single_source_all_shortest_paths(g, 0)
    assert got == want


def test_reconstruct_path(spark):
    G = _weighted_graph(seed=29)
    g = _to_spark(spark, G)
    tree = P.shortest_path_tree(g, 0, weight="weight")
    path = P.reconstruct_path(0, 9, tree.select("id", "parent"))
    assert path[0] == 0 and path[-1] == 9
    w = sum(G[a][b]["weight"] for a, b in zip(path, path[1:]))
    assert w == pytest.approx(nx.dijkstra_path_length(G, 0, 9))


def test_goldberg_radzik_alias(spark):
    G = _weighted_graph(seed=31, directed=True)
    g = _to_spark(spark, G)
    want_pred, want_dist = nx.goldberg_radzik(G, 0)
    rows = P.goldberg_radzik(g, 0).collect()
    got_dist = {r["id"]: r["distance"] for r in rows}
    assert got_dist == pytest.approx(
        {k: float(v) for k, v in want_dist.items()}
    )


def test_bfs_beam_edges_width_cuts_frontier(spark):
    G = nx.balanced_tree(3, 3)
    g = _to_spark(spark, G, directed=False)
    # score = -id: beam prefers small ids, width 2 per level
    arcs = P.bfs_beam_edges(g, 0, F.expr("-id"), width=2).collect()
    by_depth = {}
    for r in arcs:
        by_depth.setdefault(r["depth"], []).append(r["dst"])
    for d, nodes in by_depth.items():
        assert len(nodes) <= 2
    # full-width beam == BFS reach
    full = P.bfs_beam_edges(g, 0, F.expr("-id")).collect()
    assert len(full) == G.number_of_nodes() - 1
