"""load_centrality parity + random-walk invariants."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import SparkGraph
from linkgraph.algos.betweenness import edge_load_centrality, load_centrality
from linkgraph.algos.walks import generate_random_paths, panther_similarity


def _to_spark(spark, G):
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in G.edges()], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(n,) for n in G.nodes()], "id long")
    return SparkGraph(e, v, directed=G.is_directed(), coalesce_edges=False)


def test_load_differs_from_betweenness_where_it_should(spark):
    # equal-split vs sigma-split diverge on this fixture
    G = nx.Graph([(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 2)])
    g = _to_spark(spark, G)
    got = {
        r["id"]: r["load"]
        for r in load_centrality(g, normalized=False).collect()
    }
    want = nx.load_centrality(G, normalized=False)
    assert got == pytest.approx(want)
    assert got[3] == pytest.approx(6.0)  # sigma-split would give 3.0 (×2)


@pytest.mark.parametrize("seed", [3, 14])
def test_load_centrality_parity_gnp(spark, seed):
    G = nx.gnp_random_graph(11, 0.3, seed=seed)
    g = _to_spark(spark, G)
    got = {r["id"]: r["load"] for r in load_centrality(g).collect()}
    want = nx.load_centrality(G)
    assert got == pytest.approx(want, abs=1e-9)


def test_load_centrality_directed_parity(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (0, 2), (2, 3), (3, 0), (1, 3)])
    g = _to_spark(spark, G)
    got = {
        r["id"]: r["load"]
        for r in load_centrality(g, normalized=False).collect()
    }
    want = nx.load_centrality(G, normalized=False)
    assert got == pytest.approx(want)


def test_edge_load_centrality_parity(spark):
    G = nx.path_graph(5)
    g = _to_spark(spark, G)
    rows = edge_load_centrality(g).collect()
    got = {(r["u"], r["v"]): r["load"] for r in rows}
    want = dict(nx.edge_load_centrality(G))
    # the reference lists both orientations with the same total; the
    # columnar result is one canonical row per undirected edge
    for (u, v), w in want.items():
        if u < v:
            assert got[(u, v)] == pytest.approx(w)
    assert len(got) == G.number_of_edges()


def test_generate_random_paths_shape(spark):
    G = nx.karate_club_graph()
    g = _to_spark(spark, G)
    paths = generate_random_paths(g, 25, 6, seed=3)
    rows = paths.collect()
    by_sample = {}
    for r in rows:
        by_sample.setdefault(r["sample"], []).append((r["step"], r["node"]))
    assert len(by_sample) == 25
    for steps in by_sample.values():
        steps.sort()
        # contiguous steps starting at 0, every hop a real edge
        assert [s for s, _ in steps] == list(range(len(steps)))
        nodes = [v for _, v in steps]
        for a, b in zip(nodes, nodes[1:]):
            assert G.has_edge(a, b)
        assert len(nodes) == 7  # karate has no sinks
    # deterministic per seed
    again = generate_random_paths(g, 25, 6, seed=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_panther_similarity_prefers_neighbors(spark):
    G = nx.barbell_graph(6, 0)
    g = _to_spark(spark, G)
    top = panther_similarity(g, 0, k=5, sample_size=3000, seed=7).collect()
    ids = [r["id"] for r in top]
    assert len(ids) == 5
    # the top-5 co-occurring nodes with node 0 live in its clique
    same_clique = set(range(1, 6))
    assert len(set(ids) & same_clique) >= 4
