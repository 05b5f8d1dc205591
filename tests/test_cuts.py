"""Parity tests for cut/expansion measures and partition_quality vs the
reference (networkx/algorithms/cuts.py, community/quality.py)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos import cuts as C
from linkgraph.algos.community import partition_quality


def _gnp(n=40, p=0.15, seed=11, directed=False):
    return nx.gnp_random_graph(n, p, seed=seed, directed=directed)


def _sets(spark, G, frac=3):
    S = [v for v in G.nodes if v % frac == 0]
    T = [v for v in G.nodes if v % frac != 0]
    sdf = spark.createDataFrame([(int(v),) for v in S], "id bigint")
    tdf = spark.createDataFrame([(int(v),) for v in T], "id bigint")
    return S, T, sdf, tdf


@pytest.mark.parametrize("directed", [False, True])
def test_cut_size_and_volume(spark, directed):
    G = _gnp(directed=directed, seed=13)
    S, T, sdf, tdf = _sets(spark, G)
    g = from_nx(spark, G)
    # the reference's directed cut_size requires an explicit T (T=None
    # raises inside edge_boundary); ours generalizes T=None to the
    # complement, which equals the explicit call
    assert C.cut_size(g, sdf) == pytest.approx(nx.cut_size(G, S, T))
    assert C.cut_size(g, sdf, tdf) == pytest.approx(nx.cut_size(G, S, T))
    assert C.volume(g, sdf) == pytest.approx(nx.volume(G, S))
    assert C.volume(g, tdf) == pytest.approx(nx.volume(G, T))


def test_cut_size_weighted(spark):
    G = _gnp(seed=5)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = 1.0 + (i % 4)
    S, T, sdf, tdf = _sets(spark, G)
    g = from_nx(spark, G)
    assert C.cut_size(g, sdf, weight="weight") == pytest.approx(
        nx.cut_size(G, S, weight="weight")
    )
    assert C.volume(g, sdf, weight="weight") == pytest.approx(
        nx.volume(G, S, weight="weight")
    )


@pytest.mark.parametrize("directed", [False, True])
def test_ratio_measures(spark, directed):
    G = _gnp(directed=directed, seed=23)
    S, T, sdf, tdf = _sets(spark, G)
    g = from_nx(spark, G)
    # explicit T for the reference (its directed T=None path raises)
    assert C.normalized_cut_size(g, sdf) == pytest.approx(
        nx.normalized_cut_size(G, S, T)
    )
    assert C.conductance(g, sdf) == pytest.approx(nx.conductance(G, S, T))
    assert C.edge_expansion(g, sdf) == pytest.approx(nx.edge_expansion(G, S, T))
    assert C.mixing_expansion(g, sdf) == pytest.approx(
        nx.mixing_expansion(G, S, T)
    )


def test_node_and_boundary_expansion(spark):
    G = _gnp(seed=31)
    S, T, sdf, tdf = _sets(spark, G, frac=4)
    g = from_nx(spark, G)
    assert C.node_expansion(g, sdf) == pytest.approx(nx.node_expansion(G, S))
    assert C.boundary_expansion(g, sdf) == pytest.approx(
        nx.boundary_expansion(G, S)
    )


def test_self_loop_volume(spark):
    G = nx.Graph([(0, 1), (1, 2), (2, 0), (0, 0)])
    g = from_nx(spark, G)
    sdf = g.spark.createDataFrame([(0,)], "id bigint")
    # reference degree counts the self-loop twice
    assert C.volume(g, sdf) == pytest.approx(nx.volume(G, [0]))


@pytest.mark.parametrize("directed", [False, True])
def test_partition_quality(spark, directed):
    G = _gnp(36, 0.14, seed=41, directed=directed)
    blocks = [
        [v for v in G.nodes if v % 3 == r] for r in range(3)
    ]
    want_cov, want_perf = nx.community.partition_quality(G, blocks)
    g = from_nx(spark, G)
    com = g.spark.createDataFrame(
        [(int(v), r) for r, b in enumerate(blocks) for v in b],
        "id bigint, community int",
    )
    cov, perf = partition_quality(g, com)
    assert cov == pytest.approx(want_cov)
    assert perf == pytest.approx(want_perf)


def test_partition_quality_rejects_non_partition(spark):
    G = nx.path_graph(5)
    g = from_nx(spark, G)
    com = g.spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "id bigint, community int"
    )
    with pytest.raises(ValueError):
        partition_quality(g, com)
