"""Bipartite tail: matchings, redundancy, spectral bipartivity,
biadjacency, weighted projections, generators, extendability
(``networkx/algorithms/bipartite/*``)."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest
from networkx.algorithms import bipartite as nxb

import linkgraph as lg
import linkgraph.algos.bipartite as lb
from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError


def _top_df(spark, nodes):
    return spark.createDataFrame([(int(x),) for x in nodes], "id long")


def _bip(spark, B):
    return from_nx(spark, B)


def test_matching_aliases(spark):
    B = nx.bipartite.gnmk_random_graph(6, 7, 20, seed=3)
    g = _bip(spark, B)
    top = _top_df(spark, range(6))
    m1 = lb.hopcroft_karp_matching(g, top).count()
    m2 = lb.eppstein_matching(g, top).count()
    want = len(nxb.hopcroft_karp_matching(B, range(6))) // 2
    assert m1 == m2 == want


def test_is_bipartite_node_set_parity(spark):
    B = nx.bipartite.gnmk_random_graph(5, 6, 15, seed=5)
    g = _bip(spark, B)
    assert lb.is_bipartite_node_set(g, range(5)) == \
        nxb.is_bipartite_node_set(B, range(5))
    assert lb.is_bipartite_node_set(g, [0, 1, 2, 5]) == \
        nxb.is_bipartite_node_set(B, [0, 1, 2, 5])


def test_node_redundancy_parity(spark):
    B = nx.cycle_graph(8)  # bipartite; every node degree 2
    g = _bip(spark, B)
    got = {r["id"]: r["redundancy"] for r in lg.node_redundancy(g).collect()}
    want = nxb.node_redundancy(B)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    # low-degree raises
    g2 = _bip(spark, nx.path_graph(3))
    with pytest.raises(NetworkXError):
        lg.node_redundancy(g2)


def test_spectral_bipartivity(spark):
    # scipy-free oracle: bipartite graph -> 1.0; K3 -> reference formula
    B = nx.cycle_graph(6)
    g = _bip(spark, B)
    assert abs(lg.spectral_bipartivity(g) - 1.0) < 1e-9
    K3 = nx.complete_graph(3)
    g3 = _bip(spark, K3)
    A = nx.to_numpy_array(K3)
    evals, evecs = np.linalg.eigh(A)
    expA = (evecs * np.exp(evals)) @ evecs.T
    expmA = (evecs * np.exp(-evals)) @ evecs.T
    want = 0.5 * (expA + expmA).diagonal().sum() / expA.diagonal().sum()
    assert abs(lg.spectral_bipartivity(g3) - want) < 1e-9
    per = lg.spectral_bipartivity(g3, nodes=[0, 1])
    assert abs(per[0] - per[1]) < 1e-9


def test_biadjacency_roundtrip(spark):
    B = nx.bipartite.gnmk_random_graph(4, 5, 12, seed=7)
    g = _bip(spark, B)
    M = lg.biadjacency_matrix(g, range(4), range(4, 9))
    want = np.zeros((4, 5))
    for u, v in B.edges():
        u, v = (u, v) if u < 4 else (v, u)
        want[u, v - 4] = 1.0
    assert np.allclose(M, want)
    g2 = lg.from_biadjacency_matrix(spark, M)
    M2 = lg.biadjacency_matrix(g2, range(4), range(4, 9))
    assert np.allclose(M, M2)


def test_collaboration_projection_parity(spark):
    B = nx.bipartite.gnmk_random_graph(5, 4, 14, seed=9)
    g = _bip(spark, B)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in lg.collaboration_weighted_projected_graph(
            g, _top_df(spark, range(5))
        ).edges.collect()
    }
    H = nxb.collaboration_weighted_projected_graph(B, range(5))
    want = {
        (min(u, v), max(u, v)): d["weight"] for u, v, d in H.edges(data=True)
    }
    assert set(got) == set(want)
    for e in want:
        assert abs(got[e] - want[e]) < 1e-12


def test_generic_projection_default_and_callable(spark):
    B = nx.bipartite.gnmk_random_graph(5, 4, 14, seed=11)
    g = _bip(spark, B)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in lg.generic_weighted_projected_graph(
            g, _top_df(spark, range(5))
        ).edges.collect()
    }
    H = nxb.generic_weighted_projected_graph(B, range(5))
    want = {
        (min(u, v), max(u, v)): d["weight"] for u, v, d in H.edges(data=True)
    }
    assert got == want
    # callable: max shared-neighbor degree
    fn = lambda adj, u, v: len(adj.get(u, set()) & adj.get(v, set()))  # noqa
    got2 = {
        (r["src"], r["dst"]): r["weight"]
        for r in lg.generic_weighted_projected_graph(
            g, _top_df(spark, range(5)), weight_function=fn
        ).edges.collect()
    }
    assert got2 == want  # same default semantics


def test_minimum_weight_full_matching(spark):
    B = nx.Graph()
    weights = {(0, 3): 2.0, (0, 4): 1.0, (1, 3): 3.0, (1, 4): 1.0,
               (2, 3): 5.0, (2, 4): 4.0, (0, 5): 9.0, (1, 5): 9.0, (2, 5): 1.0}
    for (u, v), w in weights.items():
        B.add_edge(u, v, weight=w)
    g = _bip(spark, B)
    rows = lg.minimum_weight_full_matching(g, _top_df(spark, [0, 1, 2])).collect()
    total = sum(weights[(r["u"], r["v"])] for r in rows)
    assert len(rows) == 3
    assert total == 2.0 + 1.0 + 1.0  # 0-3(2), 1-4(1), 2-5(1)
    # infeasible: equal-size sides with an isolated top node
    B.add_node(7)
    B.add_node(8)
    g2 = _bip(spark, B)
    with pytest.raises(NetworkXError):
        lg.minimum_weight_full_matching(g2, _top_df(spark, [0, 1, 2, 7]))


def test_maximal_extendability_parity(spark):
    B = nx.complete_bipartite_graph(3, 3)
    g = _bip(spark, B)
    assert lg.maximal_extendability(g) == nxb.maximal_extendability(B)
    C = nx.cycle_graph(6)
    g2 = _bip(spark, C)
    assert lg.maximal_extendability(g2) == nxb.maximal_extendability(C)


def test_bipartite_generators(spark):
    g = lb.bipartite_random_graph(spark, 6, 8, 0.4, seed=3)
    assert g.vertices.count() == 14
    for r in g.edges.select("src", "dst").collect():
        assert r["src"] < 6 <= r["dst"]
    g2 = lb.gnmk_random_graph(spark, 6, 8, 17, seed=5)
    assert g2.edges.count() == 17
    g3 = lb.preferential_attachment_graph(spark, [2, 2, 3], 0.4, seed=7)
    outdeg = {
        r["src"]: r["s"]
        for r in g3.edges.groupBy("src").agg(
            __import__("pyspark").sql.functions.sum("weight").alias("s")
        ).collect()
    }
    assert outdeg == {0: 2.0, 1: 2.0, 2: 3.0}
    aseq, bseq = [2, 2, 2], [3, 2, 1]
    for fn, nxfn in [
        (lb.reverse_havel_hakimi_graph, nxb.reverse_havel_hakimi_graph),
        (lb.alternating_havel_hakimi_graph, nxb.alternating_havel_hakimi_graph),
    ]:
        got = fn(spark, aseq, bseq)
        got_edges = sorted(
            (r["src"], r["dst"])
            for r in got.edges.select("src", "dst").collect()
        )
        want_edges = sorted((u, v) for u, v, _k in nxfn(aseq, bseq).edges)
        assert got_edges == want_edges
    with pytest.raises(NetworkXError):
        lb.reverse_havel_hakimi_graph(spark, [2, 2], [1, 1, 1])
