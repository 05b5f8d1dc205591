"""Parity tests for bipartite projections vs networkx.bipartite."""

import networkx as nx
import pytest
from networkx.algorithms import bipartite as nxb
from pyspark.sql import functions as F

from linkgraph.graph import from_nx
from linkgraph.algos.bipartite import (
    projected_graph,
    weighted_projected_graph,
    overlap_weighted_projected_graph,
    birank,
)


@pytest.fixture(scope="module")
def bip(spark):
    # bottom side 0..9, top side 100..105, seeded random bipartite
    G = nx.bipartite.random_graph(10, 6, 0.4, seed=7)
    # relabel top side to 100+ so side membership is obvious
    G = nx.relabel_nodes(G, {10 + i: 100 + i for i in range(6)})
    bottom = [n for n in G.nodes() if n < 100]
    return G, bottom


def _nodes_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _wedges(g):
    return {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}


def test_weighted_projection_parity(spark, bip):
    G, bottom = bip
    want = {
        (min(u, v), max(u, v)): float(d["weight"])
        for u, v, d in nxb.weighted_projected_graph(G, bottom).edges(data=True)
    }
    got = _wedges(weighted_projected_graph(from_nx(spark, G), _nodes_df(spark, bottom)))
    assert got == want


def test_unweighted_projection_parity(spark, bip):
    G, bottom = bip
    want = {tuple(sorted(e)) for e in nxb.projected_graph(G, bottom).edges()}
    got = set(_wedges(projected_graph(from_nx(spark, G), _nodes_df(spark, bottom))))
    assert got == want


def test_ratio_projection_parity(spark, bip):
    G, bottom = bip
    want = {
        (min(u, v), max(u, v)): d["weight"]
        for u, v, d in nxb.weighted_projected_graph(G, bottom, ratio=True).edges(data=True)
    }
    got = _wedges(
        weighted_projected_graph(from_nx(spark, G), _nodes_df(spark, bottom), ratio=True)
    )
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_overlap_projection_parity(spark, bip):
    G, bottom = bip
    want = {
        (min(u, v), max(u, v)): d["weight"]
        for u, v, d in nxb.overlap_weighted_projected_graph(G, bottom).edges(data=True)
    }
    got = _wedges(
        overlap_weighted_projected_graph(from_nx(spark, G), _nodes_df(spark, bottom))
    )
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_hub_cap_drops_quadratic_blowup(spark):
    G = nx.Graph()
    for i in range(6):
        G.add_edge(i, 100)        # hub order shared by all 6
    G.add_edge(0, 101); G.add_edge(1, 101)
    g = from_nx(spark, G)
    nodes = _nodes_df(spark, range(6))
    full = weighted_projected_graph(g, nodes)
    capped = weighted_projected_graph(g, nodes, max_opposite_degree=3)
    assert full.number_of_edges() == 15  # C(6,2)
    assert set(_wedges(capped)) == {(0, 1)}  # only the small co-occurrence survives


# -------------------------------- birank -------------------------------- #


def _birank_dict(df):
    return {r["id"]: r["score"] for r in df.collect()}


def _birank_numpy(G, top, top_personalization=None, alpha=None, beta=None,
                  max_iter=100, tol=1e-6):
    # Dense-numpy replica of networkx/algorithms/bipartite/link_analysis.py:9
    # (the installed nx needs scipy, absent here; numpy suffices at test size).
    import numpy as np

    top = list(top)
    bottom = [n for n in G.nodes() if n not in set(top)]
    tp = {k: v for k, v in (top_personalization or {}).items() if v != 0}
    if alpha is None:
        alpha = 0.8 if tp else 1.0
    if beta is None:
        beta = 1.0
    p0 = np.array([tp.get(n, 0.0) for n in top])
    u0 = np.zeros(len(bottom))
    W = np.zeros((len(bottom), len(top)))
    for bi, b in enumerate(bottom):
        for ti, t in enumerate(top):
            if G.has_edge(b, t):
                W[bi, ti] = G[b][t].get("weight", 1.0)
    pd = W.sum(axis=0); pd[pd == 0] = 1.0
    ud = W.sum(axis=1); ud[ud == 0] = 1.0
    S = (W / np.sqrt(ud)[:, None]) / np.sqrt(pd)[None, :]
    p = np.ones(len(top)) / len(top)
    u = beta * (S @ p) + (1 - beta) * u0
    for _ in range(max_iter):
        pl, ul = p, u
        p = alpha * (S.T @ u) + (1 - alpha) * p0
        u = beta * (S @ p) + (1 - beta) * u0
        if (np.abs((ul - u) / np.maximum(1.0, ul)).sum() < len(u) * tol
                and np.abs((pl - p) / np.maximum(1.0, pl)).sum() < len(p) * tol):
            if alpha == 1 and beta == 1:
                p = p / np.abs(p).sum(); u = u / np.abs(u).sum()
            return {**dict(zip(top, p)), **dict(zip(bottom, u))}
    raise AssertionError("no convergence")


def test_birank_parity_default(spark, bip):
    G, bottom = bip
    top = [n for n in G.nodes() if n >= 100]
    want = _birank_numpy(G, top)
    got = _birank_dict(
        birank(from_nx(spark, G), _nodes_df(spark, top))
    )
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, rel=1e-4, abs=1e-8), n


def test_birank_parity_personalized_weighted(spark):
    G = nx.Graph()
    elist = [
        ("u1", "p1", 5.0), ("u2", "p1", 4.0), ("u2", "p2", 5.0),
        ("u3", "p2", 1.0), ("u3", "p3", 3.0), ("u1", "p3", 2.0),
    ]
    G.add_weighted_edges_from(elist)
    ids = {n: i for i, n in enumerate(sorted(G.nodes()))}
    Gi = nx.relabel_nodes(G, ids)
    top = [ids[p] for p in ("p1", "p2", "p3")]
    pers = {ids["p1"]: 5.0}
    want = _birank_numpy(Gi, top, top_personalization=pers)
    g = from_nx(spark, Gi)
    pdf = spark.createDataFrame(list(pers.items()), "id long, v double")
    got = _birank_dict(
        birank(g, _nodes_df(spark, top), top_personalization=pdf)
    )
    for n, v in want.items():
        assert got[n] == pytest.approx(v, rel=1e-4, abs=1e-8), n


def test_birank_raises_on_empty_side(spark):
    G = nx.Graph([(0, 1)])
    with pytest.raises(ValueError, match="at least one node"):
        birank(from_nx(spark, G), _nodes_df(spark, [0, 1]))
