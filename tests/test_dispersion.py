"""Parity tests for ego-network dispersion."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.linkpred import dispersion


def _want(G, **kw):
    d = nx.dispersion(G, **kw)
    return {(u, v): val for u, nbrs in d.items() for v, val in nbrs.items()}


def _got(spark, G, **kw):
    return {
        (r["u"], r["v"]): r["dispersion"]
        for r in dispersion(from_nx(spark, G), **kw).collect()
    }


def test_dispersion_normalized(spark):
    G = nx.gnp_random_graph(25, 0.2, seed=3)
    want = _want(G)
    got = _got(spark, G)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_dispersion_unnormalized(spark):
    G = nx.gnp_random_graph(25, 0.2, seed=7)
    want = _want(G, normalized=False)
    got = _got(spark, G, normalized=False)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_dispersion_alpha_b_c(spark):
    G = nx.gnp_random_graph(20, 0.25, seed=11)
    kw = dict(alpha=0.6, b=0.2, c=5.0)
    want = _want(G, **kw)
    got = _got(spark, G, **kw)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_dispersion_pair_restriction(spark):
    G = nx.gnp_random_graph(25, 0.2, seed=13)
    u, v = next(iter(G.edges()))
    want = nx.dispersion(G, u=u, v=v)
    prs = spark.createDataFrame([(u, v)], "u long, v long")
    got = _got(spark, G, pairs=prs)
    assert got[(u, v)] == pytest.approx(want, abs=1e-9)


# ----------------- community-aware link prediction -------------------- #

from linkgraph.algos.linkpred import (
    cn_soundarajan_hopcroft,
    ra_index_soundarajan_hopcroft,
    within_inter_cluster,
    common_neighbor_centrality,
)


def _community_fixture(spark, seed=5):
    G = nx.gnp_random_graph(24, 0.2, seed=seed)
    for v in G.nodes:
        G.nodes[v]["community"] = v % 3
    g = from_nx(spark, G)
    com = spark.createDataFrame(
        [(int(v), v % 3) for v in G.nodes], "id bigint, community int"
    )
    # the default candidate set: non-adjacent pairs sharing >= 1 neighbor
    cand = [
        (u, v)
        for u in G.nodes
        for v in G.nodes
        if u < v and not G.has_edge(u, v) and len(nx.common_neighbors(G, u, v))
    ]
    return G, g, com, cand


def _scores(df, col="score"):
    return {(r["u"], r["v"]): r[col] for r in df.collect()}


def test_cn_soundarajan_hopcroft(spark):
    G, g, com, cand = _community_fixture(spark)
    got = _scores(cn_soundarajan_hopcroft(g, com))
    want = {(u, v): s for u, v, s in nx.cn_soundarajan_hopcroft(G, cand)}
    assert got == want


def test_ra_index_soundarajan_hopcroft(spark):
    G, g, com, cand = _community_fixture(spark, seed=9)
    got = _scores(ra_index_soundarajan_hopcroft(g, com))
    want = {(u, v): s for u, v, s in nx.ra_index_soundarajan_hopcroft(G, cand)}
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v)


def test_within_inter_cluster(spark):
    G, g, com, cand = _community_fixture(spark, seed=13)
    got = _scores(within_inter_cluster(g, com))
    want = {(u, v): s for u, v, s in nx.within_inter_cluster(G, cand)}
    for k, v in want.items():
        assert got[k] == pytest.approx(v)
    with pytest.raises(ValueError):
        within_inter_cluster(g, com, delta=0)


def test_common_neighbor_centrality(spark):
    G, g, com, cand = _community_fixture(spark, seed=17)
    got = _scores(common_neighbor_centrality(g))
    want = {(u, v): s for u, v, s in nx.common_neighbor_centrality(G, cand)}
    for k, v in want.items():
        assert got[k] == pytest.approx(v)
    got1 = _scores(common_neighbor_centrality(g, alpha=1))
    want1 = {(u, v): s for u, v, s in nx.common_neighbor_centrality(G, cand, alpha=1)}
    for k, v in want1.items():
        assert got1[k] == pytest.approx(v)
