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
