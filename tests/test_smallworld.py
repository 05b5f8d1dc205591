"""Tests for the small-world coefficient (networkx/algorithms/smallworld.py)."""

import networkx as nx
import pytest

from linkgraph.exceptions import NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.smallworld import sigma, random_reference


def test_random_reference_preserves_degrees(spark):
    G = nx.watts_strogatz_graph(40, 6, 0.1, seed=3)
    g = from_nx(spark, G)
    gr = random_reference(g, niter=2, seed=5)
    from linkgraph.algos.degrees import degrees

    want = {r["id"]: r["degree"] for r in degrees(g).collect()}
    got = {r["id"]: r["degree"] for r in degrees(gr).collect()}
    assert got == want
    # and actually rewired something
    e0 = {tuple(r) for r in g.edges.select("src", "dst").collect()}
    e1 = {tuple(r) for r in gr.edges.select("src", "dst").collect()}
    assert e0 != e1


def test_sigma_separates_smallworld_from_random(spark):
    # A low-p Watts-Strogatz graph is the canonical sigma > 1 case; an
    # already-random graph sits near 1.
    WS = nx.watts_strogatz_graph(60, 6, 0.05, seed=7)
    s_ws = sigma(from_nx(spark, WS), niter=3, nrand=2, seed=11)
    assert s_ws > 1.5
    ER = nx.gnp_random_graph(60, 0.1, seed=7)
    ER = ER.subgraph(max(nx.connected_components(ER), key=len)).copy()
    s_er = sigma(from_nx(spark, ER), niter=3, nrand=2, seed=11)
    assert s_ws > s_er
    assert 0.4 < s_er < 2.0
    # determinism
    assert sigma(from_nx(spark, WS), niter=3, nrand=2, seed=11) == pytest.approx(s_ws)


def test_sigma_rejects_directed(spark):
    with pytest.raises(NotImplementedForDirected):
        sigma(from_nx(spark, nx.DiGraph([(0, 1)])))
