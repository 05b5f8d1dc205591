"""Validity tests for the Baswana-Sen spanner (sparsifiers.py)."""

import networkx as nx
import pytest

from linkgraph.exceptions import NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.sparsifiers import spanner


def _check_stretch(G, rows, stretch, weight=None):
    H = nx.Graph()
    H.add_nodes_from(G.nodes)
    for r in rows:
        assert G.has_edge(r["src"], r["dst"])
        w = G[r["src"]][r["dst"]].get(weight, 1.0) if weight else 1.0
        assert r["weight"] == pytest.approx(w)
        H.add_edge(r["src"], r["dst"], weight=w)
    dG = dict(nx.all_pairs_dijkstra_path_length(G, weight=weight or "none"))
    dH = dict(nx.all_pairs_dijkstra_path_length(H, weight="weight" if weight else "none"))
    for u in G.nodes:
        for v, d in dG[u].items():
            assert v in dH[u], (u, v)
            assert dH[u][v] <= stretch * d + 1e-9, (u, v, dH[u][v], d)


@pytest.mark.parametrize("stretch", [3, 5])
def test_spanner_unweighted(spark, stretch):
    G = nx.gnp_random_graph(40, 0.25, seed=7)
    rows = spanner(from_nx(spark, G), stretch, seed=3).collect()
    _check_stretch(G, rows, stretch)
    assert len(rows) <= G.number_of_edges()


def test_spanner_weighted(spark):
    import random

    rng = random.Random(11)
    G = nx.gnp_random_graph(30, 0.3, seed=11)
    for u, v in G.edges():
        G[u][v]["weight"] = round(rng.uniform(1.0, 5.0), 3)
    rows = spanner(from_nx(spark, G), 3, weight="weight", seed=5).collect()
    _check_stretch(G, rows, 3, weight="weight")


def test_spanner_sparsifies(spark):
    # on a dense graph a 3-spanner should drop a large fraction of edges
    G = nx.gnp_random_graph(60, 0.5, seed=3)
    rows = spanner(from_nx(spark, G), 3, seed=9).collect()
    # at n=60 the O(n^1.5) bound is barely binding; require a real drop and
    # stay within 2x of the reference's own sample on the same graph
    assert len(rows) < 0.75 * G.number_of_edges()
    ref = nx.spanner(G, 3, seed=9)
    assert len(rows) <= 2 * ref.number_of_edges()
    _check_stretch(G, rows, 3)


def test_spanner_deterministic_and_errors(spark):
    G = nx.gnp_random_graph(20, 0.3, seed=2)
    a = {(r["src"], r["dst"]) for r in spanner(from_nx(spark, G), 3, seed=4).collect()}
    b = {(r["src"], r["dst"]) for r in spanner(from_nx(spark, G), 3, seed=4).collect()}
    assert a == b
    with pytest.raises(ValueError):
        spanner(from_nx(spark, G), 0)
    with pytest.raises(NotImplementedForDirected):
        spanner(from_nx(spark, nx.DiGraph([(0, 1)])), 3)
