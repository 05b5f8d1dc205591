"""Generator family parity vs the reference (exact for deterministic
families; distributional for the hash-coin G(n, p))."""

from __future__ import annotations

import math

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph import generators as GEN


def _edges(g):
    return {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}


def _nodes(g):
    return {r["id"] for r in g.vertices.collect()}


@pytest.mark.parametrize("n", [0, 1, 2, 5, 12])
def test_path_graph(spark, n):
    g = GEN.path_graph(spark, n)
    G = nx.path_graph(n)
    assert _nodes(g) == set(G.nodes())
    assert _edges(g) == set(G.edges())


@pytest.mark.parametrize("n", [1, 2, 3, 7])
def test_cycle_graph(spark, n):
    g = GEN.cycle_graph(spark, n)
    G = nx.cycle_graph(n)
    want = {(min(u, v), max(u, v)) for u, v in G.edges()}
    got = {(min(u, v), max(u, v)) for u, v in _edges(g)}
    assert got == want
    gd = GEN.cycle_graph(spark, n, directed=True)
    Gd = nx.cycle_graph(n, create_using=nx.DiGraph)
    assert _edges(gd) == set(Gd.edges())


@pytest.mark.parametrize("n", [0, 1, 4, 8])
def test_complete_graph(spark, n):
    g = GEN.complete_graph(spark, n)
    G = nx.complete_graph(n)
    assert _nodes(g) == set(G.nodes())
    assert {(min(u, v), max(u, v)) for u, v in _edges(g)} == {
        (min(u, v), max(u, v)) for u, v in G.edges()
    }


def test_star_and_empty(spark):
    g = GEN.star_graph(spark, 5)
    G = nx.star_graph(5)
    assert _nodes(g) == set(G.nodes())
    assert _edges(g) == set(G.edges())
    e = GEN.empty_graph(spark, 7)
    assert e.number_of_nodes() == 7 and e.number_of_edges() == 0


def test_gnp_deterministic_and_distribution(spark):
    g1 = GEN.gnp_random_graph(spark, 60, 0.2, seed=9)
    g2 = GEN.gnp_random_graph(spark, 60, 0.2, seed=9)
    assert _edges(g1) == _edges(g2)  # same seed -> identical graph
    g3 = GEN.gnp_random_graph(spark, 60, 0.2, seed=10)
    assert _edges(g1) != _edges(g3)  # different seed -> different graph
    # edge count within 5 sigma of Binomial(C(60,2), 0.2)
    n_pairs = 60 * 59 // 2
    m = g1.number_of_edges()
    mu, sigma = n_pairs * 0.2, math.sqrt(n_pairs * 0.2 * 0.8)
    assert abs(m - mu) < 5 * sigma
    # graph algorithms run on it
    from linkgraph.algos.degrees import degrees

    assert degrees(g1).agg(F.sum("degree")).first()[0] == 2 * m
