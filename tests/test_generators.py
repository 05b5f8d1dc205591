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


def test_grid_2d_matches_nx(spark):
    import networkx as nx
    from linkgraph.generators import grid_2d_graph

    for m, n in [(3, 4), (1, 5), (4, 1), (2, 2)]:
        g = grid_2d_graph(spark, m, n)
        G = nx.grid_2d_graph(m, n)
        enc = {(i * n + j) for i, j in G.nodes()}
        got_edges = {(r["src"], r["dst"]) for r in g.edges.collect()}
        want_edges = {
            (min(a[0] * n + a[1], b[0] * n + b[1]),
             max(a[0] * n + a[1], b[0] * n + b[1]))
            for a, b in G.edges()
        }
        assert got_edges == want_edges, (m, n)
        assert {r["id"] for r in g.vertices.collect()} == enc


def test_grid_2d_periodic_matches_nx(spark):
    import networkx as nx
    from linkgraph.generators import grid_2d_graph

    m, n = 4, 5
    g = grid_2d_graph(spark, m, n, periodic=True)
    G = nx.grid_2d_graph(m, n, periodic=True)
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    want = {
        (min(a[0] * n + a[1], b[0] * n + b[1]),
         max(a[0] * n + a[1], b[0] * n + b[1]))
        for a, b in G.edges()
    }
    assert got == want


def test_lollipop_matches_nx(spark):
    import networkx as nx
    from linkgraph.generators import lollipop_graph

    g = lollipop_graph(spark, 5, 3)
    G = nx.lollipop_graph(5, 3)
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    want = {(min(u, v), max(u, v)) for u, v in G.edges()}
    assert got == want
    assert g.number_of_nodes() == G.number_of_nodes()


def test_barabasi_albert_power_law_tail(spark):
    from linkgraph.generators import barabasi_albert_graph
    from linkgraph.algos.degrees import degrees
    from linkgraph.algos.components import connected_components
    from pyspark.sql import functions as F

    g = barabasi_albert_graph(spark, 2000, 3, seed=7)
    deg = degrees(g)
    stats = deg.agg(
        F.max("degree").alias("mx"), F.avg("degree").alias("avg")
    ).first()
    # hub skew: the largest hub is an order of magnitude above the mean
    assert stats["mx"] >= 8 * stats["avg"]
    # every node t >= m keeps an arc to a lower id -> one component
    ncomp = connected_components(g).select("component").distinct().count()
    assert ncomp == 1
    # deterministic per seed
    g2 = barabasi_albert_graph(spark, 2000, 3, seed=7)
    assert g2.edges.count() == g.edges.count()


def test_barabasi_albert_as_skew_fixture_for_salted_pagerank(spark):
    # the salted two-phase aggregation must be value-identical on a
    # hub-skewed graph — BA is the SURVEY-named skew proxy
    from linkgraph.generators import barabasi_albert_graph
    from linkgraph.algos.pagerank import pagerank

    g = barabasi_albert_graph(spark, 500, 2, seed=3)
    plain = {r["id"]: r["rank"] for r in pagerank(g, fixed_iter=8).collect()}
    salted = {
        r["id"]: r["rank"]
        for r in pagerank(g, fixed_iter=8, hub_salt=8).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-12


def test_barabasi_albert_validation(spark):
    import pytest as _pytest
    from linkgraph.generators import barabasi_albert_graph

    with _pytest.raises(ValueError):
        barabasi_albert_graph(spark, 5, 0)
    with _pytest.raises(ValueError):
        barabasi_albert_graph(spark, 5, 5)


def test_watts_strogatz_p0_exact_lattice(spark):
    from linkgraph.generators import watts_strogatz_graph

    g = watts_strogatz_graph(spark, 20, 4, 0.0)
    want = {(min(u, v), max(u, v)) for u, v in nx.watts_strogatz_graph(20, 4, 0.0).edges()}
    got = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    assert got == want


def test_watts_strogatz_rewired(spark):
    from linkgraph.generators import watts_strogatz_graph

    g = watts_strogatz_graph(spark, 100, 6, 0.3, seed=7)
    m = g.number_of_edges()
    assert 0.9 * 300 <= m <= 300  # collapse loses only a few duplicates
    lattice = {(min(u, v), max(u, v)) for u, v in nx.watts_strogatz_graph(100, 6, 0.0).edges()}
    got = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    moved = len(got - lattice)
    assert 0.15 * 300 <= moved <= 0.45 * 300  # ~p of edges rewired
    # determinism
    g2 = watts_strogatz_graph(spark, 100, 6, 0.3, seed=7)
    got2 = {(r["src"], r["dst"]) for r in g2.edges.select("src", "dst").collect()}
    assert got == got2


def test_house_graph_matches_nx(spark):
    g = GEN.house_graph(spark)
    G = nx.house_graph()
    assert _nodes(g) == set(G.nodes())
    assert _edges(g) == {(min(u, v), max(u, v)) for u, v in G.edges()}
    gx = GEN.house_graph(spark, with_x=True)
    GX = nx.house_x_graph()
    assert {(min(u, v), max(u, v)) for u, v in _edges(gx)} == {
        (min(u, v), max(u, v)) for u, v in GX.edges()
    }


def test_karate_club_matches_nx(spark):
    g = GEN.karate_club_graph(spark)
    G = nx.karate_club_graph()
    assert _nodes(g) == set(G.nodes())
    assert _edges(g) == {(min(u, v), max(u, v)) for u, v in G.edges()}
    clubs = {r["id"]: r["club"] for r in g.vertices.collect()}
    assert clubs == {n: d["club"] for n, d in G.nodes(data=True)}


def test_powerlaw_cluster_graph(spark):
    import linkgraph

    n, m = 400, 3
    g0 = GEN.powerlaw_cluster_graph(spark, n, m, 0.0, seed=7)
    # p=0 degenerates to the BA static-sampling graph
    ba = GEN.barabasi_albert_graph(spark, n, m, seed=7)
    assert _edges(g0) == _edges(ba)

    gp = GEN.powerlaw_cluster_graph(spark, n, m, 0.9, seed=7)
    # connectivity: every node reaches node 0 (draw j=0 is always PA)
    comps = linkgraph.connected_components(gp)
    assert comps.select("component").distinct().count() == 1
    # clustering must rise substantially with p, like the Holme-Kim model
    c0 = linkgraph.average_clustering(g0)
    cp = linkgraph.average_clustering(gp)
    assert cp > c0 * 1.5
    # same magnitude as the reference model at the same (n, m, p)
    C = nx.average_clustering(nx.powerlaw_cluster_graph(n, m, 0.9, seed=7))
    assert 0.3 * C < cp < 3.0 * C
    # hub skew retained: max degree far above the median
    degs = sorted(
        r["degree"] for r in linkgraph.degrees(gp).select("degree").collect()
    )
    assert degs[-1] > 6 * degs[len(degs) // 2]


def test_powerlaw_cluster_validation(spark):
    with pytest.raises(ValueError):
        GEN.powerlaw_cluster_graph(spark, 5, 5, 0.5)
    with pytest.raises(ValueError):
        GEN.powerlaw_cluster_graph(spark, 5, 2, 1.5)
