"""Tests for parallel double-edge swaps and normalized rich club."""

import networkx as nx
import pytest

from pyspark.sql import functions as F

from linkgraph.graph import from_nx
from linkgraph.algos.swap import double_edge_swap
from linkgraph.algos.richclub import rich_club_coefficient
from linkgraph.exceptions import NotImplementedForDirected


def _degrees(g):
    e = g.edges
    return sorted(
        r["c"]
        for r in e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )


def test_swap_preserves_degree_sequence(spark):
    G = nx.gnp_random_graph(40, 0.15, seed=5)
    g = from_nx(spark, G)
    before = _degrees(g)
    swapped = double_edge_swap(g, nswap=30, seed=1)
    assert _degrees(swapped) == before
    # same edge count, still simple canonical
    assert swapped.edges.count() == g.edges.count()
    rows = swapped.edges.select("src", "dst").collect()
    assert all(r["src"] < r["dst"] for r in rows)
    assert len({(r["src"], r["dst"]) for r in rows}) == len(rows)


def test_swap_changes_edges(spark):
    G = nx.gnp_random_graph(40, 0.15, seed=7)
    g = from_nx(spark, G)
    swapped = double_edge_swap(g, nswap=30, seed=2)
    orig = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    new = {(r["src"], r["dst"]) for r in swapped.edges.select("src", "dst").collect()}
    assert orig != new


def test_swap_deterministic(spark):
    G = nx.gnp_random_graph(30, 0.15, seed=9)
    g = from_nx(spark, G)
    a = {(r["src"], r["dst"]) for r in double_edge_swap(g, 20, seed=3).edges.collect()}
    b = {(r["src"], r["dst"]) for r in double_edge_swap(g, 20, seed=3).edges.collect()}
    assert a == b


def test_swap_directed_raises(spark):
    with pytest.raises(NotImplementedForDirected):
        double_edge_swap(from_nx(spark, nx.DiGraph([(1, 2)])))


def test_rich_club_normalized(spark):
    # validity: finite positive coefficients over the same degree support
    # as the unnormalized form (the null trajectory differs from the
    # reference's sequential chain by construction)
    G = nx.gnp_random_graph(40, 0.2, seed=11)
    g = from_nx(spark, G)
    plain = {r["degree"]: r["coefficient"] for r in rich_club_coefficient(g).collect()}
    norm = {
        r["degree"]: r["coefficient"]
        for r in rich_club_coefficient(g, normalized=True, Q=3).collect()
    }
    assert set(norm) == set(plain)
    for k, v in norm.items():
        if v is None:
            continue
        assert v >= 0
        if plain[k] > 0:
            assert v > 0
