"""Parity tests for visibility_graph vs the reference
(networkx/generators/time_series.py:12)."""

import random

import networkx as nx
import pytest

from linkgraph.algos.timeseries import visibility_graph, visibility_graph_edges


def _want(series):
    return {tuple(sorted(e)) for e in nx.visibility_graph(series).edges()}


@pytest.mark.parametrize(
    "series",
    [
        list(range(10)),
        [2, 1, 3, 2, 1, 3, 2, 1, 3, 2, 1, 3],
        [5, 5, 5, 5],  # ties obstruct
        [3.0],
        [1.0, 9.0],
    ],
)
def test_visibility_fixtures(spark, series):
    got = {
        (r["src"], r["dst"])
        for r in visibility_graph_edges(spark, series).collect()
    }
    assert got == _want(series)


def test_visibility_random_parity(spark):
    rng = random.Random(17)
    series = [round(rng.uniform(0, 10), 3) for _ in range(60)]
    got = {
        (r["src"], r["dst"])
        for r in visibility_graph_edges(spark, series).collect()
    }
    assert got == _want(series)


def test_visibility_graph_nodes(spark):
    series = [4, 2, 7, 1]
    g = visibility_graph(spark, series)
    vals = {r["id"]: r["value"] for r in g.vertices.collect()}
    assert vals == {i: float(v) for i, v in enumerate(series)}
