"""Parity tests for girth vs the reference (networkx cycles.girth)."""

import networkx as nx
import pytest

from linkgraph.exceptions import NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.girth import girth


@pytest.mark.parametrize(
    "G",
    [
        nx.cycle_graph(5),
        nx.cycle_graph(8),
        nx.petersen_graph(),
        nx.complete_graph(5),
        nx.path_graph(6),  # forest: inf
        nx.lollipop_graph(4, 3),
        nx.disjoint_union(nx.path_graph(4), nx.cycle_graph(7)),
    ],
)
def test_girth_fixtures(spark, G):
    assert girth(from_nx(spark, G)) == nx.girth(G)


@pytest.mark.parametrize("seed", [3, 9, 17])
def test_girth_random(spark, seed):
    G = nx.gnp_random_graph(20, 0.12, seed=seed)
    assert girth(from_nx(spark, G)) == nx.girth(G)


def test_girth_selfloop_and_directed(spark):
    G = nx.Graph([(0, 1), (1, 2), (0, 0)])
    assert girth(from_nx(spark, G)) == 1.0
    with pytest.raises(NotImplementedForDirected):
        girth(from_nx(spark, nx.DiGraph([(0, 1)])))
