"""TimeRespecting(Di)GraphMatcher parity vs the reference
(``isomorphism/temporalisomorphvf2.py``)."""

from __future__ import annotations

from datetime import datetime, timedelta

import networkx as nx
import pytest

from linkgraph.graph import SparkGraph
from linkgraph.algos.isomorphism import (
    TimeRespectingGraphMatcher,
    TimeRespectingDiGraphMatcher,
)

D0 = datetime(2020, 1, 1)


def _pair(spark, edges, directed):
    """Build the same dated graph in nx and in the engine."""
    G = nx.DiGraph() if directed else nx.Graph()
    for u, v, days in edges:
        G.add_edge(u, v, date=D0 + timedelta(days=days))
    df = spark.createDataFrame(
        [(u, v, D0 + timedelta(days=d)) for u, v, d in edges],
        "src long, dst long, date timestamp",
    )
    g = SparkGraph(df, directed=directed, coalesce_edges=False)
    return G, g


def _mapset(it):
    return {tuple(sorted(m.items())) for m in it}


@pytest.mark.parametrize("delta_days,", [0, 1, 3])
def test_undirected_path_windows(spark, delta_days):
    # P4 with edge dates 0, 1, 2 — middle nodes see spans of 1 day
    edges = [(0, 1, 0), (1, 2, 1), (2, 3, 2)]
    G1, g1 = _pair(spark, edges, directed=False)
    pat = [(0, 1, 0), (1, 2, 0)]  # P3 pattern (dates on pattern unused)
    G2, g2 = _pair(spark, pat, directed=False)
    delta = timedelta(days=delta_days)
    ref = nx.isomorphism.TimeRespectingGraphMatcher(G1, G2, "date", delta)
    ours = TimeRespectingGraphMatcher(g1, g2, "date", delta)
    assert ours.subgraph_is_isomorphic() == ref.subgraph_is_isomorphic()
    assert _mapset(ours.subgraph_isomorphisms_iter()) == _mapset(
        ref.subgraph_isomorphisms_iter()
    )


def test_directed_flow_condition(spark):
    # chain 0->1->2: in at day 5, out at day 3 breaks flow at node 1
    bad = [(0, 1, 5), (1, 2, 3)]
    good = [(0, 1, 3), (1, 2, 5)]
    pat = [(0, 1, 0), (1, 2, 0)]
    G2, g2 = _pair(spark, pat, directed=True)
    delta = timedelta(days=10)
    for edges, want in [(bad, False), (good, True)]:
        G1, g1 = _pair(spark, edges, directed=True)
        ref = nx.isomorphism.TimeRespectingDiGraphMatcher(G1, G2, "date", delta)
        ours = TimeRespectingDiGraphMatcher(g1, g2, "date", delta)
        assert ref.subgraph_is_isomorphic() == want
        assert ours.subgraph_is_isomorphic() == want


def test_directed_enumeration_parity(spark):
    edges = [(0, 1, 0), (1, 2, 1), (0, 2, 2), (2, 3, 2), (3, 0, 9)]
    pat = [(0, 1, 0), (1, 2, 0)]
    for dd in (1, 2, 8):
        G1, g1 = _pair(spark, edges, directed=True)
        G2, g2 = _pair(spark, pat, directed=True)
        delta = timedelta(days=dd)
        ref = nx.isomorphism.TimeRespectingDiGraphMatcher(G1, G2, "date", delta)
        ours = TimeRespectingDiGraphMatcher(g1, g2, "date", delta)
        assert _mapset(ours.subgraph_isomorphisms_iter()) == _mapset(
            ref.subgraph_isomorphisms_iter()
        ), dd


def test_full_iso_same_size(spark):
    edges = [(0, 1, 0), (1, 2, 1)]
    G1, g1 = _pair(spark, edges, directed=False)
    G2, g2 = _pair(spark, edges, directed=False)
    delta = timedelta(days=1)
    ref = nx.isomorphism.TimeRespectingGraphMatcher(G1, G2, "date", delta)
    ours = TimeRespectingGraphMatcher(g1, g2, "date", delta)
    assert ours.is_isomorphic() == ref.is_isomorphic() is True
    assert _mapset(ours.isomorphisms_iter()) == _mapset(ref.isomorphisms_iter())
