"""asyn/fast LPA: partition validity + determinism (the reference's own
suite checks partitions, not labelings — label_propagation.py tests)."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import from_nx
from linkgraph.algos.lpa_variants import (
    asyn_lpa_communities,
    fast_label_propagation_communities,
)


def _partition(labels_df):
    rows = labels_df.collect()
    out = {}
    for r in rows:
        out.setdefault(r["label"], set()).add(r["id"])
    return {frozenset(v) for v in out.values()}


def _two_cliques_graph():
    G = nx.disjoint_union(nx.complete_graph(6), nx.complete_graph(7))
    return G


@pytest.mark.parametrize("fn", [asyn_lpa_communities, fast_label_propagation_communities])
def test_disjoint_cliques_exact(spark, fn):
    # any valid LPA run labels each clique uniformly (the reference's
    # test_connected_communities shape)
    G = _two_cliques_graph()
    g = from_nx(spark, G)
    parts = _partition(fn(g, seed=3))
    assert parts == {frozenset(range(6)), frozenset(range(6, 13))}


@pytest.mark.parametrize("fn", [asyn_lpa_communities, fast_label_propagation_communities])
def test_fixpoint_property_karate(spark, fn):
    # at termination every node's label must be of maximal weight in its
    # neighborhood (the keep-if-in-best stopping rule, label_propagation.py:218)
    G = nx.karate_club_graph()
    g = from_nx(spark, G)
    labels = {r["id"]: r["label"] for r in fn(g, seed=7).collect()}
    for v in G:
        freq = {}
        for u in G[v]:
            freq[labels[u]] = freq.get(labels[u], 0) + 1
        assert freq[labels[v]] == max(freq.values()), (v, freq, labels[v])


def test_deterministic_under_seed(spark):
    G = nx.gnp_random_graph(40, 0.15, seed=2)
    g = from_nx(spark, G)
    a = {(r["id"], r["label"]) for r in asyn_lpa_communities(g, seed=5).collect()}
    b = {(r["id"], r["label"]) for r in asyn_lpa_communities(g, seed=5).collect()}
    assert a == b


def test_isolated_nodes_singletons(spark):
    G = nx.empty_graph(4)
    g = from_nx(spark, G)
    parts = _partition(asyn_lpa_communities(g))
    assert parts == {frozenset([0]), frozenset([1]), frozenset([2]), frozenset([3])}
    parts_f = _partition(fast_label_propagation_communities(g))
    assert parts_f == parts
