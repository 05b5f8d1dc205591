"""find_cycle parity vs the reference (validity + co-detection)."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import SparkGraph
from linkgraph.algos.cycles import NetworkXNoCycle, find_cycle


def _to_spark(spark, G):
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in G.edges()], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(n,) for n in G.nodes()], "id long")
    return SparkGraph(e, v, directed=G.is_directed(), coalesce_edges=False)


def _assert_closed(G, cycle, directed=True):
    assert cycle
    for i, e in enumerate(cycle):
        u, v = e[0], e[1]
        if directed:
            assert G.has_edge(u, v)
        else:
            assert G.has_edge(u, v) or G.has_edge(v, u)
        nxt = cycle[(i + 1) % len(cycle)]
        assert v == nxt[0]


def test_directed_cycle_found(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 0), (2, 3)])
    g = _to_spark(spark, G)
    cyc = find_cycle(g, source=0)
    _assert_closed(G, cyc)
    # the reference finds one too (sorted-neighbor order on this fixture)
    want = nx.find_cycle(G, source=0)
    assert sorted(cyc) == sorted(want)


def test_directed_acyclic_raises(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (0, 2)])
    g = _to_spark(spark, G)
    with pytest.raises(NetworkXNoCycle):
        find_cycle(g)
    with pytest.raises(nx.exception.NetworkXNoCycle):
        nx.find_cycle(G)


def test_undirected_cycle(spark):
    G = nx.cycle_graph(5)
    G.add_edge(4, 5)  # a tail
    g = _to_spark(spark, G)
    cyc = find_cycle(g, source=0)
    _assert_closed(G, cyc, directed=False)
    assert len(cyc) == 5


def test_undirected_tree_raises(spark):
    G = nx.balanced_tree(2, 3)
    g = _to_spark(spark, G)
    with pytest.raises(NetworkXNoCycle):
        find_cycle(g)


def test_orientation_ignore_mixed(spark):
    # directed graph whose only cycle needs one reversed arc
    G = nx.DiGraph([(0, 1), (1, 2), (0, 2)])
    g = _to_spark(spark, G)
    with pytest.raises(NetworkXNoCycle):
        find_cycle(g)
    cyc = find_cycle(g, orientation="ignore")
    assert all(len(e) == 3 for e in cyc)
    want = nx.find_cycle(G, orientation="ignore")
    assert len(cyc) == len(want)
    # closed walk under the direction tags
    pos = {e[:2] if e[2] == "forward" else (e[1], e[0]) for e in cyc}
    for u, v in pos:
        assert G.has_edge(u, v)


def test_orientation_original_none_equivalence(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    g = _to_spark(spark, G)
    plain = find_cycle(g)
    orig = find_cycle(g, orientation="original")
    assert [e[:2] for e in orig] == plain
    assert all(e[2] == "forward" for e in orig)


def test_source_restricts_component(spark):
    G = nx.DiGraph([(0, 1), (1, 0), (5, 6), (6, 7)])
    g = _to_spark(spark, G)
    cyc = find_cycle(g, source=0)
    _assert_closed(G, cyc)
    with pytest.raises(NetworkXNoCycle):
        find_cycle(g, source=5)
