"""Parity tests for cd_index vs the reference
(networkx/algorithms/time_dependent.py:12)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.time_dependent import cd_index, cd_index_table


def _attach_times(spark, g, times, weights=None):
    rows = [
        (int(n), int(t)) + ((float(weights[n]),) if weights else ())
        for n, t in times.items()
    ]
    cols = ["id", "time"] + (["w"] if weights else [])
    return g.with_node_attrs(spark.createDataFrame(rows, cols))


def test_cd_index_docstring_fixture(spark):
    # the reference's integer-time example (time_dependent.py:55-79)
    G = nx.DiGraph([(1, 3), (1, 4), (2, 3), (3, 4), (3, 5)])
    times = {1: 2015, 2: 2012, 3: 2010, 4: 2008, 5: 2014}
    weights = {1: 1.0, 2: 4.0, 3: 1.0, 4: 1.0, 5: 1.0}
    nx.set_node_attributes(G, times, "time")
    nx.set_node_attributes(G, {2: 4}, "weight")

    g = _attach_times(spark, from_nx(spark, G), times, weights)
    assert cd_index(g, 3, time_delta=4) == pytest.approx(
        nx.cd_index(G, 3, time_delta=4)
    )
    assert cd_index(g, 3, time_delta=4, weight="w") == pytest.approx(
        nx.cd_index(G, 3, time_delta=4, weight="weight")
    )


def test_cd_index_table_parity(spark):
    G = nx.gnp_random_graph(25, 0.12, seed=13, directed=True)
    times = {n: (n * 7) % 11 for n in G.nodes}
    nx.set_node_attributes(G, times, "time")
    g = _attach_times(spark, from_nx(spark, G), times)
    got = {
        r["id"]: r["cd_index"]
        for r in cd_index_table(g, 3).collect()
    }
    for n in G.nodes:
        try:
            want = nx.cd_index(G, n, time_delta=3)
        except nx.NetworkXError:
            assert n not in got
            continue
        assert got[n] == pytest.approx(want), f"node {n}"


def test_cd_index_errors(spark):
    G = nx.DiGraph([(1, 2)])
    g = from_nx(spark, G)
    with pytest.raises(ValueError):
        cd_index_table(g, 1)  # no time column
    times = {1: 1, 2: 2}
    g2 = _attach_times(spark, g, times)
    with pytest.raises(ValueError):
        cd_index(g2, 2, time_delta=-5)  # no preds in horizon, no succs -> undefined
