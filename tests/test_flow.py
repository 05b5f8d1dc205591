"""Max-flow / min-cut parity vs the reference flow package."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import SparkGraph
from linkgraph.algos.flow import (
    maximum_flow,
    maximum_flow_value,
    minimum_cut,
    NetworkXUnbounded,
)


def _digraph_with_caps(n, p, seed):
    G = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    for i, (u, v) in enumerate(sorted(G.edges())):
        G[u][v]["capacity"] = float((u * 7 + v * 3 + i) % 9 + 1)
    return G


def _to_spark(spark, G, directed=True):
    rows = [
        (u, v, 1.0, float(d["capacity"])) for u, v, d in G.edges(data=True)
    ]
    e = spark.createDataFrame(
        rows, "src long, dst long, weight double, capacity double"
    )
    v = spark.createDataFrame([(n,) for n in G.nodes()], "id long")
    return SparkGraph(e, v, directed=directed, coalesce_edges=False)


@pytest.mark.parametrize("seed", [1, 4, 9])
def test_maxflow_value_parity_gnp_digraph(spark, seed):
    G = _digraph_with_caps(12, 0.25, seed)
    g = _to_spark(spark, G)
    nodes = sorted(G.nodes())
    s, t = nodes[0], nodes[-1]
    want = nx.maximum_flow_value(G, s, t)
    got = maximum_flow_value(g, s, t)
    assert got == pytest.approx(want)


def test_maxflow_flow_is_valid_and_conserving(spark):
    G = _digraph_with_caps(10, 0.3, 7)
    g = _to_spark(spark, G)
    s, t = 0, 9
    value, flow = maximum_flow(g, s, t)
    rows = flow.collect()
    # capacity constraints on forward arcs
    for r in rows:
        u, v, f = r["u"], r["v"], r["flow"]
        if G.has_edge(u, v):
            assert f <= G[u][v]["capacity"] + 1e-9
    # conservation at internal nodes
    net = {}
    for r in rows:
        net[r["u"]] = net.get(r["u"], 0.0) - r["flow"]
        net[r["v"]] = net.get(r["v"], 0.0) + r["flow"]
    for n, x in net.items():
        if n not in (s, t):
            assert abs(x) < 1e-9
    assert net.get(t, 0.0) == pytest.approx(value)


def test_maxflow_undirected_parity(spark):
    G = nx.gnp_random_graph(10, 0.3, seed=3)
    for i, (u, v) in enumerate(sorted(G.edges())):
        G[u][v]["capacity"] = float((u + v + i) % 5 + 1)
    rows = [(u, v, 1.0, float(d["capacity"])) for u, v, d in G.edges(data=True)]
    e = spark.createDataFrame(rows, "src long, dst long, weight double, capacity double")
    v = spark.createDataFrame([(n,) for n in G.nodes()], "id long")
    g = SparkGraph(e, v, directed=False, coalesce_edges=False)
    s, t = 0, 9
    want = nx.maximum_flow_value(G, s, t)
    assert maximum_flow_value(g, s, t) == pytest.approx(want)


def test_mincut_value_and_partition(spark):
    G = _digraph_with_caps(12, 0.25, 4)
    g = _to_spark(spark, G)
    nodes = sorted(G.nodes())
    s, t = nodes[0], nodes[-1]
    want_value, (want_S, want_T) = nx.minimum_cut(G, s, t)
    value, (S_df, T_df) = minimum_cut(g, s, t)
    assert value == pytest.approx(want_value)
    S = {r["id"] for r in S_df.collect()}
    T = {r["id"] for r in T_df.collect()}
    assert s in S and t in T
    assert S | T == set(G.nodes()) and not (S & T)
    # the partition is A min-cut: crossing capacity equals the flow value
    crossing = sum(
        G[u][v]["capacity"] for u, v in G.edges() if u in S and v in T
    )
    assert crossing == pytest.approx(value)


def test_unbounded_raises(spark):
    # missing capacity column = infinite capacities, like the reference
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    g = SparkGraph(e, directed=True, coalesce_edges=False)
    with pytest.raises(NetworkXUnbounded):
        maximum_flow_value(g, 0, 2)


def test_disconnected_flow_is_zero(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0, 5.0), (2, 3, 1.0, 5.0)],
        "src long, dst long, weight double, capacity double",
    )
    g = SparkGraph(e, directed=True, coalesce_edges=False)
    assert maximum_flow_value(g, 0, 3) == 0.0


def test_ring_unit_capacity_closed_form(spark):
    # undirected cycle, unit caps: two arc-disjoint paths between any pair
    from linkgraph.generators import cycle_graph

    g0 = cycle_graph(spark, 12)
    e = g0.edges.withColumn("capacity", F.lit(1.0))
    g = SparkGraph(e, g0.vertices, directed=False, coalesce_edges=False)
    assert maximum_flow_value(g, 0, 6) == pytest.approx(2.0)


# ------------------------- local connectivity --------------------------- #


def test_edge_connectivity(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.flow import edge_connectivity

    G = nx.gnp_random_graph(25, 0.2, seed=5)
    want = nx.edge_connectivity(G, 0, 20)
    assert edge_connectivity(from_nx(spark, G), 0, 20) == want


def test_edge_connectivity_directed(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.flow import edge_connectivity

    G = nx.gnp_random_graph(20, 0.2, seed=9, directed=True)
    want = nx.edge_connectivity(G, 1, 15)
    assert edge_connectivity(from_nx(spark, G), 1, 15) == want


def test_node_connectivity(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.flow import node_connectivity

    G = nx.gnp_random_graph(25, 0.15, seed=13)
    pairs = [(s, t) for s in [0, 3] for t in [20, 22] if not G.has_edge(s, t)]
    for s, t in pairs:
        assert node_connectivity(from_nx(spark, G), s, t) == nx.node_connectivity(
            G, s, t
        ), (s, t)


def test_node_connectivity_adjacent_parity(spark):
    # the reference computes adjacent-pair connectivity as 1 + κ with the
    # direct edge removed (it does NOT raise)
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.flow import node_connectivity

    for G, pairs in [
        (nx.path_graph(4), [(0, 1)]),
        (nx.cycle_graph(5), [(0, 1)]),
        (nx.petersen_graph(), [(0, 1)]),
    ]:
        g = from_nx(spark, G)
        for s, t in pairs:
            assert node_connectivity(g, s, t) == nx.node_connectivity(G, s, t)


def test_max_flow_high_value_dinitz(spark):
    """Many augmenting paths in few phases — the Dinitz upgrade's target
    shape. Value parity with the reference on a random capacitated
    digraph."""
    import random

    import networkx as nx

    from linkgraph.graph import SparkGraph
    from linkgraph.algos.flow import maximum_flow_value

    rng = random.Random(11)
    G = nx.DiGraph()
    n = 40
    for u in range(n):
        for v in rng.sample([x for x in range(n) if x != u], 6):
            G.add_edge(u, v, capacity=float(rng.randint(1, 9)))
    rows = [(u, v, 1.0, d["capacity"]) for u, v, d in G.edges(data=True)]
    g = SparkGraph(
        spark.createDataFrame(
            rows, "src long, dst long, weight double, capacity double"
        ),
        directed=True,
        coalesce_edges=False,
    )
    assert maximum_flow_value(g, 0, n - 1) == nx.maximum_flow_value(G, 0, n - 1)
