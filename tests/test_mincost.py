"""Min-cost flow parity vs the reference mincost/networksimplex modules."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import SparkGraph
from linkgraph.algos.mincost import (
    NetworkXUnfeasible,
    capacity_scaling,
    cost_of_flow,
    max_flow_min_cost,
    min_cost_flow,
    min_cost_flow_cost,
    network_simplex,
)


def _to_spark(spark, G):
    rows = [
        (
            u,
            v,
            float(d.get("weight", 0.0)),
            float(d["capacity"]) if "capacity" in d else float("inf"),
        )
        for u, v, d in G.edges(data=True)
    ]
    e = spark.createDataFrame(
        rows, "src long, dst long, weight double, capacity double"
    )
    v = spark.createDataFrame(
        [(n, float(d.get("demand", 0.0))) for n, d in G.nodes(data=True)],
        "id long, demand double",
    )
    return SparkGraph(e, v, directed=True, coalesce_edges=False)


def _check_flow_valid(G, flow_rows):
    """Conservation + capacity feasibility of our (u, v, flow) rows."""
    net = {n: 0.0 for n in G.nodes()}
    for r in flow_rows:
        u, v, f = r["u"], r["v"], r["flow"]
        assert G.has_edge(u, v)
        cap = G[u][v].get("capacity", float("inf"))
        assert f <= cap + 1e-9
        assert f >= -1e-9
        net[u] -= f
        net[v] += f
    for n, d in G.nodes(data=True):
        assert net[n] == pytest.approx(d.get("demand", 0.0), abs=1e-9)


def _transport_fixture():
    # the reference's doctest network (mincost.py docstring)
    G = nx.DiGraph()
    G.add_node("a", demand=-5)
    G.add_node("d", demand=5)
    G.add_edge("a", "b", weight=3, capacity=4)
    G.add_edge("a", "c", weight=6, capacity=10)
    G.add_edge("b", "d", weight=1, capacity=9)
    G.add_edge("c", "d", weight=2, capacity=5)
    return nx.convert_node_labels_to_integers(G)


def test_min_cost_flow_doctest_network(spark):
    G = _transport_fixture()
    g = _to_spark(spark, G)
    want = nx.min_cost_flow_cost(G)
    got = min_cost_flow_cost(g)
    assert got == want
    rows = min_cost_flow(g).collect()
    _check_flow_valid(G, rows)
    assert sum(
        r["flow"] * G[r["u"]][r["v"]]["weight"] for r in rows
    ) == pytest.approx(want)


@pytest.mark.parametrize("seed", [3, 11, 27])
def test_network_simplex_random_parity(spark, seed):
    G = nx.gnp_random_graph(10, 0.4, seed=seed, directed=True)
    H = nx.DiGraph()
    H.add_nodes_from(G.nodes())
    for i, (u, v) in enumerate(sorted(G.edges())):
        H.add_edge(u, v, weight=(u * 5 + v * 3 + i) % 7, capacity=(i % 5) + 2)
    # balanced demands on the first two / last two nodes; only keep
    # feasible instances (the generator may disconnect supply from demand)
    H.nodes[0]["demand"] = -3
    H.nodes[1]["demand"] = -2
    H.nodes[8]["demand"] = 2
    H.nodes[9]["demand"] = 3
    try:
        want_cost, _ = nx.network_simplex(H)
    except nx.NetworkXUnfeasible:
        g = _to_spark(spark, H)
        with pytest.raises(NetworkXUnfeasible):
            network_simplex(g)
        return
    g = _to_spark(spark, H)
    got_cost, flow = network_simplex(g)
    assert got_cost == want_cost
    _check_flow_valid(H, flow.collect())


def test_negative_costs_parity(spark):
    H = nx.DiGraph()
    H.add_node(0, demand=-4)
    H.add_node(3, demand=4)
    H.add_edge(0, 1, weight=2, capacity=4)
    H.add_edge(1, 2, weight=-3, capacity=3)  # negative arc on the way
    H.add_edge(2, 3, weight=1, capacity=4)
    H.add_edge(1, 3, weight=4, capacity=4)
    want, _ = nx.network_simplex(H)
    g = _to_spark(spark, H)
    got, flow = network_simplex(g)
    assert got == want
    _check_flow_valid(H, flow.collect())


def test_negative_cycle_circulation(spark):
    # zero demands + a finite-capacity negative cycle: the optimum is the
    # min-cost circulation that saturates the cycle (network_simplex
    # agrees; plain SSP without the presend transformation would miss it)
    H = nx.DiGraph()
    H.add_nodes_from(range(3))
    H.add_edge(0, 1, weight=-2, capacity=3)
    H.add_edge(1, 2, weight=-1, capacity=3)
    H.add_edge(2, 0, weight=1, capacity=3)
    want, _ = nx.network_simplex(H)
    g = _to_spark(spark, H)
    got, flow = network_simplex(g)
    assert got == want == -6
    _check_flow_valid(H, flow.collect())


def test_unfeasible_demand_sum_raises(spark):
    H = nx.DiGraph()
    H.add_node(0, demand=-2)
    H.add_node(1, demand=3)
    H.add_edge(0, 1, weight=1, capacity=5)
    g = _to_spark(spark, H)
    with pytest.raises(NetworkXUnfeasible):
        min_cost_flow(g)


def test_unfeasible_capacity_raises(spark):
    H = nx.DiGraph()
    H.add_node(0, demand=-5)
    H.add_node(1, demand=5)
    H.add_edge(0, 1, weight=1, capacity=2)  # can only carry 2 of 5
    g = _to_spark(spark, H)
    with pytest.raises(NetworkXUnfeasible):
        min_cost_flow(g)


def test_max_flow_min_cost_parity(spark):
    G = nx.DiGraph()
    edges = [
        (0, 1, 3, 4), (0, 2, 6, 10), (1, 2, 1, 5),
        (1, 3, 1, 9), (2, 3, 2, 5), (2, 4, 4, 8), (3, 4, 1, 6),
    ]
    for u, v, w, c in edges:
        G.add_edge(u, v, weight=w, capacity=c)
    want_flow = nx.max_flow_min_cost(G, 0, 4)
    want_cost = nx.cost_of_flow(G, want_flow)
    want_value = sum(want_flow[0].values())
    g = _to_spark(spark, G)
    flow = max_flow_min_cost(g, 0, 4)
    rows = flow.collect()
    got_value = sum(r["flow"] for r in rows if r["u"] == 0)
    assert got_value == pytest.approx(want_value)
    assert cost_of_flow(g, flow) == want_cost
    for r in rows:
        assert r["flow"] <= G[r["u"]][r["v"]]["capacity"] + 1e-9


def test_capacity_scaling_alias(spark):
    G = _transport_fixture()
    g = _to_spark(spark, G)
    want_cost, _ = nx.capacity_scaling(G)
    got_cost, _ = capacity_scaling(g)
    assert got_cost == want_cost


def test_cost_of_flow_roundtrip(spark):
    G = _transport_fixture()
    g = _to_spark(spark, G)
    flow = min_cost_flow(g)
    assert cost_of_flow(g, flow) == nx.min_cost_flow_cost(G)
