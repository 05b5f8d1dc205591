"""Strong/distance regularity, chordal cliques, connectivity tail."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import SparkGraph
from linkgraph.algos.regularity import (
    global_parameters,
    hyper_wiener_index,
    intersection_array,
    is_distance_regular,
    is_strongly_regular,
)
from linkgraph.algos.chordal import (
    chordal_graph_cliques,
    chordal_graph_treewidth,
)
from linkgraph.algos.flow import average_node_connectivity, is_k_edge_connected
from linkgraph.algos.resistance import effective_graph_resistance
from linkgraph.algos.dfs import dfs_predecessors, dfs_successors
from linkgraph.exceptions import NetworkXError


def _to_spark(spark, G):
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in G.edges()], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(n,) for n in G.nodes()], "id long")
    return SparkGraph(e, v, directed=G.is_directed(), coalesce_edges=False)


@pytest.mark.parametrize(
    "maker,want",
    [
        (nx.petersen_graph, True),
        (nx.cycle_graph, False),  # C7 below
        (lambda: nx.complete_bipartite_graph(3, 3), True),
        (nx.path_graph, False),
    ],
)
def test_is_strongly_regular(spark, maker, want):
    G = maker(7) if maker in (nx.cycle_graph, nx.path_graph) else maker()
    g = _to_spark(spark, G)
    assert is_strongly_regular(g) is nx.is_strongly_regular(G) is want


def test_intersection_array_parity(spark):
    for maker in (nx.petersen_graph, nx.icosahedral_graph, lambda: nx.cycle_graph(6)):
        G = maker()
        g = _to_spark(spark, G)
        want = nx.intersection_array(G)
        got = intersection_array(g)
        assert list(got[0]) == list(want[0])
        assert list(got[1]) == list(want[1])
        assert is_distance_regular(g) is True
        assert global_parameters(*got) == list(nx.global_parameters(*want))


def test_not_distance_regular(spark):
    G = nx.path_graph(5)
    g = _to_spark(spark, G)
    assert is_distance_regular(g) is False
    with pytest.raises(NetworkXError):
        intersection_array(g)


def test_hyper_wiener(spark):
    G = nx.petersen_graph()
    g = _to_spark(spark, G)
    want = sum(
        (d + d * d)
        for s, row in dict(nx.all_pairs_shortest_path_length(G)).items()
        for t, d in row.items()
        if s < t
    ) / 2
    assert hyper_wiener_index(g) == pytest.approx(want)


def test_chordal_cliques_parity(spark):
    G = nx.Graph(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5), (4, 6), (5, 6)]
    )
    g = _to_spark(spark, G)
    assert nx.is_chordal(G)
    want = sorted(
        sorted(c) for c in nx.chordal_graph_cliques(G)
    )
    got = sorted(sorted(c) for c in chordal_graph_cliques(g))
    assert got == want
    assert chordal_graph_treewidth(g) == nx.chordal_graph_treewidth(G)


def test_chordal_cliques_rejects_nonchordal(spark):
    G = nx.cycle_graph(5)
    g = _to_spark(spark, G)
    with pytest.raises(NetworkXError):
        chordal_graph_cliques(g)


def test_is_k_edge_connected(spark):
    G = nx.cycle_graph(6)
    g = _to_spark(spark, G)
    assert is_k_edge_connected(g, 1) is True
    assert is_k_edge_connected(g, 2) is True
    assert is_k_edge_connected(g, 3) is False
    P = nx.path_graph(4)
    p = _to_spark(spark, P)
    assert is_k_edge_connected(p, 2) is False


def test_average_node_connectivity_parity(spark):
    # small fixture: 15 pairs = 15 distributed flow runs
    G = nx.octahedral_graph()
    g = _to_spark(spark, G)
    assert average_node_connectivity(g) == pytest.approx(
        nx.average_node_connectivity(G)
    )


def test_effective_graph_resistance_parity(spark):
    G = nx.cycle_graph(5)
    g = _to_spark(spark, G)
    # closed form for a cycle: R(i,j) = d(n-d)/n summed over pairs
    want = sum(
        (abs(i - j) if abs(i - j) <= 2 else 5 - abs(i - j)) * (5 - (abs(i - j) if abs(i - j) <= 2 else 5 - abs(i - j))) / 5
        for i in range(5)
        for j in range(i + 1, 5)
    )
    got = effective_graph_resistance(g)
    assert got == pytest.approx(want, rel=1e-6)


def test_dfs_pred_succ_parity(spark):
    G = nx.gnp_random_graph(12, 0.25, seed=6)
    g = _to_spark(spark, G)
    want_p = nx.dfs_predecessors(G, source=0, sort_neighbors=sorted)
    got_p = {
        r["id"]: r["pred"] for r in dfs_predecessors(g, source=0).collect()
    }
    assert got_p == want_p
    want_s = {
        k: sorted(v)
        for k, v in nx.dfs_successors(G, source=0, sort_neighbors=sorted).items()
    }
    got_s = {
        r["id"]: sorted(r["successors"])
        for r in dfs_successors(g, source=0).collect()
    }
    assert got_s == want_s


def test_find_induced_nodes_parity(spark):
    from linkgraph.algos.chordal import find_induced_nodes

    G = nx.Graph(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5), (4, 6), (5, 6)]
    )
    g = _to_spark(spark, G)
    assert sorted(find_induced_nodes(g, 1, 6)) == sorted(
        nx.find_induced_nodes(G, 1, 6)
    )
    P = nx.path_graph(8)
    p = _to_spark(spark, P)
    assert sorted(find_induced_nodes(p, 0, 7)) == sorted(
        nx.find_induced_nodes(P, 0, 7)
    )
