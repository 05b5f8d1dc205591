"""Tests for the Mehlhorn steiner_tree approximation vs the reference
(networkx/algorithms/approximation/steinertree.py)."""

import networkx as nx
import pytest

from linkgraph.exceptions import NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.steiner import steiner_tree


def _df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id bigint")


def _collect(spark, G, terminals):
    rows = steiner_tree(from_nx(spark, G), _df(spark, terminals)).collect()
    edges = {(r["src"], r["dst"]) for r in rows}
    # every output weight must be the graph's true edge weight
    for r in rows:
        assert r["weight"] == pytest.approx(
            G[r["src"]][r["dst"]].get("weight", 1.0)
        ), (r["src"], r["dst"])
    weight = sum(r["weight"] for r in rows)
    return edges, weight


def _is_tree_spanning(G, edges, terminals):
    T = nx.Graph()
    T.add_edges_from(edges)
    if not edges:
        return len(terminals) <= 1
    return (
        nx.is_tree(T)
        and set(terminals) <= set(T.nodes)
        and all(G.has_edge(u, v) for u, v in edges)
    )


def test_path_endpoints(spark):
    G = nx.path_graph(7)
    edges, weight = _collect(spark, G, [0, 6])
    assert edges == {(i, i + 1) for i in range(6)}
    assert weight == pytest.approx(6.0)


def test_star_leaves(spark):
    G = nx.star_graph(5)  # center 0
    edges, weight = _collect(spark, G, [1, 2, 3])
    assert edges == {(0, 1), (0, 2), (0, 3)}
    assert weight == pytest.approx(3.0)


@pytest.mark.parametrize("seed", [5, 9])
def test_random_weighted_validity_and_bound(spark, seed):
    import random

    rng = random.Random(seed)
    G = nx.gnp_random_graph(24, 0.2, seed=seed)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    for u, v in G.edges():
        G[u][v]["weight"] = round(rng.uniform(0.5, 4.0), 3)
    nodes = sorted(G.nodes)
    terminals = nodes[:: max(1, len(nodes) // 6)][:6]
    edges, weight = _collect(spark, G, terminals)
    assert _is_tree_spanning(G, edges, terminals)
    ref = nx.approximation.steiner_tree(G, terminals, method="mehlhorn")
    ref_w = ref.size(weight="weight")
    # both are 2-approximations of the same optimum
    assert weight <= 2.0 * ref_w + 1e-9
    assert weight >= ref_w / 2.0 - 1e-9


def test_terminal_pair_is_shortest_path_weight(spark):
    G = nx.cycle_graph(8)
    for u, v in G.edges():
        G[u][v]["weight"] = 1.0
    G[0][7]["weight"] = 10.0  # force the long way to be avoided
    edges, weight = _collect(spark, G, [0, 5])
    assert weight == pytest.approx(
        nx.shortest_path_length(G, 0, 5, weight="weight")
    )


def test_directed_raises(spark):
    with pytest.raises(NotImplementedForDirected):
        steiner_tree(from_nx(spark, nx.DiGraph([(0, 1)])), _df(spark, [0, 1]))
