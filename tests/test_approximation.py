"""Approximation-module parity/invariants vs the reference."""

from __future__ import annotations

import random

import networkx as nx
import pytest

import linkgraph
from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph


def _graph(spark, G, directed=False, weighted=False):
    if weighted:
        rows = [
            (int(u), int(v), float(d["weight"])) for u, v, d in G.edges(data=True)
        ]
        schema = "src long, dst long, weight double"
    else:
        rows = [(int(u), int(v)) for u, v in G.edges()]
        schema = "src long, dst long"
    e = spark.createDataFrame(rows, schema)
    return SparkGraph(
        e,
        vertices=spark.createDataFrame([(int(n),) for n in G.nodes()], "id long"),
        directed=directed,
    )


def test_diameter_2sweep_exact_on_trees_and_cycles(spark):
    for G in [
        nx.path_graph(9),                 # diameter 8, 2-sweep exact on trees
        nx.random_labeled_tree(20, seed=3),
        nx.cycle_graph(10),               # diameter 5
        nx.star_graph(6),                 # diameter 2
    ]:
        got = linkgraph.diameter_2sweep(_graph(spark, G))
        true = nx.diameter(G)
        assert got == true, G  # 2-sweep is exact on these families


def test_diameter_2sweep_is_valid_lower_bound(spark):
    G = nx.gnp_random_graph(40, 0.12, seed=7)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    G = nx.convert_node_labels_to_integers(G)
    got = linkgraph.diameter_2sweep(_graph(spark, G))
    true = nx.diameter(G)
    assert true / 2 <= got <= true  # the reference's own guarantee


def test_diameter_2sweep_directed_and_errors(spark):
    D = nx.cycle_graph(8, create_using=nx.DiGraph)
    assert linkgraph.diameter_2sweep(_graph(spark, D, directed=True)) == 7
    with pytest.raises(NetworkXError):
        linkgraph.diameter_2sweep(
            _graph(spark, nx.union(nx.path_graph(2), nx.path_graph([5, 6])))
        )
    with pytest.raises(NetworkXError):
        linkgraph.diameter_2sweep(
            _graph(spark, nx.path_graph(3, create_using=nx.DiGraph), directed=True)
        )


def test_randomized_partitioning_invariants(spark):
    G = nx.gnp_random_graph(60, 0.2, seed=9)
    g = _graph(spark, G)
    cut, sides = linkgraph.randomized_partitioning(g, seed=5)
    d = {r["id"]: r["side"] for r in sides.collect()}
    assert set(d) == set(G.nodes()) and set(d.values()) <= {0, 1}
    want = sum(1.0 for u, v in G.edges() if d[u] != d[v])
    assert cut == pytest.approx(want)
    # expected cut is m/2; a seeded draw should be in a generous band
    assert 0.3 * G.number_of_edges() < cut < 0.7 * G.number_of_edges()


def test_one_exchange_local_optimum(spark):
    rng = random.Random(2)
    G = nx.gnp_random_graph(25, 0.3, seed=2)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 9))
    g = _graph(spark, G, weighted=True)
    cut, sides = linkgraph.one_exchange(g)
    d = {r["id"]: r["side"] for r in sides.collect()}
    want = sum(dd["weight"] for u, v, dd in G.edges(data=True) if d[u] != d[v])
    assert cut == pytest.approx(want)
    # defining invariant: no single flip improves the cut
    for u in G.nodes():
        gain = sum(
            dd["weight"] * (1 if d[u] == d[v] else -1)
            for _, v, dd in G.edges(u, data=True)
        )
        assert gain <= 1e-9, u
    # at least as good as the reference's randomized start local optimum class:
    ref_cut, _ = nx.algorithms.approximation.one_exchange(G, seed=2)
    assert cut >= 0.8 * ref_cut


def test_greedy_tsp_matches_nx(spark):
    rng = random.Random(6)
    n = 9
    G = nx.complete_graph(n)
    used = set()
    for u, v in G.edges():
        w = rng.randint(1, 500)
        while w in used:  # distinct weights -> deterministic greedy
            w = rng.randint(1, 500)
        used.add(w)
        G[u][v]["weight"] = float(w)
    g = _graph(spark, G, weighted=True)
    path = [r["id"] for r in linkgraph.greedy_tsp(g).orderBy("order").collect()]
    want = nx.algorithms.approximation.greedy_tsp(G, source=0)
    assert path == want
    with pytest.raises(NetworkXError):
        linkgraph.greedy_tsp(_graph(spark, nx.path_graph(4)))  # incomplete


def test_christofides_guarantee_and_validity(spark):
    import itertools

    rng = random.Random(13)
    for n, seed in [(7, 1), (8, 2), (2, 3), (3, 4)]:
        # metric instance: random points on a line -> triangle inequality
        pts = sorted(rng.uniform(0, 100) for _ in range(n))
        G = nx.complete_graph(n)
        for u, v in G.edges():
            G[u][v]["weight"] = abs(pts[u] - pts[v]) + 1.0
        g = _graph(spark, G, weighted=True)
        tour = [r["id"] for r in linkgraph.christofides(g).orderBy("order").collect()]
        assert tour[0] == tour[-1] and sorted(tour[:-1]) == sorted(G.nodes())
        cost = sum(G[u][v]["weight"] for u, v in zip(tour, tour[1:]))
        if n <= 8:
            opt = min(
                sum(
                    G[a][b]["weight"]
                    for a, b in zip((0,) + p, p + (0,))
                )
                for p in itertools.permutations(range(1, n))
            ) if n > 2 else 2 * G[0][1]["weight"]
            assert cost <= 1.5 * opt + 1e-9, (n, cost, opt)
        # same contract class as the reference implementation
        ref = nx.algorithms.approximation.christofides(G)
        ref_cost = sum(G[u][v]["weight"] for u, v in zip(ref, ref[1:]))
        assert cost <= 1.5001 * ref_cost


def test_christofides_incomplete_raises(spark):
    G = nx.path_graph(4)
    for u, v in G.edges():
        G[u][v]["weight"] = 1.0
    with pytest.raises(NetworkXError):
        linkgraph.christofides(_graph(spark, G, weighted=True))


def _check_decomposition(G, width, bags_df, tree_df):
    bags = {}
    for r in bags_df.collect():
        bags.setdefault(r["bag"], set()).add(r["id"])
    tree = [(r["src"], r["dst"]) for r in tree_df.collect()]
    # width matches the bags
    assert width == max((len(b) for b in bags.values()), default=1) - 1
    # every node and edge is covered by some bag
    covered = set().union(*bags.values()) if bags else set()
    assert covered == set(G.nodes())
    for u, v in G.edges():
        assert any(u in b and v in b for b in bags.values()), (u, v)
    # running intersection: bags containing each node form a subtree
    T = nx.Graph(tree)
    T.add_nodes_from(bags)
    if bags:
        assert nx.is_tree(T) or nx.is_forest(T)
    for v in G.nodes():
        holding = [k for k, b in bags.items() if v in b]
        assert nx.is_connected(T.subgraph(holding)), v


def test_treewidth_closed_forms(spark):
    for G, want in [
        (nx.random_labeled_tree(15, seed=4), 1),
        (nx.cycle_graph(9), 2),
        (nx.complete_graph(6), 5),
        (nx.path_graph(2), 1),
    ]:
        g = _graph(spark, G)
        width, bags, tree = linkgraph.treewidth_min_degree(g)
        assert width == want, G
        _check_decomposition(G, width, bags, tree)


def test_treewidth_random_validity_and_bound(spark):
    G = nx.gnp_random_graph(25, 0.2, seed=11)
    g = _graph(spark, G)
    width, bags, tree = linkgraph.treewidth_min_degree(g)
    _check_decomposition(G, width, bags, tree)
    ref_width, _ = nx.algorithms.approximation.treewidth_min_degree(G)
    assert width <= ref_width + 2  # same heuristic, tie-breaks differ
