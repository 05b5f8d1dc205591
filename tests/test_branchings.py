"""Parity tests for minimum/maximum spanning arborescence vs the
reference's Edmonds implementation (weight parity — the optimum may be
non-unique — plus structural validity of our tree)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.branchings import (
    minimum_spanning_arborescence,
    maximum_spanning_arborescence,
)
from linkgraph.exceptions import NetworkXError


def _validate(G, rows, root=None):
    arcs = [(r["src"], r["dst"], r["weight"]) for r in rows]
    assert len(arcs) == G.number_of_nodes() - 1
    heads = [v for _, v, _ in arcs]
    assert len(set(heads)) == len(heads)  # in-degree 1
    for u, v, w in arcs:
        assert G.has_edge(u, v) and G[u][v]["weight"] == pytest.approx(w)
    T = nx.DiGraph((u, v) for u, v, _ in arcs)
    T.add_nodes_from(G)
    assert nx.is_arborescence(T)
    if root is not None:
        assert T.in_degree(root) == 0
    return sum(w for _, _, w in arcs)


def _seeded_digraph(n, p, seed):
    G = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    for i, (u, v) in enumerate(G.edges):
        G[u][v]["weight"] = float(1 + (i * 13 + seed) % 17)
    return G


def _ensure_rooted(G, root=0):
    # guarantee a spanning arborescence from `root` without parallel arcs
    for v in list(G.nodes):
        if v != root and not G.has_edge(root, v):
            G.add_edge(root, v, weight=50.0)
    return G


def test_cycle_contraction_minimal(spark):
    # classic example: picking all min in-arcs creates a 2-cycle
    G = nx.DiGraph()
    G.add_weighted_edges_from(
        [(0, 1, 10.0), (1, 2, 1.0), (2, 1, 1.0), (0, 2, 10.0), (2, 3, 2.0)]
    )
    rows = minimum_spanning_arborescence(from_nx(spark, G), root=0).collect()
    got = _validate(G, rows, root=0)
    want = nx.minimum_spanning_arborescence(G).size(weight="weight")
    assert got == pytest.approx(want)


def test_weight_parity_random(spark):
    for seed in (3, 8):
        G = _ensure_rooted(_seeded_digraph(18, 0.15, seed))
        # rooted comparison: strip in-arcs of the root so the reference
        # (which optimizes over all roots) is forced to the same root
        G.remove_edges_from(list(G.in_edges(0)))
        g = from_nx(spark, G)
        rows = minimum_spanning_arborescence(g, root=0).collect()
        got = _validate(G, rows, root=0)
        want = nx.minimum_spanning_arborescence(G).size(weight="weight")
        assert got == pytest.approx(want)


def test_rootless_matches_nx(spark):
    G = _ensure_rooted(_seeded_digraph(15, 0.2, 5))
    rows = minimum_spanning_arborescence(from_nx(spark, G)).collect()
    got = _validate(G, rows)
    want = nx.minimum_spanning_arborescence(G).size(weight="weight")
    assert got == pytest.approx(want)


def test_maximum_variant(spark):
    G = _ensure_rooted(_seeded_digraph(14, 0.2, 7))
    rows = maximum_spanning_arborescence(from_nx(spark, G)).collect()
    got = _validate(G, rows)
    want = nx.maximum_spanning_arborescence(G).size(weight="weight")
    assert got == pytest.approx(want)


def test_nested_cycles(spark):
    # two cycles that contract in sequence
    G = nx.DiGraph()
    G.add_weighted_edges_from(
        [
            (1, 2, 1.0), (2, 1, 1.0),          # inner cycle
            (2, 3, 1.0), (3, 1, 0.5),          # wraps into a bigger cycle
            (0, 1, 9.0), (0, 3, 8.0), (3, 4, 1.0),
        ]
    )
    rows = minimum_spanning_arborescence(from_nx(spark, G), root=0).collect()
    got = _validate(G, rows, root=0)
    want = nx.minimum_spanning_arborescence(G).size(weight="weight")
    assert got == pytest.approx(want)


def test_no_arborescence_raises(spark):
    G = nx.DiGraph([(0, 1), (2, 3)])
    nx.set_edge_attributes(G, 1.0, "weight")
    with pytest.raises(NetworkXError):
        minimum_spanning_arborescence(from_nx(spark, G))


def test_unreachable_from_root_raises(spark):
    G = nx.DiGraph([(0, 1), (2, 1)])
    nx.set_edge_attributes(G, 1.0, "weight")
    with pytest.raises(NetworkXError):
        minimum_spanning_arborescence(from_nx(spark, G), root=0)


def test_path_is_its_own_arborescence(spark):
    G = nx.path_graph(6, create_using=nx.DiGraph)
    nx.set_edge_attributes(G, 2.0, "weight")
    rows = minimum_spanning_arborescence(from_nx(spark, G), root=0).collect()
    assert _validate(G, rows, root=0) == pytest.approx(10.0)
