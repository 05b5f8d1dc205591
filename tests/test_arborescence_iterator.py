"""ArborescenceIterator parity (``networkx/algorithms/tree/branchings.py``
— pure python in the reference, so weights can be checked directly)."""

import networkx as nx
import pytest

import linkgraph as lg
from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError


def _weights(it):
    out = []
    for t in it:
        out.append(round(sum(r["weight"] for r in t.edges.collect()), 6))
    return out


def test_iterator_weight_order_parity(spark):
    G = nx.DiGraph()
    edges = [
        (0, 1, 2.0), (0, 2, 1.0), (1, 2, 3.0), (2, 1, 1.5),
        (1, 3, 2.5), (2, 3, 1.0), (3, 0, 4.0),
    ]
    G.add_weighted_edges_from(edges)
    g = from_nx(spark, G)
    got = _weights(lg.ArborescenceIterator(g))
    want = [
        round(t.size(weight="weight"), 6)
        for t in nx.tree.ArborescenceIterator(G)
    ]
    assert got == want
    # maximum order too
    got_max = _weights(lg.ArborescenceIterator(g, minimum=False))
    want_max = [
        round(t.size(weight="weight"), 6)
        for t in nx.tree.ArborescenceIterator(G, minimum=False)
    ]
    assert got_max == want_max


def test_iterator_trees_are_arborescences(spark):
    G = nx.gnp_random_graph(6, 0.5, seed=3, directed=True)
    for u, v in G.edges():
        G.edges[u, v]["weight"] = (u * 7 + v * 3) % 5 + 1
    g = from_nx(spark, G)
    count = 0
    for t in lg.ArborescenceIterator(g):
        T = nx.DiGraph()
        T.add_nodes_from(range(6))
        T.add_edges_from(
            (r["src"], r["dst"]) for r in t.edges.select("src", "dst").collect()
        )
        assert nx.is_arborescence(T)
        count += 1
        if count >= 25:
            break
    nx_count = sum(1 for _ in zip(range(25), nx.tree.ArborescenceIterator(G)))
    assert count == nx_count


def test_iterator_requires_directed(spark):
    g = from_nx(spark, nx.path_graph(3))
    with pytest.raises(NetworkXError):
        lg.ArborescenceIterator(g)
