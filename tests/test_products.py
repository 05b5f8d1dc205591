"""Graph products vs nx under the id encoding id = u1 * stride + u2."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.products import (
    tensor_product,
    cartesian_product,
    strong_product,
    lexicographic_product,
)

PAIRS = [
    (tensor_product, nx.tensor_product),
    (cartesian_product, nx.cartesian_product),
    (strong_product, nx.strong_product),
    (lexicographic_product, nx.lexicographic_product),
]


def _encode(P, stride):
    nodes = {u1 * stride + u2 for (u1, u2) in P.nodes()}
    edges = set()
    for (u1, u2), (v1, v2) in P.edges():
        a, b = u1 * stride + u2, v1 * stride + v2
        edges.add((min(a, b), max(a, b)))
    return nodes, edges


def _ours(g_prod):
    nodes = {r["id"] for r in g_prod.vertices.collect()}
    edges = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g_prod.edges.select("src", "dst").collect()
    }
    return nodes, edges


@pytest.mark.parametrize("ours, ref", PAIRS)
def test_product_parity_undirected(spark, ours, ref):
    G = nx.path_graph(4)
    H = nx.cycle_graph(3)
    g, h = from_nx(spark, G), from_nx(spark, H)
    stride = 3  # max(H)+1
    want = _encode(ref(G, H), stride)
    assert _ours(ours(g, h)) == want


@pytest.mark.parametrize("ours, ref", [PAIRS[0], PAIRS[1]])
def test_product_parity_random(spark, ours, ref):
    G = nx.gnp_random_graph(5, 0.5, seed=1)
    H = nx.gnp_random_graph(4, 0.6, seed=2)
    g, h = from_nx(spark, G), from_nx(spark, H)
    want = _encode(ref(G, H), 4)
    assert _ours(ours(g, h)) == want
