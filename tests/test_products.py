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


def _nx_from(g, n_h):
    """Decode an encoded product graph back to tuple-labeled nx for parity."""
    import networkx as nx

    G = nx.Graph()
    for r in g.vertices.collect():
        G.add_node((r["id"] // n_h, r["id"] % n_h))
    for r in g.edges.collect():
        G.add_edge(
            (r["src"] // n_h, r["src"] % n_h), (r["dst"] // n_h, r["dst"] % n_h)
        )
    return G


def test_rooted_product_matches_nx(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.products import rooted_product

    G, H = nx.path_graph(4), nx.cycle_graph(3)
    got = _nx_from(
        rooted_product(from_nx(spark, G), from_nx(spark, H), 0), 3
    )
    want = nx.rooted_product(G, H, 0)
    assert set(got.nodes()) == set(want.nodes())
    assert {frozenset(e) for e in got.edges()} == {
        frozenset(e) for e in want.edges()
    }


def test_corona_product_matches_nx(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.products import corona_product

    G, H = nx.cycle_graph(4), nx.path_graph(2)
    g = corona_product(from_nx(spark, G), from_nx(spark, H))
    want = nx.corona_product(G, H)
    assert g.number_of_nodes() == want.number_of_nodes()
    assert g.number_of_edges() == want.number_of_edges()
    # structure check via degree multiset (encoding differs from nx labels)
    from linkgraph.algos.degrees import degrees

    got_degs = sorted(r["degree"] for r in degrees(g).collect())
    want_degs = sorted(d for _, d in want.degree())
    assert got_degs == want_degs


def test_modular_product_matches_nx(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.products import modular_product

    G, H = nx.path_graph(3), nx.path_graph(3)
    got = _nx_from(modular_product(from_nx(spark, G), from_nx(spark, H)), 3)
    want = nx.modular_product(G, H)
    assert {frozenset(e) for e in got.edges()} == {
        frozenset(e) for e in want.edges()
    }


def test_power_matches_nx(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.products import power

    G = nx.path_graph(8)
    for k in (1, 2, 3):
        g = power(from_nx(spark, G), k)
        want = nx.power(G, k)
        got = {(r["src"], r["dst"]) for r in g.edges.collect()}
        assert got == {(min(u, v), max(u, v)) for u, v in want.edges()}, k


def test_power_validation(spark):
    import pytest as _pytest
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.products import power

    g = from_nx(spark, nx.path_graph(3))
    with _pytest.raises(ValueError):
        power(g, 0)


def test_power_parity(spark):
    """nx.power twin (product.py): edges join nodes at distance <= k."""
    import networkx as nx
    import pytest
    from linkgraph.graph import from_nx
    from linkgraph.algos.products import power

    def edge_set(sg):
        return {
            (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
            for r in sg.edges.collect()
        }

    for G in (nx.path_graph(8), nx.gnp_random_graph(10, 0.25, seed=3)):
        for k in (1, 2, 3):
            assert edge_set(power(from_nx(spark, G), k)) == {
                (min(u, v), max(u, v)) for u, v in nx.power(G, k).edges()
            }
    with pytest.raises(ValueError):
        power(from_nx(spark, nx.path_graph(3)), 0)


def test_modular_product_parity(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.products import modular_product

    G1, G2 = nx.path_graph(4), nx.cycle_graph(3)
    sg = modular_product(from_nx(spark, G1), from_nx(spark, G2))
    stride = 3
    want = {
        tuple(sorted((u[0] * stride + u[1], v[0] * stride + v[1])))
        for u, v in nx.modular_product(G1, G2).edges()
    }
    got = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in sg.edges.collect()
    }
    assert got == want
