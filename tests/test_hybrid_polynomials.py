"""kl-connectivity, graph polynomials, inverse line graph
(``networkx/algorithms/{hybrid,polynomials}.py``,
``networkx/generators/line.py``)."""

import networkx as nx
import pytest
import sympy

import linkgraph as lg
from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError

FIXTURES = [
    nx.cycle_graph(6),
    nx.complete_graph(5),
    nx.path_graph(5),
    nx.petersen_graph(),
    nx.gnp_random_graph(9, 0.4, seed=3),
]


@pytest.mark.parametrize("G", FIXTURES)
@pytest.mark.parametrize("kl", [(2, 2), (3, 2), (2, 3)])
def test_is_kl_connected_parity(spark, G, kl):
    k, l = kl
    g = from_nx(spark, G)
    assert lg.is_kl_connected(g, k, l) == nx.is_kl_connected(G, k, l)


@pytest.mark.parametrize("G", FIXTURES[:3])
def test_kl_connected_subgraph_parity(spark, G):
    g = from_nx(spark, G)
    got, ok = lg.kl_connected_subgraph(g, 2, 2, same_as_graph=True)
    H, ok_nx = nx.kl_connected_subgraph(G, 2, 2, same_as_graph=True)
    assert ok == ok_nx
    got_edges = {(r["src"], r["dst"]) for r in got.edges.select("src", "dst").collect()}
    want_edges = {(min(u, v), max(u, v)) for u, v in H.edges()}
    assert got_edges == want_edges


@pytest.mark.parametrize("G", [
    nx.cycle_graph(4),
    nx.complete_graph(4),
    nx.path_graph(4),
    nx.petersen_graph(),
])
def test_tutte_polynomial_parity(spark, G):
    g = from_nx(spark, G)
    got = lg.tutte_polynomial(g)
    want = nx.tutte_polynomial(G)
    assert sympy.simplify(got - want) == 0


@pytest.mark.parametrize("G", [
    nx.cycle_graph(4),
    nx.complete_graph(4),
    nx.path_graph(5),
    nx.gnp_random_graph(7, 0.4, seed=5),
])
def test_chromatic_polynomial_parity(spark, G):
    g = from_nx(spark, G)
    got = lg.chromatic_polynomial(g)
    want = nx.chromatic_polynomial(G)
    assert sympy.expand(got - want) == 0


@pytest.mark.parametrize("H", [
    nx.path_graph(5),
    nx.cycle_graph(6),
    nx.star_graph(4),
    nx.lollipop_graph(3, 2),
])
def test_inverse_line_graph_roundtrip(spark, H):
    G = nx.line_graph(H)
    G = nx.convert_node_labels_to_integers(G, ordering="sorted")
    g = from_nx(spark, G)
    root = lg.inverse_line_graph(g)
    # rebuild as nx and check line_graph(root) is isomorphic to G
    R = nx.Graph()
    R.add_nodes_from(r["id"] for r in root.vertices.select("id").collect())
    R.add_edges_from(
        (r["src"], r["dst"]) for r in root.edges.select("src", "dst").collect()
    )
    assert nx.is_isomorphic(nx.line_graph(R), G)


def test_inverse_line_graph_not_line_graph(spark):
    g = from_nx(spark, nx.star_graph(3))  # K1,3 is the forbidden subgraph
    with pytest.raises(NetworkXError):
        lg.inverse_line_graph(g)
