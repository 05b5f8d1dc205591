"""Named-small-graph parity: isomorphic to the reference fixtures."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph.small_graphs as sg
import linkgraph.generators as gen


def _to_nx(g):
    G = nx.DiGraph() if g.directed else nx.Graph()
    G.add_nodes_from(r["id"] for r in g.vertices.select("id").collect())
    G.add_edges_from(
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    )
    return G


CASES = [
    ("petersen_graph", nx.petersen_graph),
    ("bull_graph", nx.bull_graph),
    ("diamond_graph", nx.diamond_graph),
    ("tetrahedral_graph", nx.tetrahedral_graph),
    ("octahedral_graph", nx.octahedral_graph),
    ("cubical_graph", nx.cubical_graph),
    ("icosahedral_graph", nx.icosahedral_graph),
    ("dodecahedral_graph", nx.dodecahedral_graph),
    ("desargues_graph", nx.desargues_graph),
    ("heawood_graph", nx.heawood_graph),
    ("moebius_kantor_graph", nx.moebius_kantor_graph),
    ("pappus_graph", nx.pappus_graph),
    ("frucht_graph", nx.frucht_graph),
    ("truncated_tetrahedron_graph", nx.truncated_tetrahedron_graph),
    ("krackhardt_kite_graph", nx.krackhardt_kite_graph),
    ("sedgewick_maze_graph", nx.sedgewick_maze_graph),
]


@pytest.mark.parametrize("name,ref", CASES, ids=[c[0] for c in CASES])
def test_small_graph_isomorphic(spark, name, ref):
    g = getattr(sg, name)(spark)
    G = _to_nx(g)
    W = ref()
    assert G.number_of_nodes() == W.number_of_nodes()
    assert G.number_of_edges() == W.number_of_edges()
    assert nx.is_isomorphic(G, W)


def test_LCF_matches_reference_builder(spark):
    g = sg.LCF_graph(spark, 14, [5, -5], 7)
    G = _to_nx(g)
    W = nx.LCF_graph(14, [5, -5], 7)
    assert sorted(map(tuple, map(sorted, G.edges()))) == sorted(
        map(tuple, map(sorted, W.edges()))
    )


def test_paley_graph_parity(spark):
    for p in (13, 17):
        g = sg.paley_graph(spark, p)
        G = _to_nx(g)
        W = nx.paley_graph(p)
        assert sorted(G.edges()) == sorted(W.edges())


def test_generalized_petersen_structure(spark):
    g = gen.generalized_petersen_graph(spark, 8, 3)
    G = _to_nx(g)
    assert nx.is_isomorphic(G, nx.moebius_kantor_graph())


def test_hypercube_and_grid(spark):
    g = gen.hypercube_graph(spark, 4)
    G = _to_nx(g)
    assert nx.is_isomorphic(G, nx.hypercube_graph(4))
    g2 = gen.grid_graph(spark, [2, 3, 4])
    G2 = _to_nx(g2)
    assert nx.is_isomorphic(G2, nx.grid_graph([4, 3, 2]))


def test_complete_bipartite_and_tadpole(spark):
    g = gen.complete_bipartite_graph(spark, 3, 4)
    G = _to_nx(g)
    assert nx.is_isomorphic(G, nx.complete_bipartite_graph(3, 4))
    g2 = gen.tadpole_graph(spark, 5, 3)
    G2 = _to_nx(g2)
    assert nx.is_isomorphic(G2, nx.tadpole_graph(5, 3))


def test_kneser(spark):
    g = gen.kneser_graph(spark, 5, 2)
    G = _to_nx(g)
    assert nx.is_isomorphic(G, nx.kneser_graph(5, 2))  # == Petersen
