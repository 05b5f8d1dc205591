"""Triangle / clustering parity vs ``networkx/algorithms/tests/test_cluster.py``."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx, from_edgelist
from linkgraph.algos.triangles import (
    triangles,
    triangle_count,
    all_triangles,
    clustering,
    average_clustering,
    transitivity,
)


def _tri(spark, G):
    g = from_nx(spark, G)
    return {r["id"]: r["triangles"] for r in triangles(g).collect()}


def test_path_graph_no_triangles(spark):
    """test_cluster.py:43."""
    G = nx.path_graph(10)
    assert _tri(spark, G) == {n: 0 for n in G}


def test_cubical_no_triangles(spark):
    """test_cluster.py:59."""
    G = nx.cubical_graph()
    assert _tri(spark, G) == {n: 0 for n in G}


def test_k5(spark):
    """test_cluster.py:67: every node of K5 in 6 triangles; 10 distinct."""
    G = nx.complete_graph(5)
    g = from_nx(spark, G)
    assert _tri(spark, G) == {n: 6 for n in G}
    assert triangle_count(g) == 10
    assert all_triangles(g).count() == 10


def test_self_loops_ignored(spark):
    """cluster.py:61: self-loops do not change counts."""
    G = nx.complete_graph(5)
    G.add_edge(0, 0)
    assert _tri(spark, G) == {n: 6 for n in G}


def test_directed_input_raises(spark):
    """cluster.py:20 @not_implemented_for('directed'); the explicit
    undirected_view() opt-in computes the underlying undirected counts."""
    from linkgraph.exceptions import NotImplementedForDirected

    g = from_edgelist(spark, [(1, 2), (2, 3), (3, 1)], directed=True)
    with pytest.raises(NotImplementedForDirected):
        triangles(g).collect()
    got = {
        r["id"]: r["triangles"]
        for r in triangles(g.undirected_view()).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_karate_parity(spark):
    G = nx.karate_club_graph()
    assert _tri(spark, G) == nx.triangles(G)


@pytest.mark.parametrize("n,p,seed", [(150, 0.06, 42), (120, 0.1, 3)])
def test_random_parity(spark, n, p, seed):
    G = nx.fast_gnp_random_graph(n, p, seed=seed)
    assert _tri(spark, G) == nx.triangles(G)


def test_barabasi_hub_parity(spark):
    G = nx.barabasi_albert_graph(150, 4, seed=42)
    assert _tri(spark, G) == nx.triangles(G)


def test_clustering_parity(spark):
    G = nx.karate_club_graph()
    g = from_nx(spark, G)
    got = {r["id"]: r["clustering"] for r in clustering(g).collect()}
    want = nx.clustering(G)
    assert all(got[v] == pytest.approx(want[v], abs=1e-12) for v in G)


def test_average_clustering_and_transitivity(spark):
    G = nx.barabasi_albert_graph(80, 3, seed=5)
    g = from_nx(spark, G)
    assert average_clustering(g) == pytest.approx(nx.average_clustering(G), abs=1e-12)
    assert transitivity(g) == pytest.approx(nx.transitivity(G), abs=1e-12)


def test_transitivity_no_wedges(spark):
    G = nx.Graph()
    G.add_nodes_from([1, 2])
    g = from_nx(spark, G)
    assert transitivity(g) == 0.0


# --------------------------- square clustering -------------------------- #


def test_square_clustering_complete(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.triangles import square_clustering

    G = nx.complete_graph(5)
    want = nx.square_clustering(G)
    got = {
        r["id"]: r["square_clustering"]
        for r in square_clustering(from_nx(spark, G)).collect()
    }
    assert got == pytest.approx(want)


def test_square_clustering_cycle4(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.triangles import square_clustering

    G = nx.cycle_graph(4)
    want = nx.square_clustering(G)
    got = {
        r["id"]: r["square_clustering"]
        for r in square_clustering(from_nx(spark, G)).collect()
    }
    assert got == pytest.approx(want)


def test_square_clustering_gnp(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.triangles import square_clustering

    G = nx.gnp_random_graph(35, 0.15, seed=13)
    G.add_node(99)
    want = nx.square_clustering(G)
    got = {
        r["id"]: r["square_clustering"]
        for r in square_clustering(from_nx(spark, G)).collect()
    }
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-12)


def test_square_clustering_bipartite(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.triangles import square_clustering

    G = nx.bipartite.random_graph(10, 8, 0.4, seed=7)
    want = nx.square_clustering(G)
    got = {
        r["id"]: r["square_clustering"]
        for r in square_clustering(from_nx(spark, G)).collect()
    }
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-12)
