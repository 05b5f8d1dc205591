"""Parity tests for the round-4 classic/community/random generator pack vs
the reference (generators/classic.py, community.py, mycielski.py,
random_graphs.py)."""

import networkx as nx
import pytest

from linkgraph import generators as gen


def _edges(g):
    return {
        tuple(sorted((r["src"], r["dst"])))
        for r in g.edges.select("src", "dst").collect()
    }


def _nx_edges(G):
    return {tuple(sorted(e)) for e in G.edges()}


@pytest.mark.parametrize("n", [3, 4, 7])
def test_wheel(spark, n):
    assert _edges(gen.wheel_graph(spark, n)) == _nx_edges(nx.wheel_graph(n))


@pytest.mark.parametrize("n", [1, 2, 5])
def test_ladder(spark, n):
    assert _edges(gen.ladder_graph(spark, n)) == _nx_edges(nx.ladder_graph(n))


@pytest.mark.parametrize("n", [3, 6])
def test_circular_ladder(spark, n):
    assert _edges(gen.circular_ladder_graph(spark, n)) == _nx_edges(
        nx.circular_ladder_graph(n)
    )


@pytest.mark.parametrize("m1,m2", [(3, 0), (4, 2), (2, 5)])
def test_barbell(spark, m1, m2):
    assert _edges(gen.barbell_graph(spark, m1, m2)) == _nx_edges(
        nx.barbell_graph(m1, m2)
    )


@pytest.mark.parametrize("r,n", [(2, 10), (3, 14), (1, 5)])
def test_full_rary_tree(spark, r, n):
    assert _edges(gen.full_rary_tree(spark, r, n)) == _nx_edges(
        nx.full_rary_tree(r, n)
    )


@pytest.mark.parametrize("r,h", [(2, 3), (3, 2)])
def test_balanced_tree(spark, r, h):
    assert _edges(gen.balanced_tree(spark, r, h)) == _nx_edges(
        nx.balanced_tree(r, h)
    )


@pytest.mark.parametrize("n", [0, 1, 2, 3, 4])
def test_binomial_tree(spark, n):
    got = _edges(gen.binomial_tree(spark, n))
    want = _nx_edges(nx.binomial_tree(n))
    assert got == want


@pytest.mark.parametrize("sizes", [(2, 3), (1, 2, 3), (3, 3, 3)])
def test_complete_multipartite(spark, sizes):
    assert _edges(gen.complete_multipartite_graph(spark, *sizes)) == _nx_edges(
        nx.complete_multipartite_graph(*sizes)
    )


@pytest.mark.parametrize("n,r", [(6, 2), (13, 4)])
def test_turan(spark, n, r):
    assert _edges(gen.turan_graph(spark, n, r)) == _nx_edges(nx.turan_graph(n, r))


@pytest.mark.parametrize("n,offs", [(8, [1, 2]), (10, [1, 5])])
def test_circulant(spark, n, offs):
    assert _edges(gen.circulant_graph(spark, n, offs)) == _nx_edges(
        nx.circulant_graph(n, offs)
    )


@pytest.mark.parametrize("l,k", [(3, 4), (2, 2)])
def test_caveman_family(spark, l, k):
    assert _edges(gen.caveman_graph(spark, l, k)) == _nx_edges(
        nx.caveman_graph(l, k)
    )
    assert _edges(gen.connected_caveman_graph(spark, l, k)) == _nx_edges(
        nx.connected_caveman_graph(l, k)
    )


@pytest.mark.parametrize("num,size", [(3, 4), (2, 3)])
def test_ring_of_cliques(spark, num, size):
    assert _edges(gen.ring_of_cliques(spark, num, size)) == _nx_edges(
        nx.ring_of_cliques(num, size)
    )


@pytest.mark.parametrize("n,k", [(3, 4), (4, 3)])
def test_windmill(spark, n, k):
    assert _edges(gen.windmill_graph(spark, n, k)) == _nx_edges(
        nx.windmill_graph(n, k)
    )


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_mycielski_graph(spark, n):
    got = gen.mycielski_graph(spark, n)
    want = nx.mycielski_graph(n)
    assert got.number_of_nodes() == want.number_of_nodes()
    assert got.number_of_edges() == want.number_of_edges()
    assert _edges(got) == _nx_edges(want)


def test_mycielskian_structure(spark):
    # mycielskian of C5 is the Grötzsch graph: 11 nodes, 20 edges,
    # triangle-free, chromatic number 4
    g = gen.mycielskian(gen.cycle_graph(spark, 5))
    assert g.number_of_nodes() == 11
    assert g.number_of_edges() == 20
    from linkgraph.algos.triangles import triangle_count

    assert triangle_count(g) == 0


def test_expected_degree_graph(spark):
    w = [6, 5, 5, 4, 4, 3, 3, 2, 2, 1]
    g = gen.expected_degree_graph(spark, w, seed=7, selfloops=False)
    # deterministic per seed
    g2 = gen.expected_degree_graph(spark, w, seed=7, selfloops=False)
    assert _edges(g) == _edges(g2)
    # no edge can exist between zero-weight nodes; node count fixed
    assert g.number_of_nodes() == len(w)
    # hub (highest w) should attract more edges than the tail on average
    degs = {r["id"]: r["degree"] for r in __import__(
        "linkgraph.algos.degrees", fromlist=["degrees"]
    ).degrees(g).collect()}
    assert degs.get(0, 0) >= degs.get(9, 0)


def test_stochastic_block_model(spark):
    sizes = [10, 10]
    g = gen.stochastic_block_model(spark, sizes, [[0.9, 0.05], [0.05, 0.9]], seed=3)
    blocks = {r["id"]: r["block"] for r in g.vertices.collect()}
    intra = inter = 0
    for u, v in _edges(g):
        if blocks[u] == blocks[v]:
            intra += 1
        else:
            inter += 1
    assert intra > inter  # assortative by construction
    with pytest.raises(ValueError):
        gen.stochastic_block_model(spark, [3, 3], [[0.5], [0.5]])
    with pytest.raises(ValueError):
        gen.stochastic_block_model(spark, [3], [[1.5]])


def test_planted_partition(spark):
    g = gen.planted_partition_graph(spark, 3, 6, 0.8, 0.02, seed=11)
    assert g.number_of_nodes() == 18


def test_gnm(spark):
    g = gen.gnm_random_graph(spark, 12, 20, seed=5)
    assert g.number_of_nodes() == 12
    assert g.number_of_edges() == 20
    d = gen.gnm_random_graph(spark, 12, 20, seed=5, directed=True)
    assert d.number_of_edges() == 20
