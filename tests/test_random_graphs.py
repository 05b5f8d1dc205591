"""Random-generator tail: structural/distributional parity vs reference."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph.random_graphs as rg
from linkgraph.exceptions import NetworkXError


def _to_nx(g):
    G = nx.DiGraph() if g.directed else nx.Graph()
    G.add_nodes_from(r["id"] for r in g.vertices.select("id").collect())
    G.add_edges_from(
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    )
    return G


def test_newman_watts_never_removes_lattice(spark):
    g = rg.newman_watts_strogatz_graph(spark, 40, 4, 0.3, seed=3)
    G = _to_nx(g)
    for i in range(40):
        for j in (1, 2):
            assert G.has_edge(i, (i + j) % 40)
    assert G.number_of_edges() >= 80  # lattice + shortcuts


def test_connected_watts_strogatz(spark):
    g = rg.connected_watts_strogatz_graph(spark, 30, 4, 0.2, seed=5)
    assert nx.is_connected(_to_nx(g))


def test_random_geometric_graph_exact_by_position(spark):
    g = rg.random_geometric_graph(spark, 60, 0.25, seed=7)
    pos = {
        r["id"]: (r["x0"], r["x1"])
        for r in g.vertices.select("id", "x0", "x1").collect()
    }
    got = {
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    }
    want = set()
    ids = sorted(pos)
    for i in ids:
        for j in ids:
            if i < j:
                d2 = (pos[i][0] - pos[j][0]) ** 2 + (pos[i][1] - pos[j][1]) ** 2
                if d2 <= 0.25**2:
                    want.add((i, j))
    assert got == want  # the grid-bucket join finds EXACTLY the close pairs


def test_geometric_edges_radius_sweep(spark):
    g = rg.random_geometric_graph(spark, 40, 0.2, seed=9)
    e_small = rg.geometric_edges(g, 0.1).count()
    e_big = rg.geometric_edges(g, 0.4).count()
    assert e_small <= g.number_of_edges() <= e_big


def test_waxman_graph_shape(spark):
    g = rg.waxman_graph(spark, 50, 0.6, 0.3, seed=11)
    G = _to_nx(g)
    assert G.number_of_nodes() == 50
    assert G.number_of_edges() > 0
    # same seed reproduces exactly
    g2 = rg.waxman_graph(spark, 50, 0.6, 0.3, seed=11)
    assert sorted(_to_nx(g2).edges()) == sorted(G.edges())


def test_margulis_gabber_galil_multiset_parity(spark):
    from collections import Counter

    n = 5
    g = rg.margulis_gabber_galil_graph(spark, n)
    got = Counter()
    for r in g.edges.select("src", "dst", "weight").collect():
        got[(r["src"], r["dst"])] = int(r["weight"])
    W = nx.margulis_gabber_galil_graph(n)
    want = Counter()
    for (x1, y1), (x2, y2) in W.edges():
        a, b = x1 * n + y1, x2 * n + y2
        want[(min(a, b), max(a, b))] += 1
    assert got == want


def test_chordal_cycle_graph_parity(spark):
    from collections import Counter

    p = 11
    g = rg.chordal_cycle_graph(spark, p)
    got = Counter()
    for r in g.edges.select("src", "dst", "weight").collect():
        got[(r["src"], r["dst"])] = int(r["weight"])
    W = nx.chordal_cycle_graph(p)
    want = Counter()
    for a, b in W.edges():
        want[(min(a, b), max(a, b))] += 1
    assert got == want


def test_random_partition_graph_blocks(spark):
    g = rg.random_partition_graph(spark, [10, 10, 10], 0.8, 0.02, seed=13)
    G = _to_nx(g)
    assert G.number_of_nodes() == 30
    blocks = [set(range(10)), set(range(10, 20)), set(range(20, 30))]
    inside = sum(
        1 for u, v in G.edges() if any(u in b and v in b for b in blocks)
    )
    outside = G.number_of_edges() - inside
    assert inside > outside  # p_in >> p_out


def test_gaussian_random_partition_graph(spark):
    g = rg.gaussian_random_partition_graph(spark, 40, 10, 4, 0.7, 0.05, seed=17)
    assert _to_nx(g).number_of_nodes() == 40


def test_relaxed_caveman(spark):
    g = rg.relaxed_caveman_graph(spark, 4, 5, 0.15, seed=19)
    G = _to_nx(g)
    assert G.number_of_nodes() == 20
    assert G.number_of_edges() <= 4 * 10  # rewiring only removes/moves


def test_configuration_model_degree_sums(spark):
    degs = [3, 3, 2, 2, 1, 1]
    g = rg.configuration_model(spark, degs, seed=23)
    # weighted degree (multiplicity) per node must equal the sequence,
    # counting self-loops twice
    rows = g.edges.select("src", "dst", "weight").collect()
    got = {i: 0 for i in range(len(degs))}
    for r in rows:
        w = int(r["weight"])
        if r["src"] == r["dst"]:
            got[r["src"]] += 2 * w
        else:
            got[r["src"]] += w
            got[r["dst"]] += w
    assert got == {i: d for i, d in enumerate(degs)}
    with pytest.raises(NetworkXError):
        rg.configuration_model(spark, [3, 2], seed=1)


def test_havel_hakimi_parity(spark):
    degs = [3, 3, 3, 3, 2, 2]
    g = rg.havel_hakimi_graph(spark, degs)
    G = _to_nx(g)
    W = nx.havel_hakimi_graph(degs)
    assert sorted(d for _, d in G.degree()) == sorted(d for _, d in W.degree())
    with pytest.raises(NetworkXError):
        rg.havel_hakimi_graph(spark, [5, 1, 1])


def test_random_regular(spark):
    g = rg.random_regular_graph(spark, 3, 12, seed=29)
    G = _to_nx(g)
    assert all(d == 3 for _, d in G.degree())
    assert G.number_of_nodes() == 12


def test_prufer_roundtrip_parity(spark):
    seq = [3, 3, 3, 4]
    g = rg.from_prufer_sequence(spark, seq)
    G = _to_nx(g)
    W = nx.from_prufer_sequence(seq)
    assert sorted(map(tuple, map(sorted, G.edges()))) == sorted(
        map(tuple, map(sorted, W.edges()))
    )
    assert rg.to_prufer_sequence(g) == seq


def test_random_labeled_tree(spark):
    g = rg.random_labeled_tree(spark, 15, seed=31)
    G = _to_nx(g)
    assert nx.is_tree(G)
    assert G.number_of_nodes() == 15


def test_degree_sequence_tree(spark):
    degs = [3, 2, 2, 1, 1, 1, 1, 1]  # sum = 12 = 2*(8-1)? no, 2*7=14
    degs = [4, 3, 2, 1, 1, 1, 1, 1]  # sum 14 = 2*(8-1)
    g = rg.degree_sequence_tree(spark, degs)
    G = _to_nx(g)
    assert nx.is_tree(G)
    assert sorted(d for _, d in G.degree()) == sorted(degs)


def test_gn_family(spark):
    g = rg.gn_graph(spark, 20, seed=37)
    G = _to_nx(g)
    assert G.number_of_edges() == 19
    assert nx.is_directed_acyclic_graph(G)
    g2 = rg.gnr_graph(spark, 20, 0.4, seed=41)
    assert _to_nx(g2).number_of_edges() == 19
    g3 = rg.gnc_graph(spark, 12, seed=43)
    G3 = _to_nx(g3)
    assert nx.is_directed_acyclic_graph(G3)
    assert G3.number_of_edges() >= 11


def test_random_lobster(spark):
    g = rg.random_lobster(spark, 10, 0.4, 0.3, seed=47)
    G = _to_nx(g)
    assert nx.is_tree(G)
    # lobster: removing leaves twice leaves a path
    H = G.copy()
    for _ in range(2):
        H.remove_nodes_from([n for n, d in H.degree() if d == 1])
    if H.number_of_nodes() > 1:
        assert all(d <= 2 for _, d in H.degree())


def test_interval_graph_parity(spark):
    intervals = [(1, 4), (3, 6), (5, 8), (9, 12), (2, 10)]
    g = rg.interval_graph(spark, intervals)
    G = _to_nx(g)
    W = nx.interval_graph(intervals)
    relabel = {iv: i for i, iv in enumerate(intervals)}
    want = {
        (min(relabel[a], relabel[b]), max(relabel[a], relabel[b]))
        for a, b in W.edges()
    }
    got = {(min(u, v), max(u, v)) for u, v in G.edges()}
    assert got == want


def test_gnp_aliases(spark):
    for f in (rg.erdos_renyi_graph, rg.binomial_graph, rg.fast_gnp_random_graph):
        g = f(spark, 25, 0.2, seed=51)
        assert _to_nx(g).number_of_nodes() == 25
    g = rg.dense_gnm_random_graph(spark, 20, 30, seed=53)
    assert _to_nx(g).number_of_edges() == 30
