"""Layout family — structural invariants (positions are rotation/sign
free, so parity is by geometry, not coordinates)."""

from __future__ import annotations

import math

import networkx as nx
import numpy as np
import pytest

import linkgraph.layout as ly
from linkgraph.graph import SparkGraph
from linkgraph.generators import cycle_graph, path_graph
from linkgraph.small_graphs import petersen_graph


def _to_spark(spark, G):
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in G.edges()], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(n,) for n in G.nodes()], "id long")
    return SparkGraph(e, v, directed=G.is_directed(), coalesce_edges=False)


def _pos(df):
    return {r["id"]: (r["x0"], r["x1"]) for r in df.collect()}


def test_random_layout_range_and_determinism(spark):
    g = petersen_graph(spark)
    p1 = _pos(ly.random_layout(g, seed=3))
    p2 = _pos(ly.random_layout(g, seed=3))
    assert p1 == p2
    assert all(0 <= x < 1 and 0 <= y < 1 for x, y in p1.values())
    p3 = _pos(ly.random_layout(g, seed=4))
    assert p3 != p1


def test_circular_layout_geometry(spark):
    g = cycle_graph(spark, 8)
    pos = _pos(ly.circular_layout(g))
    assert len(pos) == 8
    for x, y in pos.values():
        assert math.hypot(x, y) == pytest.approx(1.0, abs=1e-9)
    # consecutive ids are adjacent on the circle
    want = nx.circular_layout(nx.cycle_graph(8))
    for i in range(8):
        got_angle = math.atan2(pos[i][1], pos[i][0]) % (2 * math.pi)
        ref_angle = math.atan2(want[i][1], want[i][0]) % (2 * math.pi)
        assert got_angle == pytest.approx(ref_angle, abs=1e-6)


def test_shell_layout_radii(spark):
    g = petersen_graph(spark)
    pos = _pos(ly.shell_layout(g, [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]))
    inner = {math.hypot(*pos[i]) for i in range(5)}
    outer = {math.hypot(*pos[i]) for i in range(5, 10)}
    assert max(inner) < min(outer)


def test_spiral_layout_monotone_radius(spark):
    g = path_graph(spark, 20)
    pos = _pos(ly.spiral_layout(g))
    # rescale_layout centers on the centroid; the spiral's own center is
    # where rank-0 sits, so measure radii from node 0's position
    cx, cy = pos[0]
    radii = [math.hypot(pos[i][0] - cx, pos[i][1] - cy) for i in range(20)]
    assert radii == sorted(radii)


def test_spectral_layout_eigen_subspace(spark):
    G = nx.path_graph(10)
    g = _to_spark(spark, G)
    pos = _pos(ly.spectral_layout(g))
    # the path's Fiedler coordinate orders the path monotonically
    xs = [pos[i][0] for i in range(10)]
    assert xs == sorted(xs) or xs == sorted(xs, reverse=True)
    # each axis satisfies the eigenvector property L v = lambda v
    n = G.number_of_nodes()
    L = np.zeros((n, n))
    for u, v in G.edges():
        L[u, u] += 1
        L[v, v] += 1
        L[u, v] -= 1
        L[v, u] -= 1
    for axis in (0, 1):
        v = np.array([pos[i][axis] for i in range(10)])
        v = v - v.mean()
        v = v / np.linalg.norm(v)
        Lv = L @ v
        lam = v @ Lv
        assert np.allclose(Lv, lam * v, atol=1e-4)


def test_spring_layout_separates_components(spark):
    G = nx.disjoint_union(nx.complete_graph(5), nx.complete_graph(5))
    g = _to_spark(spark, G)
    pos = _pos(ly.spring_layout(g, iterations=60, seed=7))
    a = [pos[i] for i in range(5)]
    b = [pos[i] for i in range(5, 10)]

    def centroid(ps):
        return (
            sum(p[0] for p in ps) / len(ps),
            sum(p[1] for p in ps) / len(ps),
        )

    ca, cb = centroid(a), centroid(b)
    between = math.hypot(ca[0] - cb[0], ca[1] - cb[1])
    within = max(
        math.hypot(p[0] - ca[0], p[1] - ca[1]) for p in a
    ) + max(math.hypot(p[0] - cb[0], p[1] - cb[1]) for p in b)
    assert between > within / 2  # clusters pulled apart


def test_bipartite_layout_two_columns(spark):
    G = nx.complete_bipartite_graph(3, 4)
    g = _to_spark(spark, G)
    pos = _pos(ly.bipartite_layout(g, [0, 1, 2]))
    left_x = {round(pos[i][0], 6) for i in range(3)}
    right_x = {round(pos[i][0], 6) for i in range(3, 7)}
    assert len(left_x) == 1 and len(right_x) == 1
    assert left_x != right_x


def test_multipartite_layout_columns(spark):
    g = _to_spark(spark, nx.complete_bipartite_graph(3, 4))
    from linkgraph.function import set_node_attributes

    g = set_node_attributes(
        g, {i: (0 if i < 3 else 1) for i in range(7)}, name="subset"
    )
    pos = _pos(ly.multipartite_layout(g))
    xs0 = {round(pos[i][0], 6) for i in range(3)}
    xs1 = {round(pos[i][0], 6) for i in range(3, 7)}
    assert len(xs0) == 1 and len(xs1) == 1 and xs0 != xs1


def test_rescale_layout_bounds(spark):
    g = petersen_graph(spark)
    pos_df = ly.random_layout(g, seed=11)
    out = _pos(ly.rescale_layout(pos_df, scale=2.0))
    m = max(max(abs(x), abs(y)) for x, y in out.values())
    assert m == pytest.approx(2.0, abs=1e-9)
    mean_x = sum(x for x, _ in out.values()) / len(out)
    assert mean_x == pytest.approx(0.0, abs=1e-9)
