"""check_planarity / PlanarEmbedding / planar_layout
(``networkx/algorithms/planarity.py``, ``planar_drawing.py``)."""

import math

import networkx as nx
import pytest

import linkgraph as lg
from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError

PLANAR = [
    nx.cycle_graph(6),
    nx.grid_2d_graph(3, 3),
    nx.wheel_graph(6),
    nx.path_graph(5),
    nx.lollipop_graph(4, 3),
]
NONPLANAR = [nx.complete_graph(5), nx.complete_bipartite_graph(3, 3), nx.petersen_graph()]


def _g(spark, G):
    return from_nx(spark, nx.convert_node_labels_to_integers(G))


@pytest.mark.parametrize("G", PLANAR)
def test_check_planarity_true(spark, G):
    ok, emb = lg.check_planarity(_g(spark, G))
    assert ok and emb is not None
    assert emb.node_count() == G.number_of_nodes()
    # faces cover the biconnected structure: Euler check per component
    assert len(emb.faces()) >= 1


@pytest.mark.parametrize("G", NONPLANAR)
def test_check_planarity_false(spark, G):
    ok, emb = lg.check_planarity(_g(spark, G))
    assert not ok and emb is None


def test_check_planarity_counterexample_unsupported(spark):
    with pytest.raises(NotImplementedError):
        lg.check_planarity(_g(spark, nx.complete_graph(5)), counterexample=True)


def test_planar_layout_wheel_no_crossings(spark):
    # wheel graph is 3-connected planar: Tutte drawing is crossing-free
    G = nx.wheel_graph(8)
    g = _g(spark, G)
    pos = {r["id"]: (r["x"], r["y"]) for r in lg.planar_layout(g).collect()}
    assert len(pos) == G.number_of_nodes()

    def seg_cross(p1, p2, p3, p4):
        def ccw(a, b, c):
            return (c[1] - a[1]) * (b[0] - a[0]) - (b[1] - a[1]) * (c[0] - a[0])
        if len({p1, p2, p3, p4}) < 4:
            return False
        return (ccw(p1, p3, p4) * ccw(p2, p3, p4) < 0) and (
            ccw(p3, p1, p2) * ccw(p4, p1, p2) < 0
        )

    E = list(G.edges())
    for i in range(len(E)):
        for j in range(i + 1, len(E)):
            a, b = E[i]
            c, d = E[j]
            if len({a, b, c, d}) == 4:
                assert not seg_cross(pos[a], pos[b], pos[c], pos[d])


def test_planar_layout_nonplanar_raises(spark):
    with pytest.raises(NetworkXError):
        lg.planar_layout(_g(spark, nx.complete_graph(5)))


def test_combinatorial_embedding_to_pos(spark):
    g = _g(spark, nx.cycle_graph(5))
    ok, emb = lg.check_planarity(g)
    pos = lg.combinatorial_embedding_to_pos(emb)
    assert set(pos) == set(range(5))
    for v, (x, y) in pos.items():
        assert math.isfinite(x) and math.isfinite(y)
