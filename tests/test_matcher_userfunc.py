"""GraphMatcher node_match/edge_match parity vs the reference's
``isomorphism/vf2userfunc.py`` semantics (tests modeled on
``isomorphism/tests/test_vf2userfunc.py``)."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import SparkGraph
from linkgraph.algos.isomorphism import (
    GraphMatcher,
    DiGraphMatcher,
    MultiGraphMatcher,
    categorical_node_match,
    categorical_edge_match,
    categorical_multiedge_match,
    numerical_edge_match,
    generic_node_match,
)


def _graph(spark, edges, nodes=None, directed=False, ecols="", ncols=""):
    eschema = "src long, dst long" + (", " + ecols if ecols else "")
    vschema = "id long" + (", " + ncols if ncols else "")
    edf = spark.createDataFrame(edges, eschema)
    vdf = spark.createDataFrame(nodes, vschema) if nodes is not None else None
    return SparkGraph(edf, vertices=vdf, directed=directed, coalesce_edges=False)


def _nx(edges, nodes=None, directed=False, eattr=None, nattr=None):
    G = nx.DiGraph() if directed else nx.Graph()
    if nodes is not None:
        for row in nodes:
            G.add_node(row[0], **dict(zip(nattr or [], row[1:])))
    for row in edges:
        G.add_edge(row[0], row[1], **dict(zip(eattr or [], row[2:])))
    return G


def test_node_color_match(spark):
    tri = [(0, 1), (1, 2), (2, 0)]
    nodes_a = [(0, "red"), (1, "blue"), (2, "blue")]
    # same multiset of colors but incompatible placement is impossible on
    # a triangle (vertex-transitive), so use a path where placement bites
    path = [(0, 1), (1, 2)]
    nodes_mid_red = [(0, "blue"), (1, "red"), (2, "blue")]
    nodes_end_red = [(0, "red"), (1, "blue"), (2, "blue")]
    nm = categorical_node_match("color", None)

    for e, n1, n2, want in [
        (tri, nodes_a, nodes_a, True),
        (path, nodes_mid_red, nodes_mid_red, True),
        (path, nodes_mid_red, nodes_end_red, False),
    ]:
        g1 = _graph(spark, e, n1, ncols="color string")
        g2 = _graph(spark, e, n2, ncols="color string")
        got = GraphMatcher(g1, g2, node_match=nm).is_isomorphic()
        G1 = _nx(e, n1, nattr=["color"])
        G2 = _nx(e, n2, nattr=["color"])
        want_nx = nx.isomorphism.GraphMatcher(G1, G2, node_match=nm).is_isomorphic()
        assert got == want_nx == want
        # structural match still holds without the matcher
        assert GraphMatcher(g1, g2).is_isomorphic()


def test_edge_weight_match(spark):
    e1 = [(0, 1, 1.0), (1, 2, 2.0)]
    e2_rev = [(0, 1, 2.0), (1, 2, 1.0)]   # iso via reversal
    e2_bad = [(0, 1, 1.0), (1, 2, 3.0)]   # no weight-preserving bijection
    em = numerical_edge_match("weight", 1.0)
    g1 = _graph(spark, e1, ecols="weight double")
    for e2, want in [(e2_rev, True), (e2_bad, False)]:
        g2 = _graph(spark, e2, ecols="weight double")
        got = GraphMatcher(g1, g2, edge_match=em).is_isomorphic()
        G1 = _nx(e1, eattr=["weight"])
        G2 = _nx(e2, eattr=["weight"])
        want_nx = nx.isomorphism.GraphMatcher(G1, G2, edge_match=em).is_isomorphic()
        assert got == want_nx == want
        assert GraphMatcher(g1, g2).is_isomorphic()


def test_directed_edge_label_match(spark):
    e1 = [(0, 1, "a"), (1, 2, "b"), (2, 0, "c")]
    rot = [(0, 1, "b"), (1, 2, "c"), (2, 0, "a")]   # rotation: iso
    bad = [(0, 1, "a"), (1, 2, "b"), (2, 0, "b")]   # label multiset differs
    em = categorical_edge_match("label", None)
    g1 = _graph(spark, e1, directed=True, ecols="label string")
    for e2, want in [(rot, True), (bad, False)]:
        g2 = _graph(spark, e2, directed=True, ecols="label string")
        got = DiGraphMatcher(g1, g2, edge_match=em).is_isomorphic()
        G1 = _nx(e1, directed=True, eattr=["label"])
        G2 = _nx(e2, directed=True, eattr=["label"])
        want_nx = nx.isomorphism.DiGraphMatcher(
            G1, G2, edge_match=em
        ).is_isomorphic()
        assert got == want_nx == want


def test_combined_node_and_edge_match(spark):
    e = [(0, 1, 5.0), (1, 2, 7.0)]
    n = [(0, "x"), (1, "y"), (2, "x")]
    g1 = _graph(spark, e, n, ecols="weight double", ncols="kind string")
    g2 = _graph(spark, e, n, ecols="weight double", ncols="kind string")
    m = GraphMatcher(
        g1,
        g2,
        node_match=categorical_node_match("kind", None),
        edge_match=numerical_edge_match("weight", 1.0),
    )
    assert m.is_isomorphic()
    # identity is the only kind+weight-preserving bijection here
    assert m.mapping == {0: 0, 1: 1, 2: 2}


def test_generic_node_match(spark):
    # op: sizes compatible within +-1
    op = lambda a, b: abs(a - b) <= 1  # noqa: E731
    nm = generic_node_match("size", 0, op)
    e = [(0, 1)]
    g1 = _graph(spark, e, [(0, 10), (1, 20)], ncols="size long")
    g2 = _graph(spark, e, [(0, 21), (1, 11)], ncols="size long")
    g3 = _graph(spark, e, [(0, 10), (1, 99)], ncols="size long")
    assert GraphMatcher(g1, g2, node_match=nm).is_isomorphic()
    assert not GraphMatcher(g1, g3, node_match=nm).is_isomorphic()


def test_multigraph_matcher_coalesced(spark):
    em = categorical_multiedge_match("label", None)
    e = [(0, 1, "p"), (1, 2, "q")]
    g1 = _graph(spark, e, ecols="label string")
    g2 = _graph(spark, e, ecols="label string")
    assert MultiGraphMatcher(g1, g2, edge_match=em).is_isomorphic()


def test_subgraph_matching_parity(spark):
    # K3 embeds in K4 (24 induced embeddings); P3 does NOT embed in K3
    # (induced semantics) — and nx agrees on both
    g_k4 = _graph(spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    g_k3 = _graph(spark, [(0, 1), (0, 2), (1, 2)])
    g_p3 = _graph(spark, [(0, 1), (1, 2)])
    m = GraphMatcher(g_k4, g_k3)
    assert m.subgraph_is_isomorphic()
    assert len(list(m.subgraph_isomorphisms_iter())) == len(
        list(
            nx.isomorphism.GraphMatcher(
                nx.complete_graph(4), nx.complete_graph(3)
            ).subgraph_isomorphisms_iter()
        )
    )
    assert not GraphMatcher(g_k3, g_p3).subgraph_is_isomorphic()


def test_subgraph_matching_with_matcher(spark):
    # colored subgraph search: the b-colored middle must map to the
    # b-colored node of the host path
    nm = categorical_node_match("c", None)
    host = _graph(
        spark,
        [(0, 1), (1, 2), (2, 3)],
        [(0, "a"), (1, "b"), (2, "a"), (3, "a")],
        ncols="c string",
    )
    pat = _graph(
        spark, [(0, 1), (1, 2)], [(0, "a"), (1, "b"), (2, "a")], ncols="c string"
    )
    maps = list(GraphMatcher(host, pat, node_match=nm).subgraph_isomorphisms_iter())
    assert len(maps) == 2  # {0:0,1:1,2:2} and its reversal
    for m in maps:
        assert m[1] == 1  # host's b node binds the pattern's b node
