"""Round-2 API surface: mutation analogs, views, set-op variants, BFS
outputs, adjlist / node-link IO, rich-club, generalized degree,
relabel_nodes, and the composed near-dup pipeline."""

import os

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import SparkGraph, from_nx, from_edgelist, relabel_nodes
from linkgraph.algos.setops import (
    bfs_layers,
    bfs_tree_edges,
    disjoint_union,
    full_join,
    union_all,
    compose_all,
    intersection_all,
)
from linkgraph.algos.richclub import rich_club_coefficient, generalized_degree
from linkgraph.io.adjlist import read_adjlist, write_adjlist
from linkgraph.io.json_graph import (
    node_link_data,
    node_link_graph,
    write_node_link_json,
    read_node_link_json,
)


def _edges(g):
    return {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}


def _nodes(g):
    return {r["id"] for r in g.vertices.collect()}


# ------------------------------------------------------------------ #
# mutation analogs / views
# ------------------------------------------------------------------ #


def test_add_remove_edges(spark):
    g = from_edgelist(spark, [(1, 2), (2, 3)], directed=False)
    g2 = g.add_edges(spark.createDataFrame([(3, 4), (2, 1)], ["src", "dst"]))
    assert _edges(g2) == {(1, 2), (2, 3), (3, 4)}
    assert 4 in _nodes(g2)
    g3 = g2.remove_edges(spark.createDataFrame([(2, 1)], ["src", "dst"]))
    assert _edges(g3) == {(2, 3), (3, 4)}
    assert 1 in _nodes(g3)  # nodes stay, like Graph.remove_edge


def test_add_edges_overwrites_weight(spark):
    g = from_edgelist(spark, [(1, 2, 5.0)], directed=True)
    g2 = g.add_edges(spark.createDataFrame([(1, 2, 9.0)], ["src", "dst", "weight"]))
    assert g2.edges.collect()[0]["weight"] == 9.0


def test_edge_subgraph(spark):
    G = nx.path_graph(6)
    g = from_nx(spark, G)
    sub = g.edge_subgraph(spark.createDataFrame([(0, 1), (3, 2)], ["a", "b"]))
    H = G.edge_subgraph([(0, 1), (2, 3)])
    assert _nodes(sub) == set(H.nodes)
    assert _edges(sub) == {(min(u, v), max(u, v)) for u, v in H.edges}


def test_subgraph_view_and_restricted_view(spark):
    g = from_edgelist(spark, [(1, 2), (2, 3), (3, 4)], directed=False)
    v = g.subgraph_view(
        node_filter=F.col("id") > 1, edge_filter=F.col("src") != 2
    )
    assert _nodes(v) == {2, 3, 4}
    assert _edges(v) == {(3, 4)}
    r = g.restricted_view(
        spark.createDataFrame([(4,)], ["id"]),
        spark.createDataFrame([(1, 2)], ["a", "b"]),
    )
    assert _nodes(r) == {1, 2, 3}
    assert _edges(r) == {(2, 3)}


def test_relabel_nodes_partial_and_merge(spark):
    G = nx.path_graph(4)  # 0-1-2-3
    g = from_nx(spark, G)
    # partial mapping keeps unmapped ids (relabel.py:133)
    h = relabel_nodes(g, {0: 10})
    assert _nodes(h) == {10, 1, 2, 3}
    assert _edges(h) == {(1, 10), (1, 2), (2, 3)}
    # non-injective mapping merges nodes like the reference
    m = relabel_nodes(g, {0: 1})
    H = nx.relabel_nodes(G, {0: 1})
    assert _nodes(m) == set(H.nodes)
    assert _edges(m) == {(min(u, v), max(u, v)) for u, v in H.edges}


# ------------------------------------------------------------------ #
# set-op variants
# ------------------------------------------------------------------ #


def test_disjoint_union_parity(spark):
    G = nx.path_graph(3)
    H = nx.cycle_graph(4)
    got = disjoint_union(from_nx(spark, G), from_nx(spark, H))
    want = nx.disjoint_union(G, H)
    assert _nodes(got) == set(want.nodes)
    assert _edges(got) == {(min(u, v), max(u, v)) for u, v in want.edges}


def test_full_join_parity(spark):
    G = nx.Graph([(0, 1), (0, 2)])
    H = nx.Graph([(3, 4)])
    got = full_join(from_nx(spark, G), from_nx(spark, H))
    want = nx.full_join(G, H)
    assert _nodes(got) == set(want.nodes)
    assert _edges(got) == {(min(u, v), max(u, v)) for u, v in want.edges}


def test_all_variants(spark):
    gs = [
        from_edgelist(spark, [(0, 1)], directed=False),
        from_edgelist(spark, [(2, 3)], directed=False),
        from_edgelist(spark, [(4, 5)], directed=False),
    ]
    u = union_all(gs)
    assert _edges(u) == {(0, 1), (2, 3), (4, 5)}
    c = compose_all(
        [
            from_edgelist(spark, [(0, 1)], directed=False),
            from_edgelist(spark, [(1, 2)], directed=False),
        ]
    )
    assert _edges(c) == {(0, 1), (1, 2)}
    i = intersection_all(
        [
            from_edgelist(spark, [(0, 1), (1, 2)], directed=False),
            from_edgelist(spark, [(0, 1), (2, 3)] , directed=False),
        ]
    )
    assert _edges(i) == {(0, 1)}


# ------------------------------------------------------------------ #
# BFS outputs
# ------------------------------------------------------------------ #


def test_bfs_layers_and_tree(spark):
    G = nx.balanced_tree(2, 3)
    g = from_nx(spark, G)
    layers = {r["id"]: r["layer"] for r in bfs_layers(g, [0]).collect()}
    want = {n: i for i, layer in enumerate(nx.bfs_layers(G, [0])) for n in layer}
    assert layers == want
    te = bfs_tree_edges(g, 0)
    rows = te.collect()
    # a valid BFS tree: every non-root reachable node has exactly one
    # parent one layer up; parent is the minimum eligible neighbor
    assert len(rows) == len(want) - 1
    for r in rows:
        assert want[r["src"]] + 1 == want[r["dst"]] == r["depth"]
        eligible = [
            u for u in G.neighbors(r["dst"]) if want[u] == want[r["dst"]] - 1
        ]
        assert r["src"] == min(eligible)


# ------------------------------------------------------------------ #
# IO
# ------------------------------------------------------------------ #


def test_adjlist_roundtrip(spark, tmp_path):
    G = nx.gnp_random_graph(30, 0.1, seed=5)
    G.add_node(99)  # isolated
    g = from_nx(spark, G)
    p = os.path.join(str(tmp_path), "adj")
    write_adjlist(g, p)
    g2 = read_adjlist(spark, p, directed=False)
    assert _nodes(g2) == set(G.nodes)
    assert _edges(g2) == {(min(u, v), max(u, v)) for u, v in G.edges}


def test_node_link_roundtrip(spark, tmp_path):
    G = nx.gnp_random_graph(20, 0.15, seed=7, directed=True)
    g = from_nx(spark, G)
    data = node_link_data(g)
    g2 = node_link_graph(spark, data)
    assert _nodes(g2) == set(G.nodes)
    assert _edges(g2) == set(G.edges)
    p = os.path.join(str(tmp_path), "nl.json")
    write_node_link_json(g, p)
    g3 = read_node_link_json(spark, p)
    assert _edges(g3) == set(G.edges)
    # interop: networkx can consume the dict
    H = nx.node_link_graph(data, edges="links")
    assert set(H.edges) == set(G.edges)


# ------------------------------------------------------------------ #
# rich club / generalized degree
# ------------------------------------------------------------------ #


def test_rich_club_parity(spark):
    G = nx.Graph([(0, 1), (0, 2), (1, 2), (1, 3), (1, 4), (4, 5)])
    g = from_nx(spark, G)
    got = {
        r["degree"]: r["coefficient"]
        for r in rich_club_coefficient(g, normalized=False).collect()
    }
    want = nx.rich_club_coefficient(G, normalized=False)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_rich_club_random_parity(spark):
    G = nx.gnp_random_graph(60, 0.1, seed=17)
    g = from_nx(spark, G)
    got = {
        r["degree"]: r["coefficient"]
        for r in rich_club_coefficient(g, normalized=False).collect()
    }
    want = nx.rich_club_coefficient(G, normalized=False)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_generalized_degree_parity(spark):
    G = nx.gnp_random_graph(40, 0.15, seed=23)
    g = from_nx(spark, G)
    got = {}
    for r in generalized_degree(g).collect():
        got.setdefault(r["id"], {})[r["t"]] = r["n_edges"]
    want = {n: dict(c) for n, c in nx.generalized_degree(G).items()}
    want = {n: c for n, c in want.items() if c}  # nodes w/o edges absent
    assert got == want


# ------------------------------------------------------------------ #
# composed near-dup pipeline
# ------------------------------------------------------------------ #


def test_near_duplicates_pipeline(spark):
    from linkgraph import text as TX

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog today"),  # near dup
        (4, "completely different text about spark distributed engines"),
        (5, "another unrelated document mentioning graphs and rivers"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["canonical_doc_id"]
        for r in TX.near_duplicates(docs, k=2, threshold=0.5).collect()
    }
    assert out[1] == 1 and out[2] == 1
    assert out[4] == 4 and out[5] == 5
    # doc 3 shares most shingles with 1/2 at threshold 0.5
    assert out[3] == 1


# -------------------- to_directed / to_undirected / copy / update / clear -- #


def _edge_set(g):
    return {(r["src"], r["dst"]) for r in g.edges.collect()}


def test_to_directed_parity(spark):
    G = nx.Graph([(0, 1), (1, 2), (2, 2)])
    g = from_nx(spark, G).to_directed()
    assert g.directed
    want = {(u, v) for u, v in G.to_directed().edges()}
    assert _edge_set(g) == want


def test_to_undirected_parity(spark):
    G = nx.DiGraph([(0, 1), (1, 0), (1, 2), (3, 3)])
    g = from_nx(spark, G).to_undirected()
    assert not g.directed
    want = {tuple(sorted(e)) for e in G.to_undirected().edges()}
    assert _edge_set(g) == want


def test_copy_and_clear(spark):
    G = nx.path_graph(4)
    g = from_nx(spark, G)
    c = g.copy()
    assert _edge_set(c) == _edge_set(g) and c.directed == g.directed
    z = g.clear()
    assert z.number_of_nodes() == 0 and z.number_of_edges() == 0
    # original untouched (immutability)
    assert g.number_of_edges() == 3


def test_update_parity(spark):
    G = nx.Graph([(0, 1), (1, 2)])
    H = nx.Graph(G)
    H.update(edges=[(2, 3), (0, 1)], nodes=[9])
    g = from_nx(spark, G)
    new_e = spark.createDataFrame([(2, 3), (0, 1)], "src long, dst long")
    new_n = spark.createDataFrame([(9,)], "id long")
    g2 = g.update(edges=new_e, nodes=new_n)
    assert _edge_set(g2) == {tuple(sorted(e)) for e in H.edges()}
    assert {r["id"] for r in g2.vertices.collect()} == set(H.nodes())
    # update with only nodes keeps edges intact
    g3 = g.update(nodes=new_n)
    assert _edge_set(g3) == _edge_set(g)
    assert 9 in {r["id"] for r in g3.vertices.collect()}
