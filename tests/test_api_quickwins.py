"""Round-4 continuation API tail: vf2pp mappings, linalg tail, panther
vectors, layouts, gexf relabel, graphml classes."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

import linkgraph as lg
from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError


def test_vf2pp_isomorphism_mapping(spark):
    G1 = nx.cycle_graph(6)
    G2 = nx.relabel_nodes(G1, {i: (i * 2 + 1) % 13 for i in G1})
    g1, g2 = from_nx(spark, G1), from_nx(spark, G2)
    m = lg.vf2pp_isomorphism(g1, g2)
    assert m is not None
    for u, v in G1.edges():
        assert G2.has_edge(m[u], m[v])
    g3 = from_nx(spark, nx.path_graph(6))
    assert lg.vf2pp_isomorphism(g1, g3) is None


def test_vf2pp_all_isomorphisms_count(spark):
    G = nx.cycle_graph(5)
    g = from_nx(spark, G)
    # automorphisms of C5 = dihedral group, order 10
    assert sum(1 for _ in lg.vf2pp_all_isomorphisms(g, g)) == 10


def test_attr_matrix_parity(spark):
    G = nx.gnp_random_graph(14, 0.3, seed=3)
    for u in G:
        G.nodes[u]["cls"] = u % 3
    for u, v in G.edges():
        G.edges[u, v]["weight"] = 1.0
    g0 = from_nx(spark, G)
    g = lg.SparkGraph(
        g0.edges,
        g0.vertices.withColumn("cls", (g0.vertices["id"] % 3).cast("long")),
        directed=False,
        coalesce_edges=False,
    )
    M = lg.attr_matrix(g, edge_attr="weight", node_attr="cls", rc_order=[0, 1, 2])
    want = nx.attr_matrix(G, edge_attr="weight", node_attr="cls", rc_order=[0, 1, 2])
    assert np.allclose(M, np.asarray(want))


def test_directed_laplacians_parity(spark):
    # nx's own implementation requires scipy (absent here); verify against
    # the formulae computed directly with numpy (Chung 2005).
    G = nx.gnp_random_graph(10, 0.4, seed=5, directed=True)
    g = from_nx(spark, G)
    ids = sorted(G)
    A = nx.to_numpy_array(G, nodelist=ids)
    n = len(ids)
    alpha = 0.9
    A2 = A.copy()
    A2[A2.sum(axis=1) == 0, :] = 1 / n
    A2 = A2 / A2.sum(axis=1)[:, None]
    P = alpha * A2 + (1 - alpha) / n
    evals, evecs = np.linalg.eig(P.T)
    p = evecs[:, np.argmax(evals.real)].real
    p = p / p.sum()
    sqrtp = np.sqrt(np.abs(p))
    Q = (sqrtp[:, None] * P) / sqrtp[None, :]
    want_norm = np.identity(n) - (Q + Q.T) / 2.0
    got = lg.directed_laplacian_matrix(g, ids, walk_type="pagerank", alpha=alpha)
    assert np.allclose(got, want_norm, atol=1e-8)
    Phi = np.diag(p)
    want_comb = Phi - (Phi @ P + P.T @ Phi) / 2.0
    got2 = lg.directed_combinatorial_laplacian_matrix(
        g, ids, walk_type="pagerank", alpha=alpha
    )
    assert np.allclose(got2, want_comb, atol=1e-8)
    # the symmetrized normalized Laplacian is PSD with a zero eigenvalue
    w = np.linalg.eigvalsh(got)
    assert w.min() > -1e-8


def test_directed_modularity_matrix_parity(spark):
    G = nx.gnp_random_graph(12, 0.3, seed=7, directed=True)
    g = from_nx(spark, G)
    ids = sorted(G)
    got = lg.directed_modularity_matrix(g, ids)
    A = nx.to_numpy_array(G, nodelist=ids)  # nx's own needs scipy (absent)
    want = A - np.outer(A.sum(axis=1), A.sum(axis=0)) / A.sum()
    assert np.allclose(got, want)


def test_panther_vector_similarity(spark):
    G = nx.karate_club_graph()
    g = from_nx(spark, G)
    out = lg.panther_vector_similarity(g, 0, D=5, k=4, seed=3)
    rows = out.collect()
    assert 1 <= len(rows) <= 4
    assert all(0 <= r["similarity"] <= 1.0 for r in rows)
    assert all(r["id"] != 0 for r in rows)
    with pytest.raises(NetworkXError):
        lg.panther_vector_similarity(g, 0, D=100)


def test_bfs_layout(spark):
    G = nx.balanced_tree(2, 3)
    g = from_nx(spark, G)
    pos = lg.bfs_layout(g, 0)
    rows = {r["id"]: (r["x"], r["y"]) for r in pos.collect()}
    assert len(rows) == G.number_of_nodes()
    # root and leaves on distinct layer coordinates
    xs = {round(v[0], 6) for v in rows.values()}
    assert len(xs) == 4  # 4 BFS layers
    g2 = from_nx(spark, nx.disjoint_union(nx.path_graph(3), nx.path_graph(2)))
    with pytest.raises(NetworkXError):
        lg.bfs_layout(g2, 0)


def test_rescale_layout_dict():
    pos = {0: [1.0, 1.0], 1: [3.0, 3.0]}
    out = lg.rescale_layout_dict(pos, scale=2.0)
    arr = np.array([out[0], out[1]])
    assert np.allclose(arr.mean(axis=0), 0)
    assert np.isclose(np.abs(arr).max(), 2.0)


def test_relabel_gexf_graph(tmp_path, spark):
    # hand-write a gexf with integer labels shifted by 100
    p = str(tmp_path / "g.gexf")
    with open(p, "w") as f:
        f.write(
            '<gexf xmlns="http://www.gexf.net/1.2draft"><graph defaultedgetype="undirected">'
            '<nodes><node id="0" label="100"/><node id="1" label="101"/></nodes>'
            '<edges><edge id="0" source="0" target="1"/></edges></graph></gexf>'
        )
    g = lg.read_gexf(spark, p)
    rg_ = lg.relabel_gexf_graph(g)
    ids = sorted(r["id"] for r in rg_.vertices.select("id").collect())
    assert ids == [100, 101]


def test_graphml_classes(tmp_path, spark):
    G = nx.path_graph(4)
    g = from_nx(spark, G)
    w = lg.GraphMLWriter()
    w.add_graph_element(g)
    path = str(tmp_path / "t.graphml")
    w.dump(path)
    (g2,) = lg.GraphMLReader(spark)(path)
    assert g2.edges.count() == 3


def test_prefix_tree_recursive_alias(spark):
    t1, n1 = lg.prefix_tree(spark, [[1, 2, 3], [1, 2, 4]])
    t2, n2 = lg.prefix_tree_recursive(spark, [[1, 2, 3], [1, 2, 4]])
    assert t1.edges.count() == t2.edges.count()


def test_attr_sparse_matrix_gated(spark):
    # scipy absent in this environment: the sparse twin must raise
    # ImportError exactly like the reference would
    G = nx.path_graph(4)
    g = from_nx(spark, G)
    with pytest.raises(ImportError):
        lg.attr_sparse_matrix(g)
