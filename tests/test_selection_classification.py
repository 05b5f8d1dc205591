"""Validity/parity tests for maximal_independent_set, maximal_matching,
voterank, and node classification vs the reference."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos import selection as SEL
from linkgraph.algos import classification as CLS
from linkgraph.exceptions import NotImplementedForDirected


def _gnp(n=40, p=0.12, seed=7, directed=False):
    return nx.gnp_random_graph(n, p, seed=seed, directed=directed)


# ------------------------------- MIS ----------------------------------- #


def _check_mis(G, mis):
    # independence
    for u in mis:
        for v in mis:
            if u != v:
                assert not G.has_edge(u, v), (u, v)
    # maximality: every node outside has a neighbor inside
    for n in G.nodes():
        if n not in mis:
            assert any(nb in mis for nb in G[n]), n


def test_mis_valid_and_deterministic(spark):
    G = _gnp(50, 0.1, seed=3)
    g = from_nx(spark, G)
    a = {r["id"] for r in SEL.maximal_independent_set(g, seed=1).collect()}
    b = {r["id"] for r in SEL.maximal_independent_set(g, seed=1).collect()}
    assert a == b
    _check_mis(G, a)


def test_mis_with_seed_nodes(spark):
    G = nx.path_graph(8)
    g = from_nx(spark, G)
    seeds = spark.createDataFrame([(0,), (3,)], "id long")
    mis = {r["id"] for r in SEL.maximal_independent_set(g, nodes=seeds).collect()}
    assert {0, 3} <= mis
    _check_mis(G, mis)


def test_mis_rejects_adjacent_seeds(spark):
    G = nx.path_graph(5)
    g = from_nx(spark, G)
    seeds = spark.createDataFrame([(1,), (2,)], "id long")
    with pytest.raises(SEL.NetworkXUnfeasible):
        SEL.maximal_independent_set(g, nodes=seeds)


def test_mis_directed_raises(spark):
    g = from_nx(spark, nx.DiGraph([(1, 2)]))
    with pytest.raises(NotImplementedForDirected):
        SEL.maximal_independent_set(g)


def test_mis_isolates_included(spark):
    G = nx.Graph()
    G.add_edges_from([(1, 2)])
    G.add_node(9)
    mis = {
        r["id"]
        for r in SEL.maximal_independent_set(from_nx(spark, G)).collect()
    }
    assert 9 in mis
    _check_mis(G, mis)


# ----------------------------- matching -------------------------------- #


def _check_matching(G, edges):
    seen = set()
    for u, v in edges:
        assert G.has_edge(u, v)
        assert u not in seen and v not in seen
        seen.add(u)
        seen.add(v)
    # maximality
    for u, v in G.edges():
        assert u in seen or v in seen, (u, v)


def test_maximal_matching_valid(spark):
    G = _gnp(50, 0.08, seed=11)
    rows = SEL.maximal_matching(from_nx(spark, G)).collect()
    _check_matching(G, [(r["u"], r["v"]) for r in rows])


def test_maximal_matching_path(spark):
    G = nx.path_graph(9)
    rows = SEL.maximal_matching(from_nx(spark, G)).collect()
    _check_matching(G, [(r["u"], r["v"]) for r in rows])


# ------------------------------ voterank ------------------------------- #


def test_voterank_undirected(spark):
    G = _gnp(30, 0.15, seed=13)
    want = nx.voterank(G)
    rows = SEL.voterank(from_nx(spark, G)).orderBy("rank").collect()
    assert [r["id"] for r in rows] == want


def test_voterank_limited(spark):
    G = _gnp(30, 0.15, seed=17)
    want = nx.voterank(G, number_of_nodes=5)
    rows = SEL.voterank(from_nx(spark, G), number_of_nodes=5).orderBy("rank").collect()
    assert [r["id"] for r in rows] == want


def test_voterank_directed(spark):
    G = _gnp(25, 0.12, seed=19, directed=True)
    want = nx.voterank(G)
    rows = SEL.voterank(from_nx(spark, G)).orderBy("rank").collect()
    assert [r["id"] for r in rows] == want


def test_voterank_star(spark):
    G = nx.star_graph(6)
    want = nx.voterank(G)
    rows = SEL.voterank(from_nx(spark, G)).orderBy("rank").collect()
    assert [r["id"] for r in rows] == want


# -------------------------- node classification ------------------------ #


def _nx_predict(G, fn, alpha=0.99, max_iter=30, label_name="label"):
    """Dense-numpy replica of the reference algorithm (the container has no
    scipy; this mirrors networkx/algorithms/node_classification.py:31,109
    line by line with dense arrays)."""
    import numpy as np

    nodes = list(G.nodes())
    X = nx.to_numpy_array(G, nodelist=nodes, weight="weight")
    # _get_label_info: scan nodes in order, class ids by first appearance
    label_to_id = {}
    labels = []
    for i, n in enumerate(nodes):
        d = G.nodes[n]
        if label_name in d:
            if d[label_name] not in label_to_id:
                label_to_id[d[label_name]] = len(label_to_id)
            labels.append([i, label_to_id[d[label_name]]])
    labels = np.array(labels)
    label_dict = np.array(
        [l for l, _ in sorted(label_to_id.items(), key=lambda x: x[1])]
    )
    n_samples, n_classes = X.shape[0], label_dict.shape[0]
    Fm = np.zeros((n_samples, n_classes))
    degrees = X.sum(axis=0)
    degrees[degrees == 0] = 1
    if fn == "harmonic_function":
        P = X / degrees[:, None]
        P[labels[:, 0]] = 0
        B = np.zeros((n_samples, n_classes))
        B[labels[:, 0], labels[:, 1]] = 1
    else:
        D2 = 1.0 / np.sqrt(degrees)
        P = alpha * (D2[:, None] * X * D2[None, :])
        B = np.zeros((n_samples, n_classes))
        B[labels[:, 0], labels[:, 1]] = 1 - alpha
    for _ in range(max_iter):
        Fm = P @ Fm + B
    return label_dict[np.argmax(Fm, axis=1)].tolist()


def _labels_df(spark, d):
    return spark.createDataFrame(
        [(int(k), str(v)) for k, v in d.items()], "id long, label string"
    )


def test_harmonic_path(spark):
    G = nx.path_graph(4)
    G.nodes[0]["label"] = "A"
    G.nodes[3]["label"] = "B"
    want = _nx_predict(G, "harmonic_function")
    got = {
        r["id"]: r["label"]
        for r in CLS.harmonic_function(
            from_nx(spark, G), _labels_df(spark, {0: "A", 3: "B"})
        ).collect()
    }
    assert [got[i] for i in range(4)] == want


def test_harmonic_gnp(spark):
    G = _gnp(30, 0.12, seed=23)
    lab = {0: "A", 7: "B", 13: "C", 21: "A"}
    for k, v in lab.items():
        G.nodes[k]["label"] = v
    want = _nx_predict(G, "harmonic_function")
    got = {
        r["id"]: r["label"]
        for r in CLS.harmonic_function(
            from_nx(spark, G), _labels_df(spark, lab)
        ).collect()
    }
    assert [got[i] for i in sorted(G.nodes())] == want


def test_lgc_gnp(spark):
    G = _gnp(30, 0.12, seed=29)
    lab = {1: "X", 9: "Y", 20: "X"}
    for k, v in lab.items():
        G.nodes[k]["label"] = v
    want = _nx_predict(G, "local_and_global_consistency")
    got = {
        r["id"]: r["label"]
        for r in CLS.local_and_global_consistency(
            from_nx(spark, G), _labels_df(spark, lab)
        ).collect()
    }
    assert [got[i] for i in sorted(G.nodes())] == want


def test_harmonic_weighted(spark):
    G = _gnp(20, 0.18, seed=31)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = 1.0 + (i % 3)
    lab = {0: "A", 11: "B"}
    for k, v in lab.items():
        G.nodes[k]["label"] = v
    want = _nx_predict(G, "harmonic_function")
    got = {
        r["id"]: r["label"]
        for r in CLS.harmonic_function(
            from_nx(spark, G), _labels_df(spark, lab)
        ).collect()
    }
    assert [got[i] for i in sorted(G.nodes())] == want


def test_harmonic_label_attr(spark):
    # labels via the open-schema node attribute column
    G = nx.path_graph(6)
    g = from_nx(spark, G)
    import pyspark.sql.functions as F

    attrs = spark.createDataFrame(
        [(0, "L"), (5, "R")], "id long, label string"
    )
    g = g.with_node_attrs(attrs)
    got = {r["id"]: r["label"] for r in CLS.harmonic_function(g).collect()}
    assert got[0] == "L" and got[1] == "L" and got[4] == "R" and got[5] == "R"


def test_harmonic_no_labels_raises(spark):
    g = from_nx(spark, nx.path_graph(3))
    with pytest.raises(ValueError):
        CLS.harmonic_function(g)


# ------------------------- quick-win operators -------------------------- #


def test_s_metric(spark):
    from linkgraph.algos.degrees import s_metric

    G = _gnp(30, 0.12, seed=41)
    assert s_metric(from_nx(spark, G)) == nx.s_metric(G)


def test_moral_graph(spark):
    from linkgraph.algos.dag import moral_graph

    G = nx.DiGraph([(1, 2), (2, 3), (2, 5), (3, 4), (4, 3)])
    want = {frozenset(e) for e in nx.moral_graph(G).edges()}
    mg = moral_graph(from_nx(spark, G))
    got = {
        frozenset((r["src"], r["dst"])) for r in mg.edges.select("src", "dst").collect()
    }
    assert got == want
    assert mg.directed is False


def test_moral_graph_gnp(spark):
    from linkgraph.algos.dag import moral_graph

    G = _gnp(25, 0.1, seed=43, directed=True)
    want = {frozenset(e) for e in nx.moral_graph(G).edges() if len(frozenset(e)) == 2}
    mg = moral_graph(from_nx(spark, G))
    got = {
        frozenset((r["src"], r["dst"]))
        for r in mg.edges.select("src", "dst").collect()
        if r["src"] != r["dst"]
    }
    assert got == want


def test_dominating_set(spark):
    G = _gnp(40, 0.1, seed=47)
    G.add_node(99)
    ds = {r["id"] for r in SEL.dominating_set(from_nx(spark, G)).collect()}
    assert nx.is_dominating_set(G, ds)
