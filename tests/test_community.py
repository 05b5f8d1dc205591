"""Parity tests for modularity (exact) and Louvain (validity + quality)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import from_nx
from linkgraph.algos.community import modularity, louvain_communities


def _part_df(spark, parts):
    rows = [(n, i) for i, com in enumerate(parts) for n in com]
    return spark.createDataFrame(rows, "id long, community long")


# ----------------------------- modularity ----------------------------- #


def test_modularity_karate_exact(spark):
    G = nx.karate_club_graph()
    parts = list(nx.community.label_propagation_communities(G))
    want = nx.community.modularity(G, parts)
    got = modularity(from_nx(spark, G), _part_df(spark, parts))
    assert got == pytest.approx(want, abs=1e-12)


def test_modularity_resolution_and_weights(spark):
    G = nx.Graph()
    G.add_weighted_edges_from(
        [(0, 1, 2.0), (1, 2, 0.5), (2, 0, 1.5), (3, 4, 3.0), (4, 4, 1.0)]
    )
    parts = [{0, 1, 2}, {3, 4}]
    for gamma in (0.5, 1.0, 2.0):
        want = nx.community.modularity(G, parts, resolution=gamma)
        got = modularity(
            from_nx(spark, G), _part_df(spark, parts), resolution=gamma
        )
        assert got == pytest.approx(want, abs=1e-12), gamma


def test_modularity_directed(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3)])
    parts = [{0, 1, 2}, {3, 4}]
    want = nx.community.modularity(G, parts)
    got = modularity(from_nx(spark, G), _part_df(spark, parts))
    assert got == pytest.approx(want, abs=1e-12)


def test_modularity_not_a_partition_raises(spark):
    G = nx.path_graph(4)
    bad = _part_df(spark, [{0, 1}, {2}])  # node 3 missing
    with pytest.raises(ValueError, match="partition"):
        modularity(from_nx(spark, G), bad)
    dup = _part_df(spark, [{0, 1, 2}, {2, 3}])  # node 2 twice
    with pytest.raises(ValueError, match="partition"):
        modularity(from_nx(spark, G), dup)


# ------------------------------ louvain ------------------------------- #


def _louvain_parts(df):
    parts = {}
    for r in df.collect():
        parts.setdefault(r["community"], set()).add(r["id"])
    return list(parts.values())


def test_louvain_is_valid_partition_and_quality(spark):
    G = nx.karate_club_graph()
    g = from_nx(spark, G)
    df = louvain_communities(g, seed=7)
    parts = _louvain_parts(df)
    # valid partition of the node set
    assert sorted(n for com in parts for n in com) == sorted(G.nodes())
    # quality: within 90% of the reference's louvain modularity
    q = nx.community.modularity(G, parts)
    ref_parts = nx.community.louvain_communities(G, seed=1)
    q_ref = nx.community.modularity(G, ref_parts)
    assert q >= 0.9 * q_ref
    # community labels are min member ids
    for com in parts:
        df_label = [
            r["community"] for r in df.collect() if r["id"] == min(com)
        ][0]
        assert df_label == min(com)


def test_louvain_deterministic_given_seed(spark):
    # max_level=2 keeps the double run cheap; determinism is per-round
    # (hash coins keyed on seed+round), so two levels exercise it fully.
    G = nx.gnp_random_graph(30, 0.12, seed=5)
    g = from_nx(spark, G)
    a = sorted(
        (r["id"], r["community"])
        for r in louvain_communities(g, seed=3, max_level=2).collect()
    )
    b = sorted(
        (r["id"], r["community"])
        for r in louvain_communities(g, seed=3, max_level=2).collect()
    )
    assert a == b


def test_louvain_two_cliques_bridge(spark):
    # Two 6-cliques joined by one edge must separate into the two cliques.
    G = nx.disjoint_union(nx.complete_graph(6), nx.complete_graph(6))
    G.add_edge(0, 6)
    df = louvain_communities(from_nx(spark, G), seed=11)
    parts = _louvain_parts(df)
    assert sorted(map(sorted, parts)) == [list(range(6)), list(range(6, 12))]


def test_louvain_directed(spark):
    G = nx.DiGraph()
    for u in range(4):
        for v in range(4):
            if u != v:
                G.add_edge(u, v)
    for u in range(4, 8):
        for v in range(4, 8):
            if u != v:
                G.add_edge(u, v)
    G.add_edge(0, 4)
    df = louvain_communities(from_nx(spark, G), seed=2)
    parts = _louvain_parts(df)
    assert sorted(map(sorted, parts)) == [[0, 1, 2, 3], [4, 5, 6, 7]]


def test_leiden_communities_connected_and_dominates_louvain(spark):
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.community import (
        louvain_communities,
        leiden_communities,
        modularity,
    )

    G = nx.planted_partition_graph(4, 15, 0.6, 0.04, seed=11)
    G = nx.convert_node_labels_to_integers(G)
    g = from_nx(spark, G)
    lou = louvain_communities(g, seed=5)
    lei = leiden_communities(g, seed=5)
    # partition validity
    assert lei.count() == G.number_of_nodes()
    assert lei.select("id").distinct().count() == G.number_of_nodes()
    # the Leiden guarantee: every community is internally connected
    groups = {}
    for r in lei.collect():
        groups.setdefault(r["community"], set()).add(r["id"])
    for members in groups.values():
        assert nx.is_connected(G.subgraph(members))
    # quality: refinement never loses to Louvain on the same seed
    q_lou = modularity(g, lou.select("id", "community"))
    q_lei = modularity(g, lei.select("id", "community"))
    assert q_lei >= q_lou - 1e-9
    # and both find real structure
    assert q_lei > 0.3


def test_leiden_splits_disconnected_community(spark):
    # two disjoint triangles forced into one community by construction:
    # the refinement pass must split them
    import networkx as nx
    from linkgraph.graph import from_nx
    from linkgraph.algos.community import leiden_communities

    G = nx.Graph()
    G.add_edges_from([(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)])
    g = from_nx(spark, G)
    lei = leiden_communities(g, seed=1)
    comms = {}
    for r in lei.collect():
        comms.setdefault(r["community"], set()).add(r["id"])
    for members in comms.values():
        assert nx.is_connected(G.subgraph(members))
    assert {0, 1, 2} in comms.values() and {10, 11, 12} in comms.values()
