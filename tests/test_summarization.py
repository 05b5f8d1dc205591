"""Parity tests for dedensify and snap_aggregation vs the reference
(networkx/algorithms/summarization.py:70,411)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import from_nx, SparkGraph
from linkgraph.algos.summarization import dedensify, snap_aggregation


def _nx_dedensify_stats(G, threshold):
    H, comp = nx.dedensify(G, threshold)
    return len(comp), H.number_of_edges(), H.number_of_nodes()


def _redensify(g, comp):
    """Distributed inverse of dedensify: expand compressor nodes back."""
    cids = comp.select("id")
    arcs = g.edges if g.directed else g.symmetric_edges()
    arcs = arcs.select("src", "dst")
    into = comp.select(F.col("id").alias("dst"), "members")
    thru = (
        arcs.join(into, "dst")
        .select("src", F.explode("members").alias("dst"))
    )
    plain = (
        arcs.join(cids.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(cids.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .select("src", "dst")
    )
    out = plain.unionByName(thru)
    if not g.directed:
        out = out.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
    return set((r["src"], r["dst"]) for r in out.distinct().collect())


@pytest.mark.parametrize("directed", [True, False])
def test_dedensify_parity(spark, directed):
    G = nx.gnp_random_graph(40, 0.25, seed=7, directed=directed)
    g = from_nx(spark, G)
    want_ncomp, want_edges, want_nodes = _nx_dedensify_stats(G, 3)
    cg, comp = dedensify(g, 3)
    ncomp = comp.count()
    assert ncomp == want_ncomp
    assert cg.number_of_edges() == want_edges
    assert cg.number_of_nodes() == want_nodes
    # lossless: re-densification recovers the original edge set exactly
    orig = set(
        (min(u, v), max(u, v)) if not directed else (u, v) for u, v in G.edges()
    )
    assert _redensify(cg, comp) == orig


def test_dedensify_threshold_guard(spark):
    g = from_nx(spark, nx.path_graph(4))
    with pytest.raises(ValueError):
        dedensify(g, 1)


def _nx_snap_partition(G, node_attributes, edge_attributes=()):
    S = nx.snap_aggregation(
        G, node_attributes=node_attributes, edge_attributes=edge_attributes
    )
    part = frozenset(frozenset(d["group"]) for _, d in S.nodes(data=True))
    sedges = set()
    member_group = {}
    for sn, d in S.nodes(data=True):
        for m in d["group"]:
            member_group[m] = frozenset(d["group"])
    for u, v in S.edges():
        gu = frozenset(S.nodes[u]["group"])
        gv = frozenset(S.nodes[v]["group"])
        sedges.add(frozenset((gu, gv)))
    return part, sedges, member_group


def _spark_snap_partition(g, node_attributes, edge_attributes=()):
    supernodes, superedges, assignment = snap_aggregation(
        g, node_attributes, edge_attributes
    )
    rows = assignment.collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group"], set()).add(r["id"])
    part = frozenset(frozenset(v) for v in by_group.values())
    sedges = set()
    for r in superedges.collect():
        sedges.add(
            frozenset(
                (frozenset(by_group[r["group_u"]]), frozenset(by_group[r["group_v"]]))
            )
        )
    return part, sedges


def test_snap_docstring_example(spark):
    # the reference docstring fixture (summarization.py:478) with integer ids
    nodes = {0: "Red", 1: "Red", 2: "Red", 3: "Red", 4: "Blue", 5: "Blue"}
    edges = [(0, 4, "Strong"), (1, 5, "Strong"), (2, 4, "Weak"), (3, 5, "Weak")]
    G = nx.Graph()
    for n, c in nodes.items():
        G.add_node(n, color=c)
    for u, v, t in edges:
        G.add_edge(u, v, type=t)
    want_part, want_sedges, _ = _nx_snap_partition(G, ("color",), ("type",))

    g, _ = _from_nx_attrs(spark, G, ["color"], ["type"])
    part, sedges = _spark_snap_partition(g, ["color"], ["type"])
    assert part == want_part
    assert sedges == want_sedges


@pytest.mark.parametrize("directed", [False, True])
def test_snap_random_parity(spark, directed):
    G = nx.gnp_random_graph(30, 0.15, seed=11, directed=directed)
    for n in G.nodes:
        G.nodes[n]["kind"] = n % 3
    for u, v in G.edges:
        G.edges[u, v]["etype"] = (u + v) % 2
    want_part, want_sedges, _ = _nx_snap_partition(G, ("kind",), ("etype",))
    g, _ = _from_nx_attrs(spark, G, ["kind"], ["etype"])
    part, sedges = _spark_snap_partition(g, ["kind"], ["etype"])
    assert part == want_part
    assert sedges == want_sedges


def test_snap_no_edge_attrs(spark):
    G = nx.path_graph(8)
    for n in G.nodes:
        G.nodes[n]["kind"] = 0
    want_part, want_sedges, _ = _nx_snap_partition(G, ("kind",))
    g, _ = _from_nx_attrs(spark, G, ["kind"], [])
    part, sedges = _spark_snap_partition(g, ["kind"])
    assert part == want_part
    assert sedges == want_sedges


def _from_nx_attrs(spark, G, node_attrs, edge_attrs):
    """from_nx plus typed node/edge attribute columns."""
    g = from_nx(spark, G)
    if node_attrs:
        rows = [(int(n),) + tuple(G.nodes[n][a] for a in node_attrs) for n in G.nodes]
        adf = spark.createDataFrame(rows, ["id"] + list(node_attrs))
        g = g.with_node_attrs(adf)
    if edge_attrs:
        rows = [
            (int(u), int(v)) + tuple(d[a] for a in edge_attrs)
            for u, v, d in G.edges(data=True)
        ]
        edf = spark.createDataFrame(rows, ["src", "dst"] + list(edge_attrs))
        g = g.with_edge_attrs(edf)
    return g, None
