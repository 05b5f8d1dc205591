"""SparkMultiGraph parity vs nx.MultiGraph / nx.MultiDiGraph."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.multigraph import SparkMultiGraph
from linkgraph.algos.degrees import degrees, out_degrees


EDGES = [
    (1, 2, 1.0),
    (1, 2, 2.0),
    (2, 1, 4.0),
    (2, 3, 1.0),
    (3, 3, 5.0),  # self-loop
    (3, 4, 1.0),
    (3, 4, 1.0),  # exact duplicate row: still two parallel edges
]


@pytest.fixture
def mg(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long, weight double")
    return SparkMultiGraph(e, directed=False)


@pytest.fixture
def MG():
    G = nx.MultiGraph()
    for u, v, w in EDGES:
        G.add_edge(u, v, weight=w)
    return G


def test_parallel_edges_kept(mg, MG):
    assert mg.number_of_edges() == MG.number_of_edges() == 7
    assert mg.is_multigraph() and not mg.to_simple().is_multigraph()


def test_keys_unique_per_pair(mg):
    rows = mg.edges.select("src", "dst", "key").collect()
    assert len({(r["src"], r["dst"], r["key"]) for r in rows}) == len(rows)
    keys_12 = sorted(
        r["key"] for r in rows if (r["src"], r["dst"]) == (1, 2)
    )
    assert keys_12 == [0, 1, 2]


def test_multigraph_degrees_match_nx(mg, MG):
    got = {r["id"]: r["degree"] for r in degrees(mg).collect()}
    assert got == dict(MG.degree())
    gotw = {r["id"]: r["degree"] for r in degrees(mg, weighted=True).collect()}
    assert gotw == dict(MG.degree(weight="weight"))


def test_multiplicity_table(mg, MG):
    m = {
        (r["src"], r["dst"]): r["multiplicity"]
        for r in mg.number_of_edges_between().collect()
    }
    assert m == {(1, 2): 3, (2, 3): 1, (3, 3): 1, (3, 4): 2}
    assert m[(1, 2)] == MG.number_of_edges(1, 2)


def test_to_simple_sums_weights(mg, MG):
    simple = mg.to_simple()
    got = {
        (r["src"], r["dst"]): r["weight"] for r in simple.edges.collect()
    }
    # the reference's multigraph->weighted collapse sums parallel weights
    want = {}
    for u, v, d in MG.edges(data=True):
        k = (min(u, v), max(u, v))
        want[k] = want.get(k, 0.0) + d["weight"]
    assert got == want
    assert simple.number_of_edges() == 4


def test_remove_edges_by_key(mg, spark):
    t = spark.createDataFrame([(1, 2, 0), (3, 4, 1)], "src long, dst long, key long")
    g2 = mg.remove_edges_by_key(t)
    assert g2.number_of_edges() == 5
    m = {
        (r["src"], r["dst"]): r["multiplicity"]
        for r in g2.number_of_edges_between().collect()
    }
    assert m[(1, 2)] == 2 and m[(3, 4)] == 1


def test_directed_multigraph(spark):
    e = spark.createDataFrame(
        [(1, 2, 1.0), (1, 2, 2.0), (2, 1, 3.0)], "src long, dst long, weight double"
    )
    mg = SparkMultiGraph(e, directed=True)
    MG = nx.MultiDiGraph()
    for u, v, w in [(1, 2, 1.0), (1, 2, 2.0), (2, 1, 3.0)]:
        MG.add_edge(u, v, weight=w)
    assert mg.number_of_edges() == MG.number_of_edges() == 3
    got = {r["id"]: r["degree"] for r in out_degrees(mg).collect()}
    assert got == dict(MG.out_degree())


def test_multigraph_attrs_and_subgraph(spark):
    e = spark.createDataFrame(
        [(1, 2, 1.0, "a"), (1, 2, 1.0, "b"), (2, 3, 1.0, "c")],
        "src long, dst long, weight double, tag string",
    )
    mg = SparkMultiGraph(e, directed=False)
    assert mg.edge_attr_names == ["tag"]
    tags = sorted(
        r["tag"] for r in mg.edges.filter(
            (F.col("src") == 1) & (F.col("dst") == 2)
        ).collect()
    )
    assert tags == ["a", "b"]
    sub = mg.subgraph(spark.createDataFrame([(1,), (2,)], "id long"))
    assert sub.edges.count() == 2
