"""nx-named constructor facade parity (``networkx/convert.py:34``,
``networkx/classes/*.py`` — Graph/DiGraph/MultiGraph/MultiDiGraph and the
``to_networkx_graph`` dispatcher)."""

import networkx as nx
import pandas as pd
import pytest

import linkgraph as lg
from linkgraph.graph import SparkGraph
from linkgraph.multigraph import SparkMultiGraph


def _edge_set(g):
    return {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}


def test_empty_constructors(spark):
    g = lg.Graph(spark=spark)
    assert not g.directed and g.edges.count() == 0
    d = lg.DiGraph(spark=spark)
    assert d.directed
    m = lg.MultiGraph(spark=spark)
    assert isinstance(m, SparkMultiGraph) and not m.directed
    md = lg.MultiDiGraph(spark=spark)
    assert isinstance(md, SparkMultiGraph) and md.directed


def test_edge_iterable(spark):
    g = lg.Graph([(0, 1), (1, 2), (2, 0)], spark=spark)
    assert _edge_set(g) == {(0, 1), (1, 2), (0, 2)}
    d = lg.DiGraph([(2, 0), (0, 1)], spark=spark)
    assert _edge_set(d) == {(2, 0), (0, 1)}


def test_from_nx_graph(spark):
    G = nx.gnp_random_graph(12, 0.3, seed=1)
    g = lg.Graph(G, spark=spark)
    assert _edge_set(g) == {(min(u, v), max(u, v)) for u, v in G.edges()}
    d = lg.DiGraph(G, spark=spark)  # undirected nx -> directed: both arcs
    assert _edge_set(d) == {(u, v) for u, v in G.to_directed().edges()}


def test_dict_of_lists_and_dicts(spark):
    dol = {0: [1, 2], 1: [0], 2: [0]}
    g = lg.Graph(dol, spark=spark)
    assert _edge_set(g) == {(0, 1), (0, 2)}
    dod = {0: {1: {"weight": 2.0}}, 1: {0: {"weight": 2.0}}}
    g2 = lg.Graph(dod, spark=spark)
    assert _edge_set(g2) == {(0, 1)}


def test_pandas_edgelist(spark):
    df = pd.DataFrame({"source": [0, 1], "target": [1, 2]})
    g = lg.Graph(df, spark=spark)
    assert _edge_set(g) == {(0, 1), (1, 2)}


def test_sparkgraph_conversion_roundtrip(spark):
    g = lg.Graph([(0, 1), (1, 2)], spark=spark)
    d = lg.DiGraph(g, spark=spark)
    assert d.directed and _edge_set(d) == {(0, 1), (1, 0), (1, 2), (2, 1)}
    u = lg.Graph(d, spark=spark)
    assert not u.directed and _edge_set(u) == {(0, 1), (1, 2)}


def test_to_networkx_graph_numpy(spark):
    import numpy as np

    A = np.array([[0, 1, 0], [1, 0, 2], [0, 2, 0]], dtype=float)
    g = lg.to_networkx_graph(A, spark=spark)
    rows = {
        (r["src"], r["dst"]): r["weight"]
        for r in g.edges.select("src", "dst", "weight").collect()
    }
    assert rows == {(0, 1): 1.0, (1, 2): 2.0}


def test_bad_input_raises(spark):
    with pytest.raises(lg.NetworkXError):
        lg.to_networkx_graph(3.14, spark=spark)


def test_find_cliques_recursive_alias(spark):
    from linkgraph.graph import from_nx

    G = nx.gnp_random_graph(10, 0.5, seed=2)
    g = from_nx(spark, G)
    a = {tuple(sorted(r["members"])) for r in lg.find_cliques(g).collect()}
    b = {tuple(sorted(r["members"])) for r in lg.find_cliques_recursive(g).collect()}
    assert a == b and a == {tuple(sorted(c)) for c in nx.find_cliques(G)}
