"""describe(), matrix bridges, and generic shortest-path dispatch vs nx."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import from_nx
from linkgraph.describe import describe, _is_bipartite
from linkgraph.convert_matrix import (
    to_csr_arrays,
    to_numpy_array,
    from_numpy_array,
)
from linkgraph.algos.sssp import shortest_path_length


def test_describe_path_graph(spark):
    G = nx.path_graph(5)
    g = from_nx(spark, G)
    row = describe(g).first()
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 4
    assert row["directed"] is False
    assert row["avg_degree"] == pytest.approx(1.6)
    assert (row["min_degree"], row["max_degree"]) == (1, 2)
    assert row["n_components"] == 1
    assert row["is_tree"] is True
    assert row["density"] == pytest.approx(nx.density(G))


def test_describe_directed_with_cycle(spark):
    G = nx.cycle_graph(4, create_using=nx.DiGraph)
    g = from_nx(spark, G)
    row = describe(g).first()
    assert row["directed"] is True
    assert row["n_edges"] == 4
    assert row["is_tree"] is False
    assert row["density"] == pytest.approx(nx.density(G))


@pytest.mark.parametrize("n, bip", [(6, True), (5, False)])
def test_is_bipartite_cycles(spark, n, bip):
    # even cycles are bipartite, odd are not
    g = from_nx(spark, nx.cycle_graph(n))
    assert _is_bipartite(g) is bip


def test_csr_matches_nx(spark):
    G = nx.gnp_random_graph(25, 0.2, seed=7)
    for u, v in G.edges():
        G[u][v]["weight"] = float((u + v) % 5 + 1)
    g = from_nx(spark, G)
    A_nx = nx.to_numpy_array(G, nodelist=sorted(G))
    A = to_numpy_array(g, nodelist=sorted(G))
    np.testing.assert_allclose(A, A_nx)

    indptr, indices, data, ids = to_csr_arrays(g)
    assert list(ids) == sorted(G)
    # row sums == weighted degrees
    row_sums = np.add.reduceat(data, indptr[:-1]) * (np.diff(indptr) > 0)
    wdeg = np.array([G.degree(v, weight="weight") for v in sorted(G)], dtype=float)
    np.testing.assert_allclose(row_sums, wdeg)


def test_numpy_roundtrip(spark):
    G = nx.gnp_random_graph(15, 0.3, seed=3)
    g = from_nx(spark, G)
    A = to_numpy_array(g)
    g2 = from_numpy_array(spark, A, directed=False)
    A2 = to_numpy_array(g2)
    np.testing.assert_allclose(A, A2)


def test_dispatch_unweighted_vs_weighted(spark):
    G = nx.path_graph(6)
    for u, v in G.edges():
        G[u][v]["weight"] = 2.0
    g = from_nx(spark, G)
    unw = {r["id"]: r["distance"] for r in shortest_path_length(g, [0]).collect()}
    assert unw == nx.single_source_shortest_path_length(G, 0)
    w = {
        r["id"]: r["distance"]
        for r in shortest_path_length(g, [0], weight=True).collect()
    }
    assert w == nx.single_source_dijkstra_path_length(G, 0)
