"""Parity tests for the bipartite clustering family vs the reference
(bipartite/cluster.py, bipartite/basic.py)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.bipartite import (
    latapy_clustering,
    average_bipartite_clustering,
    robins_alexander_clustering,
    bipartite_density,
    bipartite_degrees,
    maximum_matching,
)


def _B(seed=3, n1=7, n2=8, m=20):
    return nx.bipartite.gnmk_random_graph(n1, n2, m, seed=seed)


@pytest.mark.parametrize("mode", ["dot", "min", "max"])
def test_latapy_clustering_parity(spark, mode):
    G = _B()
    g = from_nx(spark, G)
    want = nx.bipartite.latapy_clustering(G, mode=mode)
    got = {r["id"]: r["clustering"] for r in latapy_clustering(g, mode=mode).collect()}
    for n, w in want.items():
        assert got[n] == pytest.approx(w), n


def test_average_clustering(spark):
    G = _B(5)
    g = from_nx(spark, G)
    top = [n for n, d in G.nodes(data=True) if d["bipartite"] == 0]
    want = nx.bipartite.average_clustering(G)
    assert average_bipartite_clustering(g) == pytest.approx(want)
    tdf = g.spark.createDataFrame([(int(t),) for t in top], "id long")
    want_top = nx.bipartite.average_clustering(G, nodes=top)
    assert average_bipartite_clustering(g, tdf) == pytest.approx(want_top)


def test_robins_alexander_parity(spark):
    for seed in (7, 9):
        G = _B(seed, 6, 6, 14)
        g = from_nx(spark, G)
        assert robins_alexander_clustering(g) == pytest.approx(
            nx.bipartite.robins_alexander_clustering(G)
        )
    davis = nx.davis_southern_women_graph()
    davis = nx.relabel_nodes(
        davis, {n: i for i, n in enumerate(sorted(davis, key=str))}
    )
    g = from_nx(spark, davis)
    assert robins_alexander_clustering(g) == pytest.approx(
        nx.bipartite.robins_alexander_clustering(davis)
    )


def test_density_degrees(spark):
    G = _B(11)
    g = from_nx(spark, G)
    top = [n for n, d in G.nodes(data=True) if d["bipartite"] == 0]
    tdf = g.spark.createDataFrame([(int(t),) for t in top], "id long")
    assert bipartite_density(g, tdf) == pytest.approx(
        nx.bipartite.density(G, top)
    )
    degX, degY = bipartite_degrees(g, tdf)
    want_degX, want_degY = nx.bipartite.degrees(G, top)
    assert {r["id"]: r["degree"] for r in degY.collect()} == dict(want_degY)
    assert {r["id"]: r["degree"] for r in degX.collect()} == dict(want_degX)
