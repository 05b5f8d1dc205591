"""Joint-degree realization + directed degree-sequence generators
(``networkx/generators/{joint_degree_seq,degree_seq}.py``)."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph.random_graphs as rg
from linkgraph.joint_degree import (
    is_valid_joint_degree,
    joint_degree_graph,
    is_valid_directed_joint_degree,
    directed_joint_degree_graph,
)
from linkgraph.exceptions import NetworkXError


def _to_nx(g):
    G = nx.DiGraph() if g.directed else nx.Graph()
    G.add_nodes_from(r["id"] for r in g.vertices.select("id").collect())
    G.add_edges_from(
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    )
    return G


JD = {1: {4: 1}, 2: {2: 2, 3: 2, 4: 2}, 3: {2: 2, 4: 1}, 4: {1: 1, 2: 2, 3: 1}}


def test_is_valid_joint_degree_parity():
    assert is_valid_joint_degree(JD) == nx.is_valid_joint_degree(JD) is True
    bad = {1: {4: 1}, 2: {2: 3}}  # odd diagonal
    assert is_valid_joint_degree(bad) == nx.is_valid_joint_degree(bad) is False


def test_joint_degree_graph_realizes_matrix(spark):
    g = joint_degree_graph(spark, JD, seed=3)
    G = _to_nx(g)
    # the realized joint degree matrix equals the input exactly
    got = {}
    deg = dict(G.degree())
    for u, v in G.edges():
        k, l = deg[u], deg[v]
        got.setdefault(k, {}).setdefault(l, 0)
        got.setdefault(l, {}).setdefault(k, 0)
        got[k][l] += 1
        if k != l:
            got[l][k] += 1
        else:
            got[k][k] += 1
    want = {k: {l: v for l, v in row.items() if v} for k, row in JD.items()}
    want = {k: row for k, row in want.items() if row}
    assert got == want
    with pytest.raises(NetworkXError):
        joint_degree_graph(spark, {2: {2: 3}})


def test_is_valid_directed_joint_degree_parity():
    in_d = [0, 1, 1, 2]
    out_d = [2, 1, 1, 0]
    nkk = {1: {1: 2, 2: 0}, 2: {1: 0, 2: 2}}
    assert is_valid_directed_joint_degree(in_d, out_d, nkk) == \
        nx.is_valid_directed_joint_degree(in_d, out_d, nkk)


def test_directed_joint_degree_graph(spark):
    # build a target from a real digraph so it is guaranteed realizable
    H = nx.gnp_random_graph(12, 0.3, seed=5, directed=True)
    in_d = [d for _, d in sorted(H.in_degree())]
    out_d = [d for _, d in sorted(H.out_degree())]
    nkk = {}
    for u, v in H.edges():
        k, l = H.out_degree(u), H.in_degree(v)
        nkk.setdefault(k, {}).setdefault(l, 0)
        nkk[k][l] += 1
    assert nx.is_valid_directed_joint_degree(in_d, out_d, nkk)
    g = directed_joint_degree_graph(spark, in_d, out_d, nkk, seed=7)
    G = _to_nx(g)
    got = {}
    for u, v in G.edges():
        k, l = G.out_degree(u), G.in_degree(v)
        got.setdefault(k, {}).setdefault(l, 0)
        got[k][l] += 1
    assert got == nkk
    # in/out degree multisets preserved
    assert sorted(d for _, d in G.in_degree()) == sorted(in_d)
    assert sorted(d for _, d in G.out_degree()) == sorted(out_d)


def test_directed_configuration_model(spark):
    H = nx.gnp_random_graph(20, 0.2, seed=9, directed=True)
    din = [d for _, d in sorted(H.in_degree())]
    dout = [d for _, d in sorted(H.out_degree())]
    g = rg.directed_configuration_model(spark, din, dout, seed=11)
    # multiplicity-weighted degree sums match exactly
    out_sum = g.edges.groupBy("src").sum("weight").collect()
    outw = {r["src"]: r["sum(weight)"] for r in out_sum}
    total_out = sum(outw.values())
    assert total_out == sum(dout)
    in_sum = g.edges.groupBy("dst").sum("weight").collect()
    assert sum(r["sum(weight)"] for r in in_sum) == sum(din)
    with pytest.raises(NetworkXError):
        rg.directed_configuration_model(spark, [2, 1], [1, 1])


def test_directed_havel_hakimi(spark):
    H = nx.gnp_random_graph(15, 0.25, seed=13, directed=True)
    din = [d for _, d in sorted(H.in_degree())]
    dout = [d for _, d in sorted(H.out_degree())]
    g = rg.directed_havel_hakimi_graph(spark, din, dout)
    G = _to_nx(g)
    assert sorted(d for _, d in G.in_degree()) == sorted(din)
    assert sorted(d for _, d in G.out_degree()) == sorted(dout)
    assert nx.is_digraphical(din, dout)
    with pytest.raises(NetworkXError):
        rg.directed_havel_hakimi_graph(spark, [3, 3, 3], [1, 1, 1])
