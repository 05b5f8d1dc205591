"""Parity for the fixture/lattice/harary generator batch."""

from __future__ import annotations

import networkx as nx
import pytest

import linkgraph as lg


def _edges(g):
    return {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g.edges.collect()
    }


def test_fixed_small_graphs(spark):
    for mine, ref in [
        (lg.chvatal_graph(spark), nx.chvatal_graph()),
        (lg.tutte_graph(spark), nx.tutte_graph()),
        (lg.truncated_cube_graph(spark), nx.truncated_cube_graph()),
    ]:
        assert _edges(mine) == {tuple(sorted(e)) for e in ref.edges}
        assert mine.number_of_nodes() == ref.number_of_nodes()


def test_hoffman_singleton(spark):
    g = lg.hoffman_singleton_graph(spark)
    assert g.number_of_nodes() == 50
    assert g.number_of_edges() == 175
    # the Moore graph is strongly regular (50, 7, 0, 1)
    assert lg.is_strongly_regular(g)
    degs = {r["degree"] for r in lg.degrees(g).collect()}
    assert degs == {7}
    from linkgraph.algos.girth import girth

    assert girth(g) == 5


def test_dorogovtsev_goltsev_mendes(spark):
    for n in (1, 2, 3):
        mine = lg.dorogovtsev_goltsev_mendes_graph(spark, n)
        ref = nx.dorogovtsev_goltsev_mendes_graph(n)
        assert _edges(mine) == {tuple(sorted(e)) for e in ref.edges}


def test_sudoku_graph(spark):
    for n in (2, 3):
        mine = lg.sudoku_graph(spark, n)
        ref = nx.sudoku_graph(n)
        assert _edges(mine) == {tuple(sorted(e)) for e in ref.edges}


def test_lattices(spark):
    for m, n in [(2, 3), (3, 4), (3, 5)]:
        mine = lg.triangular_lattice_graph(spark, m, n)
        ref = nx.convert_node_labels_to_integers(
            nx.triangular_lattice_graph(m, n), ordering="sorted"
        )
        assert _edges(mine) == {tuple(sorted(e)) for e in ref.edges}
        mineh = lg.hexagonal_lattice_graph(spark, m, n)
        refh = nx.convert_node_labels_to_integers(
            nx.hexagonal_lattice_graph(m, n), ordering="sorted"
        )
        assert _edges(mineh) == {tuple(sorted(e)) for e in refh.edges}


def test_harary_graphs(spark):
    for k, n in [(3, 8), (4, 9), (5, 9), (2, 5)]:
        mine = lg.hkn_harary_graph(spark, k, n)
        ref = nx.hkn_harary_graph(k, n)
        assert _edges(mine) == {tuple(sorted(e)) for e in ref.edges}, (k, n)
    for n, m in [(8, 13), (5, 5), (7, 16), (6, 8)]:
        mine = lg.hnm_harary_graph(spark, n, m)
        ref = nx.hnm_harary_graph(n, m)
        assert _edges(mine) == {tuple(sorted(e)) for e in ref.edges}, (n, m)


def test_triad_graph(spark):
    for name in nx.algorithms.triads.TRIAD_NAMES:
        mine = lg.triad_graph(spark, name)
        ref = nx.triad_graph(name)
        relab = {"a": 0, "b": 1, "c": 2}
        assert {(r["src"], r["dst"]) for r in mine.edges.collect()} == {
            (relab[u], relab[v]) for u, v in ref.edges
        }, name
        from linkgraph.algos.triads import triad_type

        if name != "003":
            assert triad_type(mine) == name


def test_all_triads(spark):
    D = nx.gnp_random_graph(6, 0.4, seed=3, directed=True)
    from linkgraph.graph import from_nx

    rows = lg.all_triads(from_nx(spark, D)).collect()
    import itertools

    assert len(rows) == len(list(itertools.combinations(range(6), 3)))
    for r in rows:
        trip = {r["u"], r["v"], r["w"]}
        ref_arcs = {
            (a, b) for a, b in D.edges if a in trip and b in trip and a != b
        }
        assert {(a["src"], a["dst"]) for a in r["arcs"]} == ref_arcs


def test_social_fixtures(spark):
    F = lg.florentine_families_graph(spark)
    refF = nx.florentine_families_graph()
    assert F.number_of_edges() == refF.number_of_edges()
    names = {r["name"] for r in F.vertices.collect()}
    assert names == set(refF)
    # structural parity through the name mapping
    name_of = {r["id"]: r["name"] for r in F.vertices.collect()}
    got = {
        frozenset((name_of[r["src"]], name_of[r["dst"]]))
        for r in F.edges.collect()
    }
    assert got == {frozenset(e) for e in refF.edges}

    D = lg.davis_southern_women_graph(spark)
    refD = nx.davis_southern_women_graph()
    assert D.number_of_edges() == refD.number_of_edges()
    name_of = {r["id"]: r["name"] for r in D.vertices.collect()}
    got = {
        frozenset((name_of[r["src"]], name_of[r["dst"]]))
        for r in D.edges.collect()
    }
    assert got == {frozenset(e) for e in refD.edges}

    L = lg.les_miserables_graph(spark)
    refL = nx.les_miserables_graph()
    name_of = {r["id"]: r["name"] for r in L.vertices.collect()}
    got = {
        frozenset((name_of[r["src"]], name_of[r["dst"]])): r["weight"]
        for r in L.edges.collect()
    }
    ref = {
        frozenset((u, v)): d["weight"] for u, v, d in refL.edges(data=True)
    }
    assert got == ref
