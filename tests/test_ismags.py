"""ISMAGS parity vs the reference (``isomorphism/ismags.py``): induced
embeddings, symmetry-reduced enumeration, largest_common_subgraph.

Symmetry representatives may legally differ between implementations (any
one element of each orbit), so comparisons canonicalize each mapping to
the lexicographically-smallest member of its orbit under the reference's
own subgraph automorphisms before comparing sets.
"""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import from_nx, SparkGraph
from linkgraph.algos.isomorphism import ISMAGS, categorical_node_match


def _canon(mappings, autos):
    out = set()
    for m in mappings:
        orbit = [
            tuple(sorted((g, a[s]) for g, s in m.items())) for a in autos
        ]
        out.add(min(orbit))
    return out


def _autos_nx(S):
    return [
        dict(m)
        for m in nx.isomorphism.ISMAGS(S, S).isomorphisms_iter(symmetry=False)
    ]


@pytest.mark.parametrize(
    "gname,sname",
    [
        ("k4", "k3"),
        ("c4", "p3"),
        ("c5", "p4"),
        ("petersen", "c5"),
    ],
)
def test_find_isomorphisms_parity(spark, gname, sname):
    builders = {
        "k4": lambda: nx.complete_graph(4),
        "k3": lambda: nx.complete_graph(3),
        "c4": lambda: nx.cycle_graph(4),
        "c5": lambda: nx.cycle_graph(5),
        "p3": lambda: nx.path_graph(3),
        "p4": lambda: nx.path_graph(4),
        "petersen": lambda: nx.petersen_graph(),
    }
    G, S = builders[gname](), builders[sname]()
    ref = nx.isomorphism.ISMAGS(G, S)
    ours = ISMAGS(from_nx(spark, G), from_nx(spark, S))
    autos = _autos_nx(S)

    got_all = list(ours.find_isomorphisms(symmetry=False))
    want_all = [dict(m) for m in ref.find_isomorphisms(symmetry=False)]
    assert {tuple(sorted(m.items())) for m in got_all} == {
        tuple(sorted(m.items())) for m in want_all
    }

    got_sym = list(ours.find_isomorphisms(symmetry=True))
    want_sym = [dict(m) for m in ref.find_isomorphisms(symmetry=True)]
    assert len(got_sym) == len(want_sym)
    assert _canon(got_sym, autos) == _canon(want_sym, autos)


def test_induced_semantics(spark):
    # no induced P3 inside a triangle
    ours = ISMAGS(
        from_nx(spark, nx.complete_graph(3)), from_nx(spark, nx.path_graph(3))
    )
    assert list(ours.find_isomorphisms(symmetry=False)) == []
    assert not ours.subgraph_is_isomorphic()


def test_full_iso_symmetry_quotient(spark):
    G = nx.cycle_graph(4)
    ours = ISMAGS(from_nx(spark, G), from_nx(spark, G))
    assert len(list(ours.isomorphisms_iter(symmetry=False))) == 8
    assert len(list(ours.isomorphisms_iter(symmetry=True))) == 1
    assert ours.is_isomorphic()


def test_size_mismatch_isomorphisms_empty(spark):
    ours = ISMAGS(
        from_nx(spark, nx.cycle_graph(4)), from_nx(spark, nx.path_graph(3))
    )
    assert list(ours.isomorphisms_iter(symmetry=False)) == []
    assert ours.subgraph_is_isomorphic()


@pytest.mark.parametrize(
    "G,S",
    [
        (nx.path_graph(4), nx.cycle_graph(4)),
        (nx.star_graph(3), nx.path_graph(4)),
        (nx.complete_graph(4), nx.cycle_graph(5)),
    ],
)
def test_largest_common_subgraph_parity(spark, G, S):
    ref = nx.isomorphism.ISMAGS(G, S)
    ours = ISMAGS(from_nx(spark, G), from_nx(spark, S))
    autos = _autos_nx(S)
    want_ns = [dict(m) for m in ref.largest_common_subgraph(symmetry=False)]
    got_ns = list(ours.largest_common_subgraph(symmetry=False))
    assert {tuple(sorted(m.items())) for m in got_ns} == {
        tuple(sorted(m.items())) for m in want_ns
    }
    want = [dict(m) for m in ref.largest_common_subgraph(symmetry=True)]
    got = list(ours.largest_common_subgraph(symmetry=True))
    assert len(got) == len(want)
    assert _canon(got, autos) == _canon(want, autos)


def test_lcs_with_node_match(spark):
    nm = categorical_node_match("color", None)
    G = nx.path_graph(3)
    H = nx.path_graph(3)
    for i, c in enumerate("aba"):
        G.nodes[i]["color"] = c
    for i, c in enumerate("aab"):
        H.nodes[i]["color"] = c
    want = [
        dict(m)
        for m in nx.isomorphism.ISMAGS(G, H, node_match=nm).largest_common_subgraph()
    ]
    g = SparkGraph(
        spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long"),
        vertices=spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "a")], "id long, color string"
        ),
        directed=False,
        coalesce_edges=False,
    )
    h = SparkGraph(
        spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long"),
        vertices=spark.createDataFrame(
            [(0, "a"), (1, "a"), (2, "b")], "id long, color string"
        ),
        directed=False,
        coalesce_edges=False,
    )
    got = list(ISMAGS(g, h, node_match=nm).largest_common_subgraph())
    assert len(got) == len(want)
    # colored automorphisms of H: identity only (colors a,a,b on a path)
    assert {tuple(sorted(m.items())) for m in got} == {
        tuple(sorted(m.items())) for m in want
    }
