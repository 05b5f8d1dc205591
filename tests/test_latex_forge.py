"""LaTeX export parity + spectral_graph_forge
(``networkx/drawing/nx_latex.py``, Baldesi et al. 2018)."""

import networkx as nx
import pytest

import linkgraph as lg
import linkgraph.random_graphs as rg
from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError


def test_to_latex_raw_parity_default_pos(spark):
    G = nx.path_graph(4)
    g = from_nx(spark, G)
    got = lg.to_latex_raw(g)
    want = nx.to_latex_raw(G, pos={})  # empty attr -> circular default
    assert got == want


def test_to_latex_raw_parity_explicit_pos(spark):
    G = nx.cycle_graph(5)
    g = from_nx(spark, G)
    pos = {i: (float(i), float(-i)) for i in G}
    got = lg.to_latex_raw(g, pos=pos)
    want = nx.to_latex_raw(G, pos=pos)
    assert got == want


def test_to_latex_document_parity(spark):
    G = nx.star_graph(3)
    g = from_nx(spark, G)
    pos = {i: (float(i), 0.0) for i in G}
    got = lg.to_latex(g, pos=pos, caption="cap", latex_label="fig:x")
    want = nx.to_latex(G, pos=pos, caption="cap", latex_label="fig:x")
    assert got == want


def test_write_latex(tmp_path, spark):
    G = nx.path_graph(3)
    g = from_nx(spark, G)
    pos = {i: (float(i), 0.0) for i in G}
    p = str(tmp_path / "fig.tex")
    lg.write_latex(g, p, pos=pos, as_document=False)
    assert open(p).read() == nx.to_latex(G, pos=pos, as_document=False)


def test_missing_pos_raises(spark):
    g = from_nx(spark, nx.path_graph(3))
    with pytest.raises(NetworkXError):
        lg.to_latex_raw(g, pos={0: (0, 0)})


def test_spectral_graph_forge(spark):
    G = nx.karate_club_graph()
    g = from_nx(spark, G)
    out = rg.spectral_graph_forge(spark, g, 0.8, seed=3)
    assert out.vertices.count() == G.number_of_nodes()
    # alpha=1 identity keeps B == A exactly -> same edge set
    out2 = rg.spectral_graph_forge(spark, g, 1.0, seed=3)
    got = {(r["src"], r["dst"]) for r in out2.edges.select("src", "dst").collect()}
    want = {(min(u, v), max(u, v)) for u, v in G.edges()}
    assert got == want
    with pytest.raises(NetworkXError):
        rg.spectral_graph_forge(spark, g, 0.5, transformation="bogus")
