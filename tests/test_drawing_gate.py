"""Drawing surface: matplotlib-gated name parity (``nx_pylab.py``)."""

import networkx as nx
import pytest

import linkgraph as lg
from linkgraph.graph import from_nx


def test_draw_raises_without_matplotlib(spark):
    g = from_nx(spark, nx.path_graph(3))
    with pytest.raises(ImportError):
        lg.draw(g)
    with pytest.raises(ImportError):
        lg.draw_circular(g)
    with pytest.raises(ImportError):
        lg.display(g)


def test_config_surface():
    assert hasattr(lg.config, "backends")
    assert hasattr(lg.config, "backend_priority")


def test_graph_atlas_declared_oos():
    with pytest.raises(NotImplementedError):
        lg.graph_atlas(5)
    with pytest.raises(NotImplementedError):
        lg.graph_atlas_g()
