"""Parity tests for bounded all_simple_paths (simple_paths.py:63)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.simplepaths import all_simple_paths


def _got(spark, G, s, t, cutoff):
    rows = all_simple_paths(from_nx(spark, G), s, t, cutoff).collect()
    return sorted(tuple(r["path"]) for r in rows)


@pytest.mark.parametrize("directed", [False, True])
def test_all_simple_paths(spark, directed):
    G = nx.gnp_random_graph(12, 0.25, seed=7, directed=directed)
    got = _got(spark, G, 0, 5, 5)
    want = sorted(tuple(p) for p in nx.all_simple_paths(G, 0, 5, cutoff=5))
    assert got == want


def test_all_simple_paths_small(spark):
    G = nx.Graph([(0, 1), (1, 2), (0, 2), (2, 3)])
    got = _got(spark, G, 0, 3, 3)
    want = sorted(tuple(p) for p in nx.all_simple_paths(G, 0, 3, cutoff=3))
    assert got == want
    with pytest.raises(ValueError):
        all_simple_paths(from_nx(spark, G), 0, 99, 3)
    with pytest.raises(ValueError):
        all_simple_paths(from_nx(spark, G), 0, 3, 0)
