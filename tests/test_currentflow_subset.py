"""Current-flow subset/approximate variants
(``networkx/algorithms/centrality/current_flow_betweenness*.py``).

The reference implementations require SciPy (absent); the subset forms
with S = T = V reduce exactly to the full current-flow betweenness
(whose values are pinned against the reference in earlier rounds), and
the approximation is statistically bounded around it.
"""

import networkx as nx
import pytest

import linkgraph as lg
from linkgraph.graph import from_nx


@pytest.mark.parametrize("G", [nx.cycle_graph(6), nx.wheel_graph(7)])
def test_subset_all_pairs_equals_full(spark, G):
    g = from_nx(spark, G)
    full = {
        r["id"]: r["betweenness"]
        for r in lg.current_flow_betweenness_centrality(g).collect()
    }
    nodes = sorted(G)
    sub = {
        r["id"]: r["betweenness"]
        for r in lg.current_flow_betweenness_centrality_subset(
            g, nodes, nodes
        ).collect()
    }
    for v in nodes:
        assert abs(full[v] - sub[v]) < 1e-6, (v, full[v], sub[v])


def test_edge_subset_all_pairs_equals_full(spark):
    G = nx.cycle_graph(6)
    g = from_nx(spark, G)
    full = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in lg.edge_current_flow_betweenness_centrality(g).collect()
    }
    nodes = sorted(G)
    sub = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in lg.edge_current_flow_betweenness_centrality_subset(
            g, nodes, nodes
        ).collect()
    }
    assert set(full) == set(sub)
    for e in full:
        assert abs(full[e] - sub[e]) < 1e-6


def test_subset_restricted_pairs_path(spark):
    # P4 0-1-2-3 with S={0}, T={3}: unit current crosses every edge ->
    # every edge flow |F_e(0)-F_e(3)| * 0.5 = 0.5; interior nodes get
    # 0.5+0.5 = 1.0 raw; normalization (N-1)(N-2)=6, correction 1/(2-4)
    G = nx.path_graph(4)
    g = from_nx(spark, G)
    out = {
        r["id"]: r["betweenness"]
        for r in lg.current_flow_betweenness_centrality_subset(
            g, [0], [3]
        ).collect()
    }
    assert abs(out[1] - (1.0 / 6 - 0.5)) < 1e-6
    assert abs(out[2] - (1.0 / 6 - 0.5)) < 1e-6
    assert abs(out[0] - (0.5 / 6 - 0.5)) < 1e-6


def test_approximate_tracks_full(spark):
    G = nx.wheel_graph(8)
    g = from_nx(spark, G)
    full = {
        r["id"]: r["betweenness"]
        for r in lg.current_flow_betweenness_centrality(g).collect()
    }
    approx = {
        r["id"]: r["betweenness"]
        for r in lg.approximate_current_flow_betweenness_centrality(
            g, epsilon=0.4, kmax=20000, seed=7
        ).collect()
    }
    n = len(full)
    eps_bound = 0.4 * n * (n - 1) / ((n - 1) * (n - 2))
    for v in full:
        assert abs(full[v] - approx[v]) <= eps_bound


def test_approximate_validation(spark):
    g = from_nx(spark, nx.cycle_graph(5))
    with pytest.raises(lg.NetworkXError):
        lg.approximate_current_flow_betweenness_centrality(g, epsilon=-1)
    with pytest.raises(lg.NetworkXError):
        lg.approximate_current_flow_betweenness_centrality(
            g, epsilon=0.01, kmax=5
        )
