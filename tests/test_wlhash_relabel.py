"""WL graph hash parity, relabeling, and reachability."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx, convert_node_labels_to_integers
from linkgraph.algos.wlhash import weisfeiler_lehman_graph_hash
from linkgraph.algos.setops import descendants, ancestors


def test_wl_hash_parity_undirected(spark):
    G = nx.gnp_random_graph(20, 0.2, seed=6)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = nx.weisfeiler_lehman_graph_hash(G)
    assert weisfeiler_lehman_graph_hash(from_nx(spark, G)) == want


def test_wl_hash_parity_directed(spark):
    G = nx.gnp_random_graph(15, 0.2, seed=12, directed=True)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = nx.weisfeiler_lehman_graph_hash(G)
    assert weisfeiler_lehman_graph_hash(from_nx(spark, G)) == want


def test_wl_hash_distinguishes_nonisomorphic(spark):
    a = weisfeiler_lehman_graph_hash(from_nx(spark, nx.path_graph(6)))
    b = weisfeiler_lehman_graph_hash(from_nx(spark, nx.cycle_graph(6)))
    assert a != b


def test_convert_node_labels_to_integers(spark):
    G = nx.Graph([(100, 250), (250, 7), (7, 100), (250, 999)])
    g, mapping = convert_node_labels_to_integers(from_nx(spark, G))
    ids = sorted(r["id"] for r in g.vertices.collect())
    assert ids == [0, 1, 2, 3]
    m = {r["old_id"]: r["new_id"] for r in mapping.collect()}
    assert m == {7: 0, 100: 1, 250: 2, 999: 3}  # ascending old-id order
    got = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g.edges.collect()
    }
    want = {
        (min(m[u], m[v]), max(m[u], m[v])) for u, v in G.edges()
    }
    assert got == want


def test_descendants_ancestors(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (3, 1), (2, 4), (5, 6)])
    g = from_nx(spark, G)
    assert {r["id"] for r in descendants(g, 0).collect()} == nx.descendants(G, 0)
    assert {r["id"] for r in ancestors(g, 4).collect()} == nx.ancestors(G, 4)


# ---------------------- WL subgraph hashes ----------------------------- #

from linkgraph.algos.wlhash import weisfeiler_lehman_subgraph_hashes


@pytest.mark.parametrize("directed", [False, True])
def test_wl_subgraph_hashes(spark, directed):
    G = nx.gnp_random_graph(18, 0.2, seed=11, directed=directed)
    want = nx.weisfeiler_lehman_subgraph_hashes(G, iterations=3)
    rows = weisfeiler_lehman_subgraph_hashes(
        from_nx(spark, G), iterations=3
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r["id"], {})[r["iteration"]] = r["subgraph_hash"]
    assert set(got) == set(want)
    for v, hashes in want.items():
        assert [got[v][i] for i in sorted(got[v])] == hashes


def test_wl_subgraph_hashes_rejects_nonpositive(spark):
    with pytest.raises(ValueError):
        weisfeiler_lehman_subgraph_hashes(from_nx(spark, nx.path_graph(3)), 0)
