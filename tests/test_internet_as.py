"""Internet AS topology generator (``networkx/generators/internet_as_graphs.py``)."""

import networkx as nx

import linkgraph as lg


def test_random_internet_as_graph(spark):
    g = lg.random_internet_as_graph(spark, 200, seed=3)
    assert g.vertices.count() == 200
    types = {r["id"]: r["type"] for r in g.vertices.select("id", "type").collect()}
    from collections import Counter

    c = Counter(types.values())
    # T in [4,6]; M = 0.15n; CP = 0.05n; rest C
    assert 4 <= c[0] <= 6
    assert c[1] == 30 and c[2] == 10
    assert c[3] == 200 - c[0] - 30 - 10
    rows = g.edges.collect()
    # tier-1 clique fully meshed with peer links
    t_nodes = [v for v, t in types.items() if t == 0]
    peer_pairs = {
        (r["src"], r["dst"]) for r in rows if r["etype"] == 1
    }
    for i, u in enumerate(t_nodes):
        for v in t_nodes[i + 1:]:
            assert (min(u, v), max(u, v)) in peer_pairs
    # transit links carry the customer id = one endpoint; connected graph
    for r in rows:
        if r["etype"] == 0:
            assert r["customer"] in (r["src"], r["dst"])
        else:
            assert r["customer"] == -1
    G = nx.Graph()
    G.add_nodes_from(types)
    G.add_edges_from((r["src"], r["dst"]) for r in rows)
    assert nx.is_connected(G)
