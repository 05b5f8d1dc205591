"""Parity tests for is_d_separator vs the reference
(networkx/algorithms/d_separation.py)."""

import networkx as nx
import pytest

from linkgraph.exceptions import NetworkXError, NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.dseparation import is_d_separator


def _df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id bigint")


def _check(spark, G, x, y, z):
    g = from_nx(spark, G)
    got = is_d_separator(g, _df(spark, x), _df(spark, y), _df(spark, z))
    want = nx.is_d_separator(G, set(x), set(y), set(z))
    assert got == want, (x, y, z)


def test_chain_fork_collider(spark):
    # chain a->b->c: a ⟂ c | b, not a ⟂ c | {}
    chain = nx.DiGraph([(0, 1), (1, 2)])
    _check(spark, chain, [0], [2], [1])
    _check(spark, chain, [0], [2], [])
    # fork a<-b->c
    fork = nx.DiGraph([(1, 0), (1, 2)])
    _check(spark, fork, [0], [2], [1])
    _check(spark, fork, [0], [2], [])
    # collider a->b<-c: a ⟂ c | {}, NOT a ⟂ c | b
    coll = nx.DiGraph([(0, 1), (2, 1)])
    _check(spark, coll, [0], [2], [])
    _check(spark, coll, [0], [2], [1])
    # collider with descendant: conditioning on the descendant opens it
    coll2 = nx.DiGraph([(0, 1), (2, 1), (1, 3)])
    _check(spark, coll2, [0], [2], [3])


def _random_dag(n, p, seed):
    G = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    return nx.DiGraph((u, v) for u, v in G.edges() if u < v)


@pytest.mark.parametrize("seed", [3, 7, 11])
def test_random_dags(spark, seed):
    import random

    G = _random_dag(16, 0.18, seed)
    G.add_nodes_from(range(16))
    rng = random.Random(seed)
    nodes = list(G.nodes)
    for _ in range(6):
        pool = nodes[:]
        rng.shuffle(pool)
        x = pool[:2]
        y = pool[2:4]
        z = pool[4 : 4 + rng.randint(0, 4)]
        _check(spark, G, x, y, z)


def test_set_arguments_and_errors(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (3, 2)])
    g = from_nx(spark, G)
    with pytest.raises(NetworkXError):
        is_d_separator(g, _df(spark, [0]), _df(spark, [0]), _df(spark, [1]))
    with pytest.raises(ValueError):
        is_d_separator(g, _df(spark, [0]), _df(spark, [99]), _df(spark, [1]))
    cyc = from_nx(spark, nx.DiGraph([(0, 1), (1, 2), (2, 0), (4, 5)]))
    with pytest.raises(NetworkXError):
        is_d_separator(cyc, _df(spark, [4]), _df(spark, [5]), _df(spark, [0]))
    with pytest.raises(NotImplementedForDirected):
        is_d_separator(
            from_nx(spark, nx.path_graph(3)),
            _df(spark, [0]),
            _df(spark, [2]),
            _df(spark, [1]),
        )


# ---------------------- minimal d-separators --------------------------- #

from linkgraph.algos.dseparation import find_minimal_d_separator


def _minimal(spark, G, x, y, **kw):
    out = find_minimal_d_separator(from_nx(spark, G), _df(spark, x), _df(spark, y), **kw)
    return None if out is None else {r["id"] for r in out.collect()}


@pytest.mark.parametrize("seed", [3, 7, 11])
def test_find_minimal_matches_reference(spark, seed):
    import random

    G = _random_dag(14, 0.22, seed)
    G.add_nodes_from(range(14))
    rng = random.Random(seed)
    nodes = list(G.nodes)
    for _ in range(4):
        pool = nodes[:]
        rng.shuffle(pool)
        x, y = pool[:2], pool[2:4]
        want = nx.find_minimal_d_separator(G, set(x), set(y))
        got = _minimal(spark, G, x, y)
        assert got == want, (x, y)
        if got is not None:
            # and it separates (cross-checked through the other machinery)
            assert is_d_separator(
                from_nx(spark, G), _df(spark, x), _df(spark, y), _df(spark, got)
            )


def test_find_minimal_with_included(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (3, 1), (3, 4), (4, 2)])
    want = nx.find_minimal_d_separator(G, {0}, {2}, included={3})
    got = _minimal(
        spark, G, [0], [2], included=_df(spark, [3])
    )
    assert got == want


def test_find_minimal_none_when_adjacent(spark):
    G = nx.DiGraph([(0, 1), (0, 2), (2, 1)])
    assert nx.find_minimal_d_separator(G, {0}, {1}) is None
    assert _minimal(spark, G, [0], [1]) is None
