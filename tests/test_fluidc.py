"""Validity/quality tests for asyn_fluidc (community/asyn_fluid.py:22).

The reference is RNG-scheduled by contract; the distributed twin pins the
defining invariants (true partition, exactly k nonempty communities,
determinism for a fixed seed, reference guards) and partition quality.
"""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError, NotImplementedForDirected
from linkgraph.algos.lpa_variants import asyn_fluidc
from linkgraph.algos.community import modularity


@pytest.mark.parametrize(
    "G,k",
    [
        (nx.karate_club_graph(), 2),
        (nx.barbell_graph(8, 2), 2),
        (nx.connected_watts_strogatz_graph(40, 4, 0.1, seed=3), 4),
    ],
)
def test_fluidc_partition_validity(spark, G, k):
    g = from_nx(spark, G)
    part = asyn_fluidc(g, k)
    rows = part.collect()
    assert len({r["id"] for r in rows}) == G.number_of_nodes()
    assert len(rows) == G.number_of_nodes()
    assert len({r["community"] for r in rows}) == k
    # quality: better than a random split on these modular fixtures
    assert modularity(g, part) > 0.2


def test_fluidc_deterministic(spark):
    G = nx.karate_club_graph()
    g = from_nx(spark, G)
    a = sorted((r["id"], r["community"]) for r in asyn_fluidc(g, 3).collect())
    b = sorted((r["id"], r["community"]) for r in asyn_fluidc(g, 3).collect())
    assert a == b


def test_fluidc_guards(spark):
    with pytest.raises(NetworkXError):
        asyn_fluidc(
            from_nx(spark, nx.disjoint_union(nx.path_graph(3), nx.path_graph(3))), 2
        )
    with pytest.raises(NetworkXError):
        asyn_fluidc(from_nx(spark, nx.path_graph(3)), 9)
    with pytest.raises(NotImplementedForDirected):
        asyn_fluidc(from_nx(spark, nx.DiGraph([(0, 1), (1, 2), (2, 0)])), 2)
