"""Chordal-graph recognition.

Reference: ``networkx/algorithms/chordal.py`` ``is_chordal`` (MCS-based
perfect-elimination-ordering test, Tarjan & Yannakakis 1984). MCS numbers
vertices one at a time by maximum weight — inherently sequential, so the
test runs driver-side under the usual size guard (the DFS-family pattern).

Algorithm: Maximum Cardinality Search numbers vertices n..1 (weight = #
numbered neighbors, ties toward the smallest id); the graph is chordal
iff the resulting order is a perfect elimination ordering, i.e. for every
vertex v the earliest-numbered later neighbor u of v is adjacent to every
other later neighbor of v — checked in O(Σ deg²) worst case.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph import SparkGraph

__all__ = ["is_chordal"]


def is_chordal(g: SparkGraph, *, max_driver_edges: int = 5_000_000) -> bool:
    """``nx.is_chordal`` twin. Directed input raises like the reference
    (``chordal.py`` is ``@not_implemented_for("directed")``)."""
    from linkgraph.exceptions import NotImplementedForDirected

    if g.directed:
        raise NotImplementedForDirected(
            "is_chordal: not implemented for directed type"
        )
    arcs = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    m = arcs.count()
    if m > max_driver_edges:
        raise ValueError(
            f"chordality testing (MCS) is sequential; the driver kernel "
            f"collects the edge list, but {m} edges > max_driver_edges="
            f"{max_driver_edges}."
        )
    adj: dict = {}
    for r in arcs.collect():
        adj.setdefault(r["u"], set()).add(r["v"])
        adj.setdefault(r["v"], set()).add(r["u"])
    nodes = sorted(r["id"] for r in g.vertices.select("id").collect())
    for n_ in nodes:
        adj.setdefault(n_, set())
    n = len(nodes)
    if n <= 3:
        return True

    # Maximum Cardinality Search with a bucket queue (O(n + m))
    weight = {v: 0 for v in nodes}
    buckets: dict = {0: set(nodes)}
    maxw = 0
    number: dict = {}
    order = []
    for k in range(n, 0, -1):
        while maxw >= 0 and not buckets.get(maxw):
            maxw -= 1
        v = min(buckets[maxw])
        buckets[maxw].discard(v)
        number[v] = k
        order.append(v)
        for w in adj[v]:
            if w in number:
                continue
            buckets[weight[w]].discard(w)
            weight[w] += 1
            buckets.setdefault(weight[w], set()).add(w)
            if weight[w] > maxw:
                maxw = weight[w]

    # PEO verification: order[] is numbered n..1; elimination order is the
    # reverse. For v, the later (higher-numbered) neighbors must form a
    # clique "anchored" at the earliest of them.
    for v in nodes:
        later = [w for w in adj[v] if number[w] > number[v]]
        if len(later) <= 1:
            continue
        u = min(later, key=lambda w: number[w])
        for w in later:
            if w != u and w not in adj[u]:
                return False
    return True
