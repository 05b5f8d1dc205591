"""Shortest-path reconstruction and the reference's named path API.

Reference: ``networkx/algorithms/shortest_paths/`` — ``generic.py:285``
``shortest_path``, ``unweighted.py`` (``single_source_shortest_path_length``,
``all_pairs_shortest_path_length``, ``bidirectional_shortest_path``,
``predecessor``), ``weighted.py`` (``dijkstra_path``,
``dijkstra_path_length``, ``bellman_ford_path``,
``bellman_ford_path_length``), ``breadth_first_search.py``
(``bfs_predecessors``, ``bfs_successors``).

Distances come from the two existing distributed kernels (frontier BFS,
Bellman–Ford relaxation). Path RECONSTRUCTION adds one join: a parent of
v is any in-neighbor u with ``dist(u) + w(u, v) == dist(v)`` — computed
for every node at once (the distributed shortest-path TREE), after which
extracting one s→t path is a driver walk over the collected parent map
(size-guarded; the map is n rows — the path API is for point lookups, the
tree DataFrame is the scale object).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph, resolve_weight_column

__all__ = [
    "shortest_path_tree",
    "shortest_path",
    "single_source_shortest_path_length",
    "all_pairs_shortest_path_length",
    "bidirectional_shortest_path",
    "dijkstra_path",
    "dijkstra_path_length",
    "bellman_ford_path",
    "bellman_ford_path_length",
    "predecessor",
    "bfs_predecessors",
    "bfs_successors",
    "is_path",
    "is_simple_path",
    "path_weight",
]


def _distances(g: SparkGraph, source, weight):
    if weight is None:
        from linkgraph.algos.setops import shortest_path_lengths

        d = shortest_path_lengths(g, [source]).select(
            "id", F.col("distance").cast("double").alias("distance")
        )
        wcol = F.lit(1.0)
    else:
        from linkgraph.algos.sssp import weighted_shortest_path_lengths

        d = weighted_shortest_path_lengths(g, [source], weight=weight)
        wcol = None
    return d, wcol


def shortest_path_tree(
    g: SparkGraph, source, *, weight=None, tol: float = 1e-9
) -> DataFrame:
    """(id, distance, parent): the single-source shortest-path tree —
    parent = the smallest in-neighbor u with dist(u) + w(u, v) = dist(v)
    (deterministic tie-break). One distance fixpoint + one arc⋈distance
    join; the source row carries a null parent."""
    base = g.symmetric_edges() if not g.directed else g.edges
    if weight is None:
        arcs = base.select("src", "dst", F.lit(1.0).alias("w"))
    else:
        arcs = base.select(
            "src", "dst", resolve_weight_column(base, weight).alias("w")
        )
    d, _ = _distances(g, source, weight)
    d = d.persist()
    du = d.select(F.col("id").alias("src"), F.col("distance").alias("ds"))
    dv = d.select(F.col("id").alias("dst"), F.col("distance").alias("dv"))
    parents = (
        arcs.join(du, "src")
        .join(dv, "dst")
        .filter(F.col("ds") + F.col("w") <= F.col("dv") + F.lit(tol))
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").alias("parent"))
    )
    return d.join(parents, "id", "left").select("id", "distance", "parent")


def shortest_path(
    g: SparkGraph,
    source,
    target,
    *,
    weight=None,
    max_driver_nodes: int = 5_000_000,
) -> "list[int]":
    """The s→t shortest path as a node list (``generic.py:285`` with both
    endpoints given; ``weight=None`` hops, else the weighted kernel).
    Raises when no path exists, like the reference's ``NetworkXNoPath``."""
    source, target = int(source), int(target)
    tree = shortest_path_tree(g, source, weight=weight)
    rows = tree.collect() if tree.count() <= max_driver_nodes else None
    if rows is None:
        raise NetworkXError(
            f"shortest_path tree exceeds max_driver_nodes={max_driver_nodes}; "
            "use shortest_path_tree (distributed) instead"
        )
    parent = {r["id"]: r["parent"] for r in rows}
    if target not in parent:
        raise NetworkXError(f"No path between {source} and {target}.")
    path = [target]
    while path[-1] != source:
        p = parent[path[-1]]
        if p is None:
            raise NetworkXError(f"No path between {source} and {target}.")
        path.append(p)
    return list(reversed(path))


def single_source_shortest_path_length(
    g: SparkGraph, source, cutoff: Optional[int] = None
) -> DataFrame:
    """(id, distance) — ``unweighted.py:12``."""
    from linkgraph.algos.setops import shortest_path_lengths

    return shortest_path_lengths(g, [source], max_depth=cutoff)


def all_pairs_shortest_path_length(g: SparkGraph, cutoff=None) -> DataFrame:
    """(src, id, distance) — ``unweighted.py:130``: the unit-weight case of
    the batched per-source Bellman-Ford (identical distances)."""
    from linkgraph.algos.sssp import all_pairs_bellman_ford_path_lengths

    out = all_pairs_bellman_ford_path_lengths(g, weight=F.lit(1.0))
    d = out.withColumn("distance", F.col("distance").cast("long"))
    if cutoff is not None:
        d = d.filter(F.col("distance") <= int(cutoff))
    return d


def bidirectional_shortest_path(g: SparkGraph, source, target) -> "list[int]":
    """``unweighted.py:223`` — result parity (the reference's two-frontier
    meet is a driver optimization; distances are identical)."""
    return shortest_path(g, source, target, weight=None)


def dijkstra_path(g: SparkGraph, source, target, *, weight=True) -> "list[int]":
    """``weighted.py:121`` (identical distances via Bellman-Ford)."""
    return shortest_path(g, source, target, weight=weight)


def dijkstra_path_length(g: SparkGraph, source, target, *, weight=True) -> float:
    """``weighted.py:202``."""
    from linkgraph.algos.sssp import weighted_shortest_path_lengths

    d = weighted_shortest_path_lengths(g, [source], weight=weight)
    row = d.filter(F.col("id") == int(target)).collect()
    if not row:
        raise NetworkXError(f"No path between {source} and {target}.")
    return float(row[0]["distance"])


def bellman_ford_path(g: SparkGraph, source, target, *, weight=True) -> "list[int]":
    """``weighted.py:2103``."""
    return shortest_path(g, source, target, weight=weight)


def bellman_ford_path_length(g: SparkGraph, source, target, *, weight=True) -> float:
    """``weighted.py:2155``."""
    return dijkstra_path_length(g, source, target, weight=weight)


def predecessor(g: SparkGraph, source) -> DataFrame:
    """(id, preds array<long>) — every BFS predecessor of each node
    (``unweighted.py:450`` ``predecessor``): dist join, preds(v) = sorted
    in-neighbors u with dist(u) + 1 = dist(v). The source row carries an
    empty array, like the reference's ``{source: []}``."""
    from linkgraph.algos.setops import shortest_path_lengths

    d = shortest_path_lengths(g, [source]).persist()
    base = g.symmetric_edges() if not g.directed else g.edges
    du = d.select(F.col("id").alias("src"), F.col("distance").alias("ds"))
    dv = d.select(F.col("id").alias("dst"), F.col("distance").alias("dv"))
    preds = (
        base.select("src", "dst")
        .join(du, "src")
        .join(dv, "dst")
        .filter(F.col("ds") + 1 == F.col("dv"))
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sort_array(F.collect_set("src")).alias("preds"))
    )
    return d.join(preds, "id", "left").select(
        "id",
        F.coalesce("preds", F.array().cast("array<long>")).alias("preds"),
    )


def bfs_predecessors(g: SparkGraph, source, *, depth_limit=None) -> DataFrame:
    """(id, pred): the BFS-tree parent of every reached node
    (``breadth_first_search.py:341``)."""
    from linkgraph.algos.setops import bfs_tree_edges

    return bfs_tree_edges(g, source, depth_limit=depth_limit).select(
        F.col("dst").alias("id"), F.col("src").alias("pred")
    )


def bfs_successors(g: SparkGraph, source, *, depth_limit=None) -> DataFrame:
    """(id, successors array<long>): BFS-tree children per expanded node
    (``breadth_first_search.py:392``)."""
    from linkgraph.algos.setops import bfs_tree_edges

    return (
        bfs_tree_edges(g, source, depth_limit=depth_limit)
        .groupBy(F.col("src").alias("id"))
        .agg(F.sort_array(F.collect_set("dst")).alias("successors"))
    )


def is_path(g: SparkGraph, path) -> bool:
    """True iff consecutive elements are joined by edges
    (``networkx/classes/function.py`` ``is_path``)."""
    path = [int(x) for x in path]
    if not path:
        return False
    if len(path) == 1:
        return g.vertices.filter(F.col("id") == path[0]).limit(1).count() > 0
    hops = g.spark.createDataFrame(
        list(zip(path, path[1:])), "src long, dst long"
    )
    arcs = g.symmetric_edges() if not g.directed else g.edges
    missing = hops.join(arcs.select("src", "dst"), ["src", "dst"], "left_anti")
    return missing.limit(1).count() == 0


def is_simple_path(g: SparkGraph, nodes) -> bool:
    """``networkx/algorithms/simple_paths.py:28`` ``is_simple_path`` —
    a path with no repeated nodes."""
    nodes = [int(x) for x in nodes]
    if len(nodes) != len(set(nodes)):
        return False
    return is_path(g, nodes)


def path_weight(g: SparkGraph, path, weight="weight") -> float:
    """Total weight along the path (``function.py`` ``path_weight``);
    raises when the path is broken, like the reference."""
    path = [int(x) for x in path]
    if not is_path(g, path):
        raise NetworkXError("path is not a valid path in the graph")
    if len(path) < 2:
        return 0.0
    hops = g.spark.createDataFrame(
        [(i, u, v) for i, (u, v) in enumerate(zip(path, path[1:]))],
        "i long, src long, dst long",
    )
    base = g.symmetric_edges() if not g.directed else g.edges
    arcs = base.select("src", "dst", resolve_weight_column(base, weight).alias("w"))
    # parallel edges coalesce to summed weight upstream; one row per hop
    tot = (
        hops.join(arcs, ["src", "dst"])
        .groupBy("i")
        .agg(F.min("w").alias("w"))
        .agg(F.sum("w"))
        .collect()[0][0]
    )
    return float(tot)
