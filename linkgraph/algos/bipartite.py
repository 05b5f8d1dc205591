"""Bipartite projections — the web/co-occurrence graph construction.

Reference: ``networkx/algorithms/bipartite/projection.py`` —
``projected_graph`` (``:12``), ``weighted_projected_graph`` (``:90``,
weight = number of shared neighbors, or the ratio of that count to the
opposite-side size), ``overlap_weighted_projected_graph`` (``:244``,
Jaccard of neighborhoods). This family IS the engine's copurchase pattern
(items sharing an order) generalized.

Spark shape: one self-join of the arc table on the opposite-side node plus
a count aggregation — no iteration. The join key is the opposite-side
vertex, so power-law "hub" opposite nodes (an order containing thousands of
items) blow up quadratically; ``max_opposite_degree`` drops those hubs
before the join, the standard projection guard at crawl scale (a 100 TB
run would cap, then handle the capped hubs with a dedicated path if their
pairs matter).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph

__all__ = ["projected_graph", "weighted_projected_graph", "overlap_weighted_projected_graph"]


def _side_arcs(g: SparkGraph, nodes: DataFrame, max_opposite_degree: Optional[int]):
    """(node, other) arcs with ``node`` on the projected side, hub-capped.
    Direction is meaningless for side membership, so arcs are symmetrized
    regardless of the graph's directed flag (the reference's bipartite
    module treats DiGraph input the same way)."""
    e = g.edges
    arcs = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    keep = nodes.select(F.col(nodes.columns[0]).cast("long").alias("src"))
    arcs = arcs.join(keep, "src").select(
        F.col("src").alias("node"), F.col("dst").alias("other")
    ).distinct()
    if max_opposite_degree is not None:
        deg = arcs.groupBy("other").agg(F.count(F.lit(1)).alias("d"))
        arcs = arcs.join(
            deg.filter(F.col("d") <= max_opposite_degree).select("other"), "other"
        )
    return arcs


def weighted_projected_graph(
    g: SparkGraph,
    nodes: DataFrame,
    *,
    ratio: bool = False,
    max_opposite_degree: Optional[int] = None,
) -> SparkGraph:
    """Project the bipartite graph onto ``nodes``; edge weight = number of
    shared opposite-side neighbors (``ratio=True`` divides by the size of
    the opposite side, ``projection.py:90`` semantics). Returns an
    undirected SparkGraph over ``nodes``.
    """
    arcs = _side_arcs(g, nodes, max_opposite_degree)
    a = arcs.select(F.col("node").alias("src"), "other")
    b = arcs.select(F.col("node").alias("dst"), "other")
    pairs = (
        a.join(b, "other")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    if ratio:
        keep = nodes.select(F.col(nodes.columns[0]).cast("long").alias("id"))
        n_opp = (
            g.vertices.select("id").join(keep, "id", "left_anti").count()
        )
        pairs = pairs.withColumn(
            "weight", F.col("weight") / F.lit(float(n_opp or 1))
        )
    return SparkGraph(
        pairs,
        nodes.select(F.col(nodes.columns[0]).cast("long").alias("id")),
        directed=False,
        coalesce_edges=False,
    )


def projected_graph(
    g: SparkGraph, nodes: DataFrame, *, max_opposite_degree: Optional[int] = None
) -> SparkGraph:
    """Unweighted projection (``projection.py:12``): u ~ v iff they share at
    least one opposite-side neighbor."""
    w = weighted_projected_graph(
        g, nodes, max_opposite_degree=max_opposite_degree
    )
    return SparkGraph(
        w.edges.select("src", "dst", F.lit(1.0).alias("weight")),
        w.vertices,
        directed=False,
        coalesce_edges=False,
    )


def overlap_weighted_projected_graph(
    g: SparkGraph,
    nodes: DataFrame,
    *,
    jaccard: bool = True,
    max_opposite_degree: Optional[int] = None,
) -> SparkGraph:
    """Neighborhood-overlap weights (``projection.py:244``): Jaccard
    |N(u)∩N(v)| / |N(u)∪N(v)|, or with ``jaccard=False`` the overlap
    coefficient |N(u)∩N(v)| / min(|N(u)|, |N(v)|)."""
    arcs = _side_arcs(g, nodes, max_opposite_degree)
    deg = arcs.groupBy("node").agg(F.count(F.lit(1)).alias("nd"))
    a = arcs.select(F.col("node").alias("src"), "other")
    b = arcs.select(F.col("node").alias("dst"), "other")
    inter = (
        a.join(b, "other")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("i"))
    )
    da = deg.select(F.col("node").alias("src"), F.col("nd").alias("da"))
    db = deg.select(F.col("node").alias("dst"), F.col("nd").alias("db"))
    joined = inter.join(da, "src").join(db, "dst")
    if jaccard:
        w = F.col("i") / (F.col("da") + F.col("db") - F.col("i"))
    else:
        w = F.col("i") / F.least("da", "db")
    pairs = joined.select("src", "dst", w.alias("weight"))
    return SparkGraph(
        pairs,
        nodes.select(F.col(nodes.columns[0]).cast("long").alias("id")),
        directed=False,
        coalesce_edges=False,
    )
