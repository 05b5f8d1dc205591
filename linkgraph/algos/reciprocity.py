"""Reciprocity of a directed graph.

Semantics match ``networkx/algorithms/reciprocity.py``:

- ``overall_reciprocity`` (``reciprocity.py:81``): with ``m`` arcs and ``r``
  unordered pairs {u, v} (u != v) present in both directions, the value is
  ``2 r / m`` — the reference computes it as
  ``(m - undirected_m) * 2 / m`` (``reciprocity.py:96-97``), identical.
  Raises on an empty graph (``reciprocity.py:99``).
- ``reciprocity`` per node (``_reciprocity_iter``, ``reciprocity.py:61-77``):
  ``2 |pred(v) ∩ succ(v)| / (|pred(v)| + |succ(v)|)``; NULL for isolated
  nodes (the reference yields ``None``).

Plan shape: one self-join of the arc set against its swap — an equi-join on
both key columns — plus count aggregations; no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph


def _arcs(g: SparkGraph) -> DataFrame:
    if not g.directed:
        raise ValueError("reciprocity: not implemented for undirected type")
    return g.edges.select("src", "dst").distinct()


def overall_reciprocity(g: SparkGraph) -> float:
    e = _arcs(g).persist()
    m = e.count()
    if m == 0:
        raise ValueError("Not defined for empty graphs")
    # unordered pairs u<v with both (u,v) and (v,u)
    canon = e.filter(F.col("src") < F.col("dst"))
    swapped = e.filter(F.col("src") > F.col("dst")).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    r = canon.join(swapped, ["src", "dst"], "left_semi").count()
    e.unpersist()
    return 2.0 * r / m


def node_reciprocity(g: SparkGraph) -> DataFrame:
    """(id, reciprocity DOUBLE) for every vertex; NULL when isolated."""
    e = _arcs(g)
    succ = e.select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
    pred = e.select(F.col("dst").alias("id"), F.col("src").alias("nbr"))
    both = succ.join(pred, ["id", "nbr"], "left_semi")
    counts = (
        succ.groupBy("id").agg(F.count(F.lit(1)).alias("ns"))
        .join(pred.groupBy("id").agg(F.count(F.lit(1)).alias("np")), "id", "outer")
        .join(both.groupBy("id").agg(F.count(F.lit(1)).alias("no")), "id", "left")
        .select(
            "id",
            (F.coalesce("ns", F.lit(0)) + F.coalesce("np", F.lit(0))).alias("tot"),
            F.coalesce("no", F.lit(0)).alias("no"),
        )
    )
    return (
        g.vertices.select("id")
        .join(counts, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("tot", F.lit(0)) > 0,
                2.0 * F.col("no") / F.col("tot"),
            ).alias("reciprocity"),
        )
    )


def reciprocity(g: SparkGraph, nodes=None):
    """``reciprocity.py:12`` public dispatch — whole-graph float when
    ``nodes`` is None, otherwise the per-node DataFrame restricted to
    ``nodes`` (the reference returns a dict; a scalar for a single node is
    the caller's one-row read)."""
    if nodes is None:
        return overall_reciprocity(g)
    per = node_reciprocity(g)
    ids = [int(n) for n in ([nodes] if isinstance(nodes, int) else nodes)]
    out = per.filter(F.col("id").isin(ids))
    if isinstance(nodes, int):
        row = out.first()
        if row is None or row["reciprocity"] is None:
            raise ValueError("Not defined for isolated nodes.")
        return float(row["reciprocity"])
    return out
