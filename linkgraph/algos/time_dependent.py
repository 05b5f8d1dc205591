"""Time-dependent measures: the CD (consolidation/destabilization) index.

Reference: ``networkx/algorithms/time_dependent.py:12`` ``cd_index`` —
Funk & Owen-Smith's dynamic measure of technological change over citation
DAGs. For a focal node x with time t_x and horizon ``time_delta``:

- ``pred`` = in-neighbors i of x with ``t_i <= t_x + time_delta``;
- ``b_i`` = -1 if i also cites any successor of x, else +1;
- ``n`` = |pred ∪ (∪_{s in succ(x)} pred(s) \\ {x})| (successor-citers are
  NOT time-filtered, matching the reference exactly);
- CD = round(Σ b_i / n, 2), or round(Σ (b_i / w_i) / n, 2) with node
  weights.

The reference walks ``G.pred``/``G[x]`` dicts per focal node; here the
whole-table form :func:`cd_index_table` computes every node's CD index in
five joins + two aggregations — the shape a 100 TB citation graph needs
(each join keyed on a node id, no driver state). :func:`cd_index` is the
reference-signature scalar wrapper over a single-focal filter of the same
plan.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph

__all__ = ["cd_index", "cd_index_table"]


def cd_index_table(
    g: SparkGraph,
    time_delta,
    *,
    time: str = "time",
    weight: Optional[str] = None,
    focals: Optional[DataFrame] = None,
    digits: int = 2,
) -> DataFrame:
    """(id, cd_index) for every node where the index is defined (n > 0)
    (``time_dependent.py:12`` vectorized over all focal nodes).

    ``time`` is a vertices column; missing values raise like the
    reference's "Not all nodes have a 'time' attribute". ``weight`` is an
    optional vertices column; nodes without it weigh 1. ``focals``
    optionally restricts the focal set (single-column id DataFrame).
    """
    if not g.directed:
        raise ValueError("cd_index is defined on directed graphs")
    if time not in g.vertices.columns:
        raise ValueError(f"vertices have no {time!r} column")
    verts = g.vertices
    if verts.filter(F.col(time).isNull()).limit(1).count() > 0:
        raise ValueError("Not all nodes have a 'time' attribute.")

    arcs = g.edges.select("src", "dst")
    focal = verts.select(F.col("id").alias("x"), F.col(time).alias("tx"))
    if focals is not None:
        fx = focals.select(
            F.col(focals.columns[0]).cast("long").alias("x")
        )
        focal = focal.join(fx, "x", "left_semi")

    # qualifying predecessors: i -> x with t_i <= t_x + delta
    pred = (
        arcs.select(F.col("src").alias("i"), F.col("dst").alias("x"))
        .join(focal, "x")
        .join(
            verts.select(F.col("id").alias("i"), F.col(time).alias("ti")), "i"
        )
        .filter(F.col("ti") <= F.col("tx") + F.lit(time_delta))
        .select("x", "i")
    )
    succ = arcs.select(F.col("src").alias("x"), F.col("dst").alias("s")).join(
        focal.select("x"), "x", "left_semi"
    )
    # b_i = -1 iff i cites any successor of x
    cites_succ = (
        pred.join(succ, "x")
        .join(
            arcs.select(F.col("src").alias("i"), F.col("dst").alias("s")),
            ["i", "s"],
            "left_semi",
        )
        .select("x", "i")
        .distinct()
    )
    b = pred.join(
        cites_succ.withColumn("neg", F.lit(True)), ["x", "i"], "left"
    ).select(
        "x",
        "i",
        F.when(F.col("neg"), F.lit(-1.0)).otherwise(F.lit(1.0)).alias("b"),
    )
    if weight is not None:
        wcol = (
            verts.select(F.col("id").alias("i"), F.col(weight).alias("wi"))
            if weight in verts.columns
            else None
        )
        if wcol is None:
            raise ValueError(f"vertices have no {weight!r} column")
        b = b.join(wcol, "i", "left").withColumn(
            "b", F.col("b") / F.coalesce(F.col("wi"), F.lit(1.0))
        )
    num = b.groupBy("x").agg(F.sum("b").alias("num"))

    # n = |pred ∪ (successor-citers \ {x})| (succ-citers not time-filtered)
    succ_citers = (
        succ.join(arcs.select(F.col("src").alias("k"), F.col("dst").alias("s")), "s")
        .filter(F.col("k") != F.col("x"))
        .select("x", F.col("k").alias("i"))
    )
    n = (
        pred.unionByName(succ_citers)
        .distinct()
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # a focal with no qualifying pred but a nonempty citer-union has
    # sum(b) = 0 and a defined index of 0.0 (reference: sum over empty b)
    return (
        n.filter(F.col("n") > 0)
        .join(num, "x", "left")
        .select(
            F.col("x").alias("id"),
            # bround = HALF_EVEN, matching the reference's Python round();
            # digits=2 is the reference's rounding, wider for raw ratios
            F.bround(
                F.coalesce(F.col("num"), F.lit(0.0)) / F.col("n"), digits
            ).alias("cd_index"),
        )
    )


def cd_index(
    g: SparkGraph,
    node,
    time_delta,
    *,
    time: str = "time",
    weight: Optional[str] = None,
) -> float:
    """Reference-signature scalar form (``time_dependent.py:12``). Raises
    when the index is undefined (n == 0), like the reference."""
    one = g.spark.createDataFrame([(int(node),)], "id long")
    rows = cd_index_table(
        g, time_delta, time=time, weight=weight, focals=one
    ).collect()
    if not rows:
        raise ValueError("The cd index cannot be defined.")
    return float(rows[0]["cd_index"])
