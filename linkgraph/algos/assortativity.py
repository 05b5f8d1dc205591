"""Degree assortativity — Pearson correlation over edge-endpoint degrees.

Semantics match ``networkx/algorithms/assortativity/correlation.py:19``
(``degree_assortativity_coefficient``): the Pearson correlation of the
(source-degree, target-degree) joint distribution over edges. For an
undirected graph every edge contributes both orientations (the mixing
matrix is symmetrized, ``assortativity/mixing.py``); directed graphs use
(out-degree of src, in-degree of dst) by default (x="out", y="in").

One plan: arcs ⋈ deg(src) ⋈ deg(dst) → ``corr()`` aggregate — a single
shuffle pipeline with a scalar result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph import SparkGraph


def degree_assortativity_coefficient(g: SparkGraph) -> float:
    if g.directed:
        arcs = g.edges.select("src", "dst")
        dx = (
            arcs.groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("dx"))
        )
        dy = (
            arcs.groupBy(F.col("dst").alias("id"))
            .agg(F.count(F.lit(1)).alias("dy"))
        )
        joined = (
            arcs.join(dx.withColumnRenamed("id", "src"), "src")
            .join(dy.withColumnRenamed("id", "dst"), "dst")
        )
    else:
        sym = g.symmetric_edges().select("src", "dst")
        deg = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        joined = (
            sym.join(
                deg.select(F.col("id").alias("src"), F.col("deg").alias("dx")),
                "src",
            ).join(
                deg.select(F.col("id").alias("dst"), F.col("deg").alias("dy")),
                "dst",
            )
        )
    return joined.agg(F.corr(F.col("dx").cast("double"), F.col("dy").cast("double"))).first()[0]
