"""Time-series graphs: the natural visibility graph.

Reference: ``networkx/generators/time_series.py:12`` ``visibility_graph``
(Lacasa et al., PNAS 2008) — nodes are series positions, an edge (i, j)
means the straight line between bar tops i and j clears every intermediate
bar.

The reference tests every pair against every intermediate bar — O(n³).
The relational form here is O(n²) total work: (i, j) is visible iff the
slope from i to j strictly exceeds the slope from i to every intermediate
k, i.e. iff ``slope(i, j) > running_max_{i<k<j} slope(i, k)``. That is one
range self-join (slopes of all forward pairs, partitioned by the left
endpoint) plus one running-max window per partition — no per-pair blocker
scan. Output matches the reference edge-for-edge (adjacent positions are
always visible; ties block, since the reference obstructs on ``>=``).

Scale note: the forward-pair join is inherently O(n²) rows (the complete
visibility relation can be Θ(n²) on monotone series); for long series
apply the operator per bounded window/segment, which is how visibility
graphs are used on streaming telemetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import SparkGraph

__all__ = ["visibility_graph", "visibility_graph_edges"]


def _series_df(spark, series) -> DataFrame:
    if isinstance(series, DataFrame):
        i, v = series.columns[0], series.columns[1]
        return series.select(
            F.col(i).cast("long").alias("i"), F.col(v).cast("double").alias("v")
        )
    rows = [(int(k), float(t)) for k, t in enumerate(series)]
    return spark.createDataFrame(rows, "i long, v double")


def visibility_graph_edges(spark, series) -> DataFrame:
    """(src, dst) edges of the natural visibility graph, src < dst
    (``time_series.py:12``). ``series`` is a Python sequence or a
    two-column (index, value) DataFrame with a dense 0..n-1 index."""
    s = _series_df(spark, series)
    a = s.select(F.col("i").alias("src"), F.col("v").alias("va"))
    b = s.select(F.col("i").alias("dst"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("dst") > F.col("src")).withColumn(
        "slope", (F.col("vb") - F.col("va")) / (F.col("dst") - F.col("src"))
    )
    w = (
        Window.partitionBy("src")
        .orderBy("dst")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = F.max("slope").over(w)
    return (
        pairs.withColumn("blocked", run >= F.col("slope"))
        .filter(~F.coalesce(F.col("blocked"), F.lit(False)))
        .select("src", "dst")
    )


def visibility_graph(spark, series) -> SparkGraph:
    """The visibility graph as a SparkGraph whose vertices carry the series
    ``value`` column, like the reference's node attribute."""
    s = _series_df(spark, series)
    verts = s.select(F.col("i").alias("id"), F.col("v").alias("value"))
    edges = visibility_graph_edges(spark, s)
    return SparkGraph(edges, verts, directed=False, coalesce_edges=False)
