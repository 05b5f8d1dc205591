"""Simple-path enumeration (bounded).

Reference: ``networkx/algorithms/simple_paths.py:63`` ``all_simple_paths``
— every loop-free path from source to target up to ``cutoff`` edges. The
output itself can be exponential, so like bounded ``simple_cycles`` the
distributed form REQUIRES the cutoff (the reference defaults it to n−1,
which explodes identically — its generator just defers the blowup).

Plan: frontier rows carry the path as an array column; each superstep is
one frontier⋈arcs join with an ``array_contains`` loop filter — path
state is exactly the output the user asked to enumerate, so the row
volume is the answer's size, never more.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache

__all__ = ["all_simple_paths"]


def all_simple_paths(
    g: SparkGraph, source, target, cutoff: int
) -> DataFrame:
    """(path ARRAY<BIGINT>): every simple path from ``source`` to
    ``target`` with at most ``cutoff`` edges (``simple_paths.py:63``
    semantics with an explicit cutoff; undirected graphs walk both
    directions). ``source``/``target`` are node ids."""
    if cutoff < 1:
        raise ValueError("cutoff must be at least 1")
    source, target = int(source), int(target)
    present = {
        r["id"]
        for r in g.vertices.filter(F.col("id").isin([source, target])).collect()
    }
    if source not in present:
        raise ValueError(f"source node {source} not in graph")
    if target not in present:
        raise ValueError(f"target node {target} not in graph")
    spark = g.spark
    arcs = (
        (g.edges if g.directed else g.symmetric_edges())
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    cache = SuperstepCache(spark)
    frontier = cache.truncate(
        spark.createDataFrame([(source,)], "head bigint").select(
            "head", F.array(F.col("head")).alias("path")
        )
    )
    outs = []
    for _ in range(cutoff):
        step = (
            frontier.join(arcs.withColumnRenamed("src", "head"), "head")
            .filter(~F.array_contains(F.col("path"), F.col("dst")))
            .select(
                F.col("dst").alias("head"),
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
            )
        )
        step = cache.truncate(step)
        done = step.filter(F.col("head") == target).select("path")
        outs.append(done)
        frontier = step.filter(F.col("head") != target)
        if frontier.limit(1).count() == 0:
            break
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    out = out.persist()
    out.count()
    arcs.unpersist()
    cache.close(keep_result=True)
    return out
