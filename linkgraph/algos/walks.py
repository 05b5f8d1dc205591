"""Walk counting.

Reference: ``networkx/algorithms/walks.py:9`` ``number_of_walks`` — the
(u, v) entry of the adjacency matrix power ``A^k``. The reference
materializes the dense/sparse matrix power; the DataFrame twin computes the
same counts by ``k − 1`` semiring joins (sum over mid of
``walks(u, mid) · A(mid, v)``), which is how a 100 TB graph would do it —
each round is one equi-join + groupBy keyed on the frontier column, no
n×n matrix anywhere. Counts grow as fast as the reference's (use small k;
the row explosion is inherent to the definition, not the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache

__all__ = ["number_of_walks"]


def number_of_walks(g: SparkGraph, walk_length: int) -> DataFrame:
    """(src, dst, walks): number of ``walk_length``-edge walks between each
    node pair (``walks.py:9``). Zero-count pairs are absent (the reference
    returns dense dicts with explicit zeros — the relational form drops
    them). ``walk_length=0`` is the identity, one row per node.
    """
    if walk_length < 0:
        raise ValueError(f"`walk_length` cannot be negative: {walk_length}")
    if walk_length == 0:
        return g.vertices.select(
            F.col("id").alias("src"), F.col("id").alias("dst"), F.lit(1).alias("walks")
        )
    # A with multigraph multiplicity (weight=None in the reference counts
    # parallel edges); undirected self-loops enter once, like the
    # reference's dict-of-dict adjacency.
    arcs = (
        (g.edges if g.directed else g.symmetric_edges())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("a"))
        .persist()
    )
    cache = SuperstepCache(g.spark)
    walks = arcs.select("src", "dst", F.col("a").alias("walks"))
    prev = None
    for _ in range(walk_length - 1):
        walks = cache.truncate(
            walks.withColumnRenamed("dst", "mid")
            .join(arcs.withColumnRenamed("src", "mid"), "mid")
            .groupBy("src", "dst")
            .agg(F.sum(F.col("walks") * F.col("a")).alias("walks")),
            retire=prev,
        )
        prev = walks
    out = walks.persist()
    out.count()
    arcs.unpersist()
    cache.close(keep_result=True)
    return out
