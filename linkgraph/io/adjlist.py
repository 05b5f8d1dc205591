"""Adjacency-list text IO.

Semantics match ``networkx/readwrite/adjlist.py``:

- ``read_adjlist`` / ``parse_adjlist`` (``adjlist.py:248,152``): each line
  is ``source n1 n2 n3 ...``; ``#`` comment prefix stripped; blank lines
  ignored; a bare ``source`` line declares an isolated node.
- ``write_adjlist`` (``adjlist.py:110``): one line per node listing its
  (out-)neighbors. The reference writes each undirected edge only once
  (it tracks ``seen``); round-tripping therefore reconstructs the same
  edge set.

Spark mapping: ``spark.read.text`` → split → ``explode`` — a distributed
scan + generator, no driver parsing; writing is a groupBy-collect_list per
source (bounded by max out-degree) over the canonical edge table.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from linkgraph.graph import SparkGraph


def _parse_lines(lines: DataFrame, comments: str) -> DataFrame:
    v = F.col("value")
    if comments:
        v = F.when(
            F.instr("value", comments) > 0,
            F.substring_index("value", comments, 1),
        ).otherwise(F.col("value"))
    v = F.trim(v)
    toks = F.split(v, r"\s+")
    return lines.select(v.alias("line"), toks.alias("t")).filter(
        F.col("line") != ""
    )


def read_adjlist(
    spark: SparkSession,
    path: str,
    *,
    comments: str = "#",
    directed: bool = False,
    num_partitions: Optional[int] = None,
) -> SparkGraph:
    """``adjlist.py:248`` — integer node labels."""
    base = _parse_lines(spark.read.text(path), comments)
    edges = base.select(
        F.col("t")[0].cast("long").alias("src"),
        F.explode(F.slice("t", 2, F.size("t") - 1)).alias("d"),
    ).select("src", F.col("d").cast("long").alias("dst"), F.lit(1.0).alias("weight"))
    # bare "source" lines declare (possibly isolated) nodes
    vertices = base.select(F.col("t")[0].cast("long").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    return SparkGraph(
        edges.filter(F.col("dst").isNotNull()),
        vertices,
        directed=directed,
        num_partitions=num_partitions,
        coalesce_edges=True,
    )


def write_adjlist(g: SparkGraph, path: str) -> None:
    """``adjlist.py:110`` — ``u n1 n2 ...`` per node with at least one
    stored (canonical-direction) edge, plus bare lines for the rest, so the
    read round-trip reproduces the node and edge sets exactly."""
    nbrs = (
        g.edges.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("ns"))
        .select(
            F.concat_ws(
                " ", F.col("src").cast("string"),
                F.concat_ws(" ", F.transform("ns", lambda x: x.cast("string"))),
            ).alias("value"),
            F.col("src").alias("id"),
        )
    )
    bare = (
        g.vertices.select("id")
        .join(g.edges.select(F.col("src").alias("id")), "id", "left_anti")
        .select(F.col("id").cast("string").alias("value"), "id")
    )
    nbrs.select("value").unionByName(bare.select("value")).write.mode(
        "overwrite"
    ).text(path)
