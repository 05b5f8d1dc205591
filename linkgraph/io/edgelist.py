"""Edge-list text IO.

Semantics match ``networkx/readwrite/edgelist.py``:

- ``read_edgelist`` / ``parse_edgelist`` (``edgelist.py:302,177``):
  whitespace-delimited ``u v`` lines; ``#`` comment prefix stripped; blank
  lines ignored. (The reference also supports a Python-literal attr dict
  per line — out of scope; weights cover the engine's needs.)
- ``read_weighted_edgelist`` (``edgelist.py:429``): ``u v w`` with ``w``
  cast DOUBLE.
- ``write_edgelist`` (``edgelist.py:127``): one ``u v [w]`` line per edge.

Spark mapping: ``spark.read.text`` → split/cast — a plain distributed scan
with full pushdown; no driver-side parsing.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from linkgraph.graph import SparkGraph


def _parse(lines: DataFrame, comments: str, weighted: bool) -> DataFrame:
    v = F.col("value")
    if comments:
        v = F.trim(
            F.when(
                F.instr("value", comments) > 0,
                F.substring_index("value", comments, 1),
            ).otherwise(F.col("value"))
        )
    else:
        v = F.trim(v)
    toks = F.split(v, r"\s+")
    base = (
        lines.select(v.alias("line"), toks.alias("t"))
        .filter((F.col("line") != "") & (F.size("t") >= 2))
    )
    out = base.select(
        F.col("t")[0].cast("long").alias("src"),
        F.col("t")[1].cast("long").alias("dst"),
        (
            F.col("t")[2].cast("double") if weighted else F.lit(1.0)
        ).alias("weight"),
    )
    return out.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())


def read_edgelist(
    spark: SparkSession,
    path: str,
    *,
    comments: str = "#",
    directed: bool = False,
    num_partitions: Optional[int] = None,
) -> SparkGraph:
    """``networkx/readwrite/edgelist.py:302`` — unweighted ``u v`` lines."""
    return SparkGraph(
        _parse(spark.read.text(path), comments, weighted=False),
        directed=directed,
        num_partitions=num_partitions,
    )


def read_weighted_edgelist(
    spark: SparkSession,
    path: str,
    *,
    comments: str = "#",
    directed: bool = False,
    num_partitions: Optional[int] = None,
) -> SparkGraph:
    """``edgelist.py:429`` — ``u v w`` lines, missing w defaults to 1."""
    return SparkGraph(
        _parse(spark.read.text(path), comments, weighted=True),
        directed=directed,
        num_partitions=num_partitions,
    )


def write_edgelist(g: SparkGraph, path: str, *, data: bool = True) -> None:
    """``edgelist.py:127`` — ``u v w`` (or ``u v`` with ``data=False``)."""
    e = g.edges
    if data:
        line = F.concat_ws(" ", "src", "dst", "weight")
    else:
        line = F.concat_ws(" ", "src", "dst")
    e.select(line.alias("value")).write.mode("overwrite").text(path)
