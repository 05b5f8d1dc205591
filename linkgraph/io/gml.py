"""GML IO — ``networkx/readwrite/gml.py`` (``read_gml:116``,
``write_gml:818``) for the engine's data model (BIGINT ids, DOUBLE
``weight``).

Same parallelism posture as GraphML: fragments build distributed, the
single document is laid down by one ordered writer; reading parses the
block-structured text on the driver under a size guard (GML blocks span
lines, so the file is not safely splittable without a two-pass scan).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import SparkSession, functions as F

from linkgraph.graph import SparkGraph


def write_gml(g: SparkGraph, path: str) -> None:
    """``gml.py:818`` — minimal attribute surface: node ``id``, edge
    ``source/target/weight``, graph ``directed`` flag."""
    spark = g.spark
    head_lines = "graph [\n  directed " + ("1" if g.directed else "0")
    head = spark.createDataFrame(
        [(0, 0, head_lines)], "sect long, k long, line string"
    )
    nodes = g.vertices.select(
        F.lit(1).alias("sect"),
        F.col("id").alias("k"),
        F.format_string("  node [\n    id %d\n  ]", "id").alias("line"),
    )
    edges = g.edges.select(
        F.lit(2).alias("sect"),
        F.col("src").alias("k"),
        F.format_string(
            "  edge [\n    source %d\n    target %d\n    weight %s\n  ]",
            "src",
            "dst",
            F.col("weight").cast("string"),
        ).alias("line"),
    )
    tail = spark.createDataFrame([(3, 0, "]")], "sect long, k long, line string")
    out = head.unionByName(nodes).unionByName(edges).unionByName(tail)
    tmp = path + ".__parts__"
    (
        out.coalesce(1)
        .sortWithinPartitions("sect", "k")
        .select("line")
        .write.mode("overwrite")
        .text(tmp)
    )
    part = [f for f in os.listdir(tmp) if f.startswith("part-")][0]
    os.replace(os.path.join(tmp, part), path)
    shutil.rmtree(tmp, ignore_errors=True)


_NODE_RE = re.compile(r"node\s*\[([^\]]*)\]", re.S)
_EDGE_RE = re.compile(r"edge\s*\[([^\]]*)\]", re.S)


def _field(block: str, name: str, default=None):
    m = re.search(rf"\b{name}\s+(-?[\d.eE+]+)", block)
    return m.group(1) if m else default


def read_gml(
    spark: SparkSession, path: str, *, max_bytes: int = 256 * 1024 * 1024
) -> SparkGraph:
    """``gml.py:116`` — integer ids, optional ``weight``, ``directed 1``
    flag; tolerant of the reference writer's ``label`` fields."""
    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"read_gml: {size} bytes exceeds max_bytes={max_bytes}; "
            "GML blocks span lines — convert bulk graphs to parquet"
        )
    text = open(path, encoding="utf-8").read()
    directed = bool(re.search(r"\bdirected\s+1\b", text))
    nodes = []
    for m in _NODE_RE.finditer(text):
        nid = _field(m.group(1), "id")
        if nid is not None:
            nodes.append((int(float(nid)),))
    edges = []
    for m in _EDGE_RE.finditer(text):
        b = m.group(1)
        s, t = _field(b, "source"), _field(b, "target")
        if s is None or t is None:
            continue
        w = _field(b, "weight", "1.0")
        edges.append((int(float(s)), int(float(t)), float(w)))
    e_df = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    v_df = spark.createDataFrame(nodes or [], "id long")
    return SparkGraph(e_df, vertices=v_df, directed=directed, coalesce_edges=False)
