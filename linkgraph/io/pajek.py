"""Pajek (.net) IO — ``networkx/readwrite/pajek.py`` (``write_pajek:60``,
``read_pajek:125``).

Pajek numbers vertices 1..n and refers to edges by those numbers; node
identity is the quoted label. The engine's BIGINT ids become the labels;
the 1..n numbering is the sorted-id rank (zipWithIndex over a sort — no
single-partition window, same plan as convert_node_labels_to_integers).
Writing is distributed-fragments + one ordered writer, like GraphML;
reading parses the line format on the driver under a size guard (the
*Vertices/*Edges sections are order-dependent, so the file is not
splittable without a pre-scan)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

from linkgraph.graph import SparkGraph


def write_pajek(g: SparkGraph, path: str) -> None:
    """``pajek.py:60`` — ``*Vertices n`` with labels = BIGINT ids, then
    ``*Arcs`` (directed) or ``*Edges`` with weights."""
    spark = g.spark
    n = g.number_of_nodes()
    sorted_ids = g.vertices.select("id").sort("id")
    mapping = (
        sorted_ids.rdd.map(lambda r: r[0])
        .zipWithIndex()
        .toDF(["id", "idx"])
        .select(F.col("id").cast("long"), (F.col("idx") + 1).alias("num"))
    )
    head = spark.createDataFrame(
        [(0, 0, f"*Vertices {n}")], "sect long, k long, line string"
    )
    nodes = mapping.select(
        F.lit(1).alias("sect"),
        F.col("num").alias("k"),
        F.format_string('%d "%d"', "num", "id").alias("line"),
    )
    marker = spark.createDataFrame(
        [(2, 0, "*Arcs" if g.directed else "*Edges")],
        "sect long, k long, line string",
    )
    e = (
        g.edges.join(mapping.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("num", "nsrc")
        .join(mapping.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("num", "ndst")
    )
    edges = e.select(
        F.lit(3).alias("sect"),
        F.col("nsrc").alias("k"),
        F.format_string(
            "%d %d %s", "nsrc", "ndst", F.col("weight").cast("string")
        ).alias("line"),
    )
    out = head.unionByName(nodes).unionByName(marker).unionByName(edges)
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


def read_pajek(
    spark: SparkSession, path: str, *, max_bytes: int = 256 * 1024 * 1024
) -> SparkGraph:
    """``pajek.py:125`` — integer labels become the BIGINT node ids;
    ``*Arcs`` sections build a directed graph, ``*Edges`` undirected
    (a file with both is read as directed, like the reference's
    multigraph fallback collapsed to arcs)."""
    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"read_pajek: {size} bytes exceeds max_bytes={max_bytes}"
        )
    num_to_id = {}
    edges = []
    directed = False
    section = None
    for raw in open(path, encoding="utf-8"):
        line = raw.strip()
        if not line:
            continue
        low = line.lower()
        if low.startswith("*vertices"):
            section = "v"
            continue
        if low.startswith("*arcs"):
            section = "e"
            directed = True
            continue
        if low.startswith("*edges"):
            section = "e"
            continue
        parts = line.split()
        if section == "v":
            num = int(parts[0])
            label = parts[1].strip('"') if len(parts) > 1 else parts[0]
            num_to_id[num] = int(label)
        elif section == "e":
            u, v = int(parts[0]), int(parts[1])
            w = float(parts[2]) if len(parts) > 2 else 1.0
            edges.append((num_to_id.get(u, u), num_to_id.get(v, v), w))
    v_df = spark.createDataFrame(
        [(i,) for i in num_to_id.values()] or [], "id long"
    )
    e_df = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    return SparkGraph(e_df, vertices=v_df, directed=directed, coalesce_edges=False)
