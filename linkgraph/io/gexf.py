"""GEXF IO — ``networkx/readwrite/gexf.py`` (``write_gexf:63``,
``read_gexf:180``); minimal interop surface (BIGINT ids, edge weights,
directedness), same single-document parallelism posture as GraphML:
distributed fragment build + one ordered writer; driver-side parse under
a size guard."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

from linkgraph.graph import SparkGraph

_NS = "http://www.gexf.net/1.2draft"


def write_gexf(g: SparkGraph, path: str) -> None:
    """``gexf.py:63`` — nodes with id/label, edges with id/source/target/
    weight, defaultedgetype from directedness."""
    spark = g.spark
    et = "directed" if g.directed else "undirected"
    header = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        f'<gexf xmlns="{_NS}" version="1.2">\n'
        f'  <graph defaultedgetype="{et}" mode="static">\n'
        "    <nodes>"
    )
    head = spark.createDataFrame(
        [(0, 0, header)], "sect long, k long, line string"
    )
    nodes = g.vertices.select(
        F.lit(1).alias("sect"),
        F.col("id").alias("k"),
        F.format_string('      <node id="%d" label="%d"/>', "id", "id").alias(
            "line"
        ),
    )
    mid = spark.createDataFrame(
        [(2, 0, "    </nodes>\n    <edges>")], "sect long, k long, line string"
    )
    edges = g.edges.select(
        F.lit(3).alias("sect"),
        F.col("src").alias("k"),
        F.format_string(
            '      <edge source="%d" target="%d" weight="%s"/>',
            "src",
            "dst",
            F.col("weight").cast("string"),
        ).alias("line"),
    )
    tail = spark.createDataFrame(
        [(4, 0, "    </edges>\n  </graph>\n</gexf>")],
        "sect long, k long, line string",
    )
    out = (
        head.unionByName(nodes).unionByName(mid).unionByName(edges).unionByName(tail)
    )
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


def read_gexf(
    spark: SparkSession, path: str, *, max_bytes: int = 256 * 1024 * 1024
) -> SparkGraph:
    """``gexf.py:180`` — integer node ids, optional edge weights,
    direction from ``defaultedgetype`` (namespace-tolerant: any gexf.net
    draft version)."""
    import xml.etree.ElementTree as ET

    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"read_gexf: {size} bytes exceeds max_bytes={max_bytes}"
        )
    root = ET.parse(path).getroot()

    def local(tag):
        return tag.rsplit("}", 1)[-1]

    graph = next(el for el in root.iter() if local(el.tag) == "graph")
    directed = graph.get("defaultedgetype") == "directed"
    nodes = [
        (int(el.get("id")), el.get("label"))
        for el in graph.iter()
        if local(el.tag) == "node"
    ]
    edges = [
        (
            int(el.get("source")),
            int(el.get("target")),
            float(el.get("weight", 1.0)),
        )
        for el in graph.iter()
        if local(el.tag) == "edge"
    ]
    v_df = spark.createDataFrame(nodes or [], "id long, label string")
    e_df = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    return SparkGraph(e_df, vertices=v_df, directed=directed, coalesce_edges=False)


def relabel_gexf_graph(g: SparkGraph) -> SparkGraph:
    """``gexf.py`` ``relabel_gexf_graph`` — relabel nodes to their gexf
    ``label`` attribute. The engine's node ids are BIGINT, so labels must
    parse as distinct integers; missing or duplicate labels raise, like
    the reference."""
    from pyspark.sql import functions as F

    from linkgraph.exceptions import NetworkXError
    from linkgraph.graph import relabel_nodes

    if "label" not in g.vertices.columns:
        raise NetworkXError(
            "Failed to relabel nodes: missing node labels found. Use relabel=False."
        )
    mapping = g.vertices.select(
        "id", F.col("label").cast("long").alias("new_id")
    )
    n = g.vertices.count()
    ok = mapping.filter(F.col("new_id").isNotNull())
    if ok.count() != n or ok.select("new_id").distinct().count() != n:
        raise NetworkXError(
            "Failed to relabel nodes: duplicate node labels found. Use relabel=False."
        )
    return relabel_nodes(g, mapping, check_complete=False, merge=False)
