"""GraphML IO — ``networkx/readwrite/graphml.py`` (``read_graphml:238``,
``write_graphml:63``) semantics for the engine's data model (BIGINT node
ids, one DOUBLE ``weight`` edge attribute).

GraphML is a single XML document, which pins the format's parallelism:

- ``write_graphml`` builds the node/edge XML fragments as DataFrame rows
  (distributed string formatting, one row per element) and lays the file
  down through a single ordered partition — the unavoidable single-writer
  step of any one-document format. The fragment build scales; only the
  final byte stream is serial, exactly like writing one CSV part.
- ``read_graphml`` parses with the stdlib ``ElementTree`` on the driver
  (XML is not line-splittable), guarded by ``max_bytes``. For bulk data
  the engine's native interchange is parquet; GraphML is an interop
  format, same positioning as the reference's.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from linkgraph.graph import SparkGraph

_HEADER = (
    '<?xml version="1.0" encoding="utf-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
    '  <key id="d0" for="edge" attr.name="weight" attr.type="double"/>\n'
)
_FOOTER = "  </graph>\n</graphml>"


def write_graphml(g: SparkGraph, path: str) -> None:
    """Write the graph as a single ``.graphml`` document at ``path``
    (``graphml.py:63``). Node/edge fragments are built distributed; the
    byte stream is assembled by one ordered writer task."""
    spark = g.spark
    directed = "directed" if g.directed else "undirected"
    head = spark.createDataFrame(
        [(0, 0, _HEADER + f'  <graph edgedefault="{directed}">')],
        "sect long, k long, line string",
    )
    nodes = g.vertices.select(
        F.lit(1).alias("sect"),
        F.col("id").alias("k"),
        F.format_string('    <node id="%d"/>', "id").alias("line"),
    )
    edges = g.edges.select(
        F.lit(2).alias("sect"),
        F.col("src").alias("k"),
        F.format_string(
            '    <edge source="%d" target="%d"><data key="d0">%s</data></edge>',
            "src",
            "dst",
            F.col("weight").cast("string"),
        ).alias("line"),
    )
    tail = spark.createDataFrame([(3, 0, _FOOTER)], "sect long, k long, line string")
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
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def read_graphml(
    spark: SparkSession, path: str, *, max_bytes: int = 256 * 1024 * 1024
) -> SparkGraph:
    """Parse a ``.graphml`` file (``graphml.py:238``): integer node ids,
    optional double ``weight`` edge data; edge direction from the graph's
    ``edgedefault``."""
    import xml.etree.ElementTree as ET

    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"read_graphml: {size} bytes exceeds max_bytes={max_bytes}; "
            "XML is not splittable — convert bulk graphs to parquet"
        )
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    root = ET.parse(path).getroot()
    graph = root.find(f"{ns}graph")
    directed = (graph.get("edgedefault") == "directed")
    weight_keys = {
        k.get("id")
        for k in root.findall(f"{ns}key")
        if k.get("attr.name") == "weight"
    }
    nodes = [(int(n.get("id")),) for n in graph.findall(f"{ns}node")]
    edges = []
    for e in graph.findall(f"{ns}edge"):
        w = 1.0
        for d in e.findall(f"{ns}data"):
            if d.get("key") in weight_keys:
                w = float(d.text)
        edges.append((int(e.get("source")), int(e.get("target")), w))
    e_df = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    v_df = spark.createDataFrame(nodes or [], "id long")
    return SparkGraph(e_df, vertices=v_df, directed=directed, coalesce_edges=False)
