"""GraphML IO — ``networkx/readwrite/graphml.py`` (``read_graphml:238``,
``write_graphml:63``) semantics for the engine's data model (BIGINT node
ids, DOUBLE ``weight``, plus open-schema typed node/edge attribute columns
per SURVEY §1.6 — the reference's per-element attr dicts,
``networkx/classes/graph.py:535-583,917-985``).

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
import shutil

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from linkgraph.graph import SparkGraph

# Spark dtype → GraphML attr.type (graphml.py:404 ``xml_type`` table)
_XML_TYPE = {
    "bigint": "long",
    "int": "long",
    "smallint": "long",
    "tinyint": "long",
    "double": "double",
    "float": "double",
    "boolean": "boolean",
    "string": "string",
}

_SPARK_TYPE = {
    "long": LongType(),
    "int": LongType(),
    "double": DoubleType(),
    "float": DoubleType(),
    "boolean": BooleanType(),
    "string": StringType(),
}


def _xml_escape(col: Column) -> Column:
    """&, <, > escaped for XML text content (string attrs only)."""
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def _data_fragments(df: DataFrame, attrs: "list[tuple[str, str, str]]") -> Column:
    """Concatenated ``<data key="...">value</data>`` fragments; null attr
    values emit nothing (the reference simply omits absent dict keys)."""
    parts = []
    for key_id, name, xml_type in attrs:
        val = F.col(name).cast("string")
        if xml_type == "string":
            val = _xml_escape(val)
        if xml_type == "boolean":
            val = F.lower(val)
        parts.append(
            F.when(
                F.col(name).isNotNull(),
                F.concat(F.lit(f'<data key="{key_id}">'), val, F.lit("</data>")),
            ).otherwise(F.lit(""))
        )
    return F.concat(*parts) if parts else F.lit("")


def _attr_keys(df: DataFrame, skip: "set[str]", prefix: str, domain: str):
    """(key_id, column, xml_type) for each attr column with a declaration
    line for the header."""
    out, decls = [], []
    i = 0
    for name, dtype in df.dtypes:
        if name in skip:
            continue
        xml_type = _XML_TYPE.get(dtype, "string")
        key_id = f"{prefix}{i}"
        out.append((key_id, name, xml_type))
        decls.append(
            f'  <key id="{key_id}" for="{domain}" attr.name="{name}" '
            f'attr.type="{xml_type}"/>'
        )
        i += 1
    return out, decls


def write_graphml(g: SparkGraph, path: str) -> None:
    """Write the graph as a single ``.graphml`` document at ``path``
    (``graphml.py:63``). All vertex attr columns and the weight plus edge
    attr columns are declared as typed <key>s and emitted per element.
    Node/edge fragments are built distributed; the byte stream is
    assembled by one ordered writer task."""
    spark = g.spark
    directed = "directed" if g.directed else "undirected"

    edge_attrs, edge_decls = _attr_keys(g.edges, {"src", "dst"}, "d", "edge")
    node_attrs, node_decls = _attr_keys(g.vertices, {"id"}, "n", "node")

    header = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
        + "\n".join(node_decls + edge_decls)
        + ("\n" if (node_decls or edge_decls) else "")
        + f'  <graph edgedefault="{directed}">'
    )
    head = spark.createDataFrame(
        [(0, 0, header)], "sect long, k long, line string"
    )
    nodes = g.vertices.select(
        F.lit(1).alias("sect"),
        F.col("id").alias("k"),
        F.concat(
            F.format_string('    <node id="%d">', "id"),
            _data_fragments(g.vertices, node_attrs),
            F.lit("</node>"),
        ).alias("line"),
    )
    edges = g.edges.select(
        F.lit(2).alias("sect"),
        F.col("src").alias("k"),
        F.concat(
            F.format_string('    <edge source="%d" target="%d">', "src", "dst"),
            _data_fragments(g.edges, edge_attrs),
            F.lit("</edge>"),
        ).alias("line"),
    )
    tail = spark.createDataFrame(
        [(3, 0, "  </graph>\n</graphml>")], "sect long, k long, line string"
    )
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


def _coerce(text: str, xml_type: str):
    if text is None:
        return None
    if xml_type in ("long", "int"):
        return int(text)
    if xml_type in ("double", "float"):
        return float(text)
    if xml_type == "boolean":
        return text.strip().lower() == "true"
    return text


def read_graphml(
    spark: SparkSession, path: str, *, max_bytes: int = 256 * 1024 * 1024
) -> SparkGraph:
    """Parse a ``.graphml`` file (``graphml.py:238``): integer node ids,
    typed node/edge attribute <key>s (long/double/boolean/string; the
    ``weight`` edge attr defaults to 1.0 when undeclared); edge direction
    from the graph's ``edgedefault``."""
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

    # key id → (domain, attr name, xml type)
    keys = {}
    for k in root.findall(f"{ns}key"):
        keys[k.get("id")] = (
            k.get("for", "all"),
            k.get("attr.name"),
            k.get("attr.type", "string"),
        )
    node_attrs = [
        (kid, n, t) for kid, (d, n, t) in keys.items() if d in ("node", "all")
    ]
    edge_attrs = [
        (kid, n, t)
        for kid, (d, n, t) in keys.items()
        if d in ("edge", "all") and n != "weight"
    ]
    weight_keys = {
        kid for kid, (d, n, _) in keys.items() if n == "weight" and d != "node"
    }

    def element_data(el):
        return {d.get("key"): d.text for d in el.findall(f"{ns}data")}

    nodes = []
    for n in graph.findall(f"{ns}node"):
        data = element_data(n)
        nodes.append(
            tuple(
                [int(n.get("id"))]
                + [_coerce(data.get(kid), t) for kid, _, t in node_attrs]
            )
        )
    edges = []
    for e in graph.findall(f"{ns}edge"):
        data = element_data(e)
        w = 1.0
        for kid in weight_keys:
            if data.get(kid) is not None:
                w = float(data[kid])
        edges.append(
            tuple(
                [int(e.get("source")), int(e.get("target")), w]
                + [_coerce(data.get(kid), t) for kid, _, t in edge_attrs]
            )
        )

    e_schema = StructType(
        [
            StructField("src", LongType(), False),
            StructField("dst", LongType(), False),
            StructField("weight", DoubleType(), True),
        ]
        + [
            StructField(name, _SPARK_TYPE.get(t, StringType()), True)
            for _, name, t in edge_attrs
        ]
    )
    v_schema = StructType(
        [StructField("id", LongType(), False)]
        + [
            StructField(name, _SPARK_TYPE.get(t, StringType()), True)
            for _, name, t in node_attrs
        ]
    )
    e_df = spark.createDataFrame(edges or [], e_schema)
    v_df = spark.createDataFrame(nodes or [], v_schema)
    return SparkGraph(e_df, vertices=v_df, directed=directed, coalesce_edges=False)


class GraphMLWriter:
    """``graphml.py`` ``GraphMLWriter`` — thin class facade over
    :func:`write_graphml` for reference-API compatibility: collect graphs
    with ``add_graph_element`` and ``dump`` to a file path."""

    def __init__(self):
        self._graphs = []

    def add_graph_element(self, g: SparkGraph) -> None:
        self._graphs.append(g)

    def dump(self, path: str) -> None:
        if len(self._graphs) != 1:
            raise ValueError("GraphMLWriter.dump expects exactly one graph")
        write_graphml(self._graphs[0], path)


class GraphMLReader:
    """``graphml.py`` ``GraphMLReader`` — callable facade over
    :func:`read_graphml`; returns a one-element list like the
    reference's reader yields graphs."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __call__(self, path: str):
        return [read_graphml(self.spark, path)]
