"""GML IO — ``networkx/readwrite/gml.py`` (``read_gml:116``,
``write_gml:818``) for the engine's data model (BIGINT ids, DOUBLE
``weight``, plus open-schema node/edge attribute columns: numeric attrs
emit bare, strings emit GML-quoted — the reference's per-element attr
dicts, ``gml.py:711`` ``gml_str``).

Same parallelism posture as GraphML: fragments build distributed, the
single document is laid down by one ordered writer; reading parses the
block-structured text on the driver under a size guard (GML blocks span
lines, so the file is not safely splittable without a two-pass scan).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from linkgraph.graph import SparkGraph

_NUMERIC = {"bigint", "int", "smallint", "tinyint", "double", "float"}


def _gml_value(name: str, dtype: str) -> Column:
    """`    name value` fragment; numbers bare, strings quoted with the
    reference's escapes (``gml.py:769``: ``&`` and ``"`` entity-encoded)."""
    if dtype in _NUMERIC:
        val = F.col(name).cast("string")
    else:
        esc = F.regexp_replace(F.col(name).cast("string"), "&", "&amp;")
        esc = F.regexp_replace(esc, '"', "&#34;")
        val = F.concat(F.lit('"'), esc, F.lit('"'))
    return F.when(
        F.col(name).isNotNull(), F.concat(F.lit(f"\n    {name} "), val)
    ).otherwise(F.lit(""))


def _attr_fragments(df: DataFrame, skip: "set[str]") -> Column:
    parts = [_gml_value(n, t) for n, t in df.dtypes if n not in skip]
    return F.concat(*parts) if parts else F.lit("")


def write_gml(g: SparkGraph, path: str) -> None:
    """``gml.py:818`` — node ``id`` + attr columns, edge
    ``source/target/weight`` + attr columns, graph ``directed`` flag."""
    spark = g.spark
    head_lines = "graph [\n  directed " + ("1" if g.directed else "0")
    head = spark.createDataFrame(
        [(0, 0, head_lines)], "sect long, k long, line string"
    )
    nodes = g.vertices.select(
        F.lit(1).alias("sect"),
        F.col("id").alias("k"),
        F.concat(
            F.format_string("  node [\n    id %d", "id"),
            _attr_fragments(g.vertices, {"id"}),
            F.lit("\n  ]"),
        ).alias("line"),
    )
    edges = g.edges.select(
        F.lit(2).alias("sect"),
        F.col("src").alias("k"),
        F.concat(
            F.format_string("  edge [\n    source %d\n    target %d", "src", "dst"),
            _attr_fragments(g.edges, {"src", "dst"}),
            F.lit("\n  ]"),
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
_FIELD_RE = re.compile(r'^\s*(\w+)\s+(?:"((?:[^"\\]|\\.)*)"|(-?[\w.+eE]+))\s*$', re.M)


def _unescape(s: str) -> str:
    return s.replace("&#34;", '"').replace("&amp;", "&")


def _parse_block(block: str) -> dict:
    out = {}
    for m in _FIELD_RE.finditer(block):
        name, quoted, bare = m.group(1), m.group(2), m.group(3)
        if quoted is not None:
            out[name] = _unescape(quoted)
        else:
            out[name] = bare
    return out


def _infer(values):
    """long if every non-null parses as int, else double, else string."""

    def _all(parse):
        ok = False
        for v in values:
            if v is None:
                continue
            ok = True
            try:
                parse(v)
            except (TypeError, ValueError):
                return False
        return ok

    if _all(int):
        return LongType(), int
    if _all(float):
        return DoubleType(), float
    return StringType(), str


def read_gml(
    spark: SparkSession, path: str, *, max_bytes: int = 256 * 1024 * 1024
) -> SparkGraph:
    """``gml.py:116`` — integer ids, optional ``weight``, ``directed 1``
    flag, plus any extra node/edge fields (types inferred: long, double,
    else string); tolerant of the reference writer's ``label`` fields."""
    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"read_gml: {size} bytes exceeds max_bytes={max_bytes}; "
            "GML blocks span lines — convert bulk graphs to parquet"
        )
    text = open(path, encoding="utf-8").read()
    directed = bool(re.search(r"\bdirected\s+1\b", text))

    node_blocks = [_parse_block(m.group(1)) for m in _NODE_RE.finditer(text)]
    edge_blocks = [_parse_block(m.group(1)) for m in _EDGE_RE.finditer(text)]

    node_attr_names = sorted(
        {k for b in node_blocks for k in b} - {"id", "label"}
    )
    edge_attr_names = sorted(
        {k for b in edge_blocks for k in b} - {"source", "target", "weight"}
    )

    v_fields = [StructField("id", LongType(), False)]
    v_casts = []
    for name in node_attr_names:
        t, cast = _infer([b.get(name) for b in node_blocks])
        v_fields.append(StructField(name, t, True))
        v_casts.append(cast)
    nodes = []
    for b in node_blocks:
        if "id" not in b:
            continue
        row = [int(float(b["id"]))]
        for name, cast in zip(node_attr_names, v_casts):
            v = b.get(name)
            row.append(cast(v) if v is not None else None)
        nodes.append(tuple(row))

    e_fields = [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("weight", DoubleType(), True),
    ]
    e_casts = []
    for name in edge_attr_names:
        t, cast = _infer([b.get(name) for b in edge_blocks])
        e_fields.append(StructField(name, t, True))
        e_casts.append(cast)
    edges = []
    for b in edge_blocks:
        if "source" not in b or "target" not in b:
            continue
        row = [
            int(float(b["source"])),
            int(float(b["target"])),
            float(b.get("weight", 1.0)),
        ]
        for name, cast in zip(edge_attr_names, e_casts):
            v = b.get(name)
            row.append(cast(v) if v is not None else None)
        edges.append(tuple(row))

    e_df = spark.createDataFrame(edges or [], StructType(e_fields))
    v_df = spark.createDataFrame(nodes or [], StructType(v_fields))
    return SparkGraph(e_df, vertices=v_df, directed=directed, coalesce_edges=False)
