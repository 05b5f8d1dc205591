"""node-link JSON interop (``networkx/readwrite/json_graph/node_link.py``).

``node_link_data`` (``node_link.py:26``) / ``node_link_graph``
(``node_link.py:142``) with the 3.x keys: ``{"directed", "multigraph",
"graph", "nodes": [{"id": ...}], "links": [{"source", "target",
"weight"}]}``.

The node-link format is a SINGLE JSON document — an interop/export format,
not a data-plane format — so ``node_link_data`` collects to the driver and
is for test/exchange-scale graphs only (the engine's scale formats are
parquet and the edge-list/adjlist text scans). ``node_link_graph`` builds
the distributed graph from a dict; ``read/write_node_link_json`` wrap file
IO.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from linkgraph.graph import SparkGraph, EDGE_SCHEMA, VERTEX_SCHEMA


def node_link_data(g: SparkGraph) -> dict:
    """``node_link.py:26`` — driver-side dict; small graphs only. Node and
    edge attribute columns ride along as extra keys (null attrs omitted,
    like the reference's absent dict entries)."""
    nattrs = g.node_attr_names
    eattrs = g.edge_attr_names
    nodes = [
        {"id": r["id"], **{a: r[a] for a in nattrs if r[a] is not None}}
        for r in g.vertices.sort("id").collect()
    ]
    links = [
        {
            "source": r["src"],
            "target": r["dst"],
            "weight": r["weight"],
            **{a: r[a] for a in eattrs if r[a] is not None},
        }
        for r in g.edges.sort("src", "dst").collect()
    ]
    return {
        "directed": g.directed,
        "multigraph": False,
        "graph": {},
        "nodes": nodes,
        "links": links,
    }


def node_link_graph(spark: SparkSession, data: dict) -> SparkGraph:
    """``node_link.py:142`` — build a SparkGraph from node-link data.
    Extra node/link keys become attribute columns (types inferred by
    Spark's Row inference)."""
    from pyspark.sql import Row

    links = data.get("links", [])
    nodes = data.get("nodes", [])
    eattrs = sorted({k for l in links for k in l} - {"source", "target", "weight"})
    nattrs = sorted({k for n in nodes for k in n} - {"id"})

    if eattrs and links:
        edf = spark.createDataFrame(
            [
                Row(
                    src=int(l["source"]),
                    dst=int(l["target"]),
                    weight=float(l.get("weight", 1.0)),
                    **{a: l.get(a) for a in eattrs},
                )
                for l in links
            ]
        )
    else:
        edge_rows = [
            (int(l["source"]), int(l["target"]), float(l.get("weight", 1.0)))
            for l in links
        ]
        edf = spark.createDataFrame(edge_rows, schema=EDGE_SCHEMA) if edge_rows else (
            spark.createDataFrame([], schema=EDGE_SCHEMA)
        )
    if nattrs and nodes:
        vdf = spark.createDataFrame(
            [Row(id=int(n["id"]), **{a: n.get(a) for a in nattrs}) for n in nodes]
        )
    else:
        vert_rows = [(int(n["id"]),) for n in nodes]
        vdf = spark.createDataFrame(vert_rows, schema=VERTEX_SCHEMA) if vert_rows else (
            spark.createDataFrame([], schema=VERTEX_SCHEMA)
        )
    return SparkGraph(
        edf, vdf, directed=bool(data.get("directed", False)), coalesce_edges=False
    )


def write_node_link_json(g: SparkGraph, path: str) -> None:
    with open(path, "w") as f:
        json.dump(node_link_data(g), f)


def read_node_link_json(spark: SparkSession, path: str) -> SparkGraph:
    with open(path) as f:
        return node_link_graph(spark, json.load(f))
