"""LEDA.GRAPH reader — ``networkx/readwrite/leda.py`` (``read_leda:23``,
``parse_leda:49``). The reference is read-only for this format (no
``write_leda`` exists), so parity here is parse-side.

Format (published LEDA book spec): a ``LEDA.GRAPH`` header, the node and
edge parameter types, ``-1`` (directed) / ``-2`` (undirected), then the
node count + one ``|{label}|`` line per node, then the edge count + one
``source target reversal |{label}|`` line per edge; ``#`` comments and
blank lines are skipped.

The reference keys nodes by their label string; the engine's BIGINT data
model keeps the LEDA node number (1..n) as ``id`` and carries the label
as a vertex attribute column, with the edge label as an edge attribute
column — the documented string-label convention shared with pajek IO.
Parsing is driver-side (the section layout is order-dependent, not
splittable); the result is a normal distributed :class:`SparkGraph`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph

__all__ = ["parse_leda", "read_leda"]


def parse_leda(spark: SparkSession, lines) -> SparkGraph:
    """``leda.py:49`` — parse LEDA.GRAPH text (a string or line iterable)."""
    if isinstance(lines, str):
        lines = iter(lines.split("\n"))
    content = [
        line.rstrip("\n")
        for line in lines
        if not (line.startswith("#") or line.startswith("\n") or line == "")
    ]
    try:
        if content[0] != "LEDA.GRAPH":
            raise NetworkXError("Not a valid LEDA.GRAPH file (missing header)")
        du = int(content[3])  # -1 directed, -2 undirected
        n = int(content[4])
        node_labels = []
        for k in range(n):
            node_labels.append(content[5 + k].strip("|{}|  "))
        m = int(content[5 + n])
        edges = []
        for line in content[6 + n : 6 + n + m]:
            parts = line.split()
            if len(parts) < 4:
                raise NetworkXError(f"Too few fields in LEDA.GRAPH edge {line}")
            s, t = int(parts[0]), int(parts[1])
            label = " ".join(parts[3:]).strip("|{}|  ")
            edges.append((s, t, label))
    except (IndexError, ValueError) as exc:
        raise NetworkXError(f"Not a valid LEDA.GRAPH file: {exc}") from exc

    v = spark.createDataFrame(
        [(i + 1, lab) for i, lab in enumerate(node_labels)] or [(0, "")],
        "id long, label string",
    )
    if not node_labels:
        v = v.limit(0)
    e = spark.createDataFrame(
        [(s, t, lab) for s, t, lab in edges] or [(0, 0, "")],
        "src long, dst long, label string",
    )
    if not edges:
        e = e.limit(0)
    return SparkGraph(
        e, vertices=v, directed=(du == -1), coalesce_edges=False
    )


def read_leda(spark: SparkSession, path: str) -> SparkGraph:
    """``leda.py:23``."""
    with open(path, "r", encoding="utf-8") as fh:
        return parse_leda(spark, fh.read())
