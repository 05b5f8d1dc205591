"""Line graphs.

Reference: ``networkx/generators/line.py:15`` ``line_graph`` —
``_lg_undirected`` (:153) makes one L-node per canonical edge and one
clique per G-node over its incident edges; ``_lg_directed`` (:123) links
arc (u, v) to every arc (v, w).

Both forms are single self-joins here — the undirected clique expansion is
an incidence self-join keyed on the shared endpoint (output size
Σ_v C(deg v, 2), inherent to the definition: the join cannot produce fewer
rows than the line graph has edges), and the directed form is one
``a.dst = b.src`` equi-join. L-node identity stays relational: each
line-graph node is its original endpoint pair (u, v), and the SparkGraph
form derives a synthetic 64-bit id with ``xxhash64(u, v)``.

Scale note: hub nodes contribute C(deg, 2) rows. For power-law webgraphs
compute ``line_graph_edges`` on a degree-capped or k-core-restricted view
first (the standard practice); the join itself partitions on the shared
endpoint, so skew salting applies as for any hub-keyed self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph

__all__ = ["line_graph_edges", "line_graph"]


def line_graph_edges(g: SparkGraph) -> DataFrame:
    """L(G) edges as endpoint pairs ``(u1, v1, u2, v2)``.

    Undirected (``line.py:153``): L-nodes are canonical ``(u <= v)`` edges;
    two distinct edges are adjacent iff they share an endpoint; rows are
    canonical (``(u1, v1) <lex (u2, v2)``) and distinct. Directed
    (``line.py:123``): arc (u1, v1) → (u2, v2) iff ``v1 == u2`` (self-loop
    arcs yield L-self-loops, as in the reference).
    """
    if g.directed:
        a = g.edges.select(F.col("src").alias("u1"), F.col("dst").alias("v1"))
        b = g.edges.select(F.col("src").alias("u2"), F.col("dst").alias("v2"))
        return a.join(b, a["v1"] == b["u2"]).select("u1", "v1", "u2", "v2")
    # incidence rows: one per (endpoint, canonical edge); self-loops once
    e = g.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    inc = e.select(F.col("u").alias("node"), "u", "v").unionByName(
        e.filter(F.col("u") != F.col("v")).select(
            F.col("v").alias("node"), "u", "v"
        )
    )
    a = inc.select("node", F.col("u").alias("u1"), F.col("v").alias("v1"))
    b = inc.select("node", F.col("u").alias("u2"), F.col("v").alias("v2"))
    pairs = a.join(b, "node").filter(
        (F.col("u1") < F.col("u2"))
        | ((F.col("u1") == F.col("u2")) & (F.col("v1") < F.col("v2")))
    )
    return pairs.select("u1", "v1", "u2", "v2").distinct()


def line_graph(g: SparkGraph) -> SparkGraph:
    """L(G) as a SparkGraph (``line.py:15``): vertices carry the original
    endpoint pair columns ``(u, v)``; ids are ``xxhash64(u, v)`` over the
    canonical pair. Isolated L-nodes (edges with no incident partner) are
    preserved via the explicit vertex set, like the reference's
    ``L.add_node`` for single-edge stars."""
    verts = g.edges.select(
        F.xxhash64("src", "dst").alias("id"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
    ).distinct()
    le = line_graph_edges(g)
    edges = le.select(
        F.xxhash64("u1", "v1").alias("src"), F.xxhash64("u2", "v2").alias("dst")
    )
    return SparkGraph(
        edges, verts, directed=g.directed, coalesce_edges=False
    )
