"""Bounded simple-cycle enumeration —
``networkx/algorithms/cycles.py:106`` ``simple_cycles`` with the 3.x
``length_bound`` parameter.

The reference's unbounded enumeration is Johnson's algorithm — a stack
of blocked sets walked depth-first, inherently sequential. The bounded
variant is join-expressible and is what scales: grow rooted simple paths
breadth-first, one arc join per length step, emitting a cycle whenever an
arc closes back to the root.

Canonical form kills duplicates without comparing cycles pairwise:

- every cycle is discovered exactly once rooted at its MINIMUM node
  (extension candidates must exceed the root);
- directed cycles read in arc direction from the root — unique;
- undirected cycles would appear once per direction, so the second
  element must be smaller than the last (picks one rotation sense);
  length-2 "cycles" (back-and-forth over one edge) are not simple and
  are excluded, matching the reference on simple graphs.

State after step L is every simple path of length L from a root through
larger-id nodes — the intrinsic cost of bounded cycle enumeration (the
reference's bounded search walks the same tree sequentially). Self-loops
emit as length-1 cycles like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache


def simple_cycles(g: SparkGraph, length_bound: int) -> DataFrame:
    """DataFrame ``(cycle array<BIGINT>)`` — each simple cycle of length
    <= ``length_bound`` exactly once, in canonical rotation (min node
    first). ``length_bound`` is required: unbounded enumeration is
    Johnson's sequential algorithm and does not distribute."""
    if length_bound is None or length_bound < 1:
        raise ValueError("length_bound must be a positive integer")
    spark = g.spark
    arcs = (g.edges if g.directed else g.symmetric_edges()).select(
        "src", "dst"
    ).distinct()

    out = None

    # length-1 cycles: self-loops (cycles.py yields [v] for them)
    loops = arcs.filter(F.col("src") == F.col("dst")).select(
        F.array("src").alias("cycle")
    )
    out = loops

    if length_bound >= 2:
        cache = SuperstepCache(spark)
        arcs_ns = cache.truncate(arcs.filter(F.col("src") != F.col("dst")))
        # paths (root, path, last): start with root -> x, x > root
        paths = arcs_ns.filter(F.col("dst") > F.col("src")).select(
            F.col("src").alias("root"),
            F.array("src", "dst").alias("path"),
            F.col("dst").alias("last"),
        )
        length = 2  # closing now yields a cycle of this length
        while True:
            paths = cache.truncate(paths)
            closing = paths.join(
                arcs_ns.select(
                    F.col("src").alias("last"), F.col("dst").alias("root")
                ),
                ["last", "root"],
                "left_semi",
            )
            if g.directed:
                if length >= 2:
                    cyc = closing.select(F.col("path").alias("cycle"))
                    # directed 2-cycles (u,v),(v,u) are simple cycles
                    out = out.unionByName(cyc)
            else:
                # undirected: one rotation sense, length >= 3
                if length >= 3:
                    cyc = closing.filter(
                        F.col("path")[1] < F.col("path")[length - 1]
                    ).select(F.col("path").alias("cycle"))
                    out = out.unionByName(cyc)
            if length >= length_bound:
                break
            ext = (
                paths.join(
                    arcs_ns.select(
                        F.col("src").alias("last"), F.col("dst").alias("nxt")
                    ),
                    "last",
                )
                .filter(
                    (F.col("nxt") > F.col("root"))
                    & ~F.array_contains("path", F.col("nxt"))
                )
                .select(
                    "root",
                    F.concat("path", F.array("nxt")).alias("path"),
                    F.col("nxt").alias("last"),
                )
            )
            paths = ext
            length += 1
            if paths.limit(1).count() == 0:
                break
        result = out.localCheckpoint(eager=True)
        cache.close(keep_result=True)
        return result
    return out.localCheckpoint(eager=True)


def is_eulerian(g) -> bool:
    """``networkx/algorithms/euler.py:18``: every degree even + connected
    (undirected), or in==out everywhere + strongly connected (directed)."""
    from pyspark.sql import functions as F
    from linkgraph.algos.degrees import in_degrees, out_degrees, degrees
    from linkgraph.algos.components import connected_components
    from linkgraph.algos.strongly_connected import strongly_connected_components

    if g.directed:
        bal = (
            in_degrees(g).withColumnRenamed("degree", "din")
            .join(out_degrees(g).withColumnRenamed("degree", "dout"), "id")
            .filter(F.col("din") != F.col("dout"))
        )
        if not bal.isEmpty():
            return False
        scc = strongly_connected_components(g)
        return scc.select("component").distinct().count() == 1
    odd = degrees(g).filter(F.col("degree") % 2 == 1)
    if not odd.isEmpty():
        return False
    return connected_components(g).select("component").distinct().count() == 1


def has_eulerian_path(g) -> bool:
    """``euler.py:57``: Eulerian, or exactly one unbalanced pair (directed)
    / exactly two odd-degree vertices (undirected), and (weakly)
    connected."""
    from pyspark.sql import functions as F
    from linkgraph.algos.degrees import in_degrees, out_degrees, degrees
    from linkgraph.algos.components import connected_components

    if is_eulerian(g):
        return True
    if g.directed:
        bal = (
            in_degrees(g).withColumnRenamed("degree", "din")
            .join(out_degrees(g).withColumnRenamed("degree", "dout"), "id")
            .select((F.col("din") - F.col("dout")).alias("d"))
        )
        counts = bal.groupBy("d").count().collect()
        ins = sum(r["count"] for r in counts if r["d"] == 1)
        outs = sum(r["count"] for r in counts if r["d"] == -1)
        bad = sum(r["count"] for r in counts if abs(r["d"]) > 1)
        if bad or ins > 1 or outs > 1:
            return False
        return connected_components(g).select("component").distinct().count() == 1
    n_odd = degrees(g).filter(F.col("degree") % 2 == 1).count()
    if n_odd != 2:
        return False
    return connected_components(g).select("component").distinct().count() == 1
