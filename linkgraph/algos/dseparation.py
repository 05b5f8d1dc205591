"""d-separation on DAGs.

Reference: ``networkx/algorithms/d_separation.py:231`` ``is_d_separator`` —
the two-deque modified Bayes-Ball walk (van der Zander & Liśkiewicz 2020):
a *backward* frontier carries the ball arriving against arc direction, a
*forward* frontier with it. Expansion rules, mirrored exactly:

- backward node ∉ Z: parents stay backward, children go forward;
  backward node ∈ Z: blocked.
- forward node ∈ ancestors(X) ∪ X ∪ Z: parents go backward (the collider
  ``→ w ←`` opens); forward node ∉ Z: children stay forward.
- X and Y are d-connected iff either walk ever reaches Y.

The distributed twin advances BOTH frontiers one superstep at a time
(frontier ⋈ arcs joins with per-mode visited anti-joins) — the same
O(n + m) total state the reference touches, sharded. The ancestor set
comes from one reverse multi-source BFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.exceptions import NetworkXError, NotImplementedForDirected
from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache

__all__ = ["is_d_separator"]


def _ids(df: DataFrame) -> DataFrame:
    return df.select(F.col(df.columns[0]).cast("long").alias("id")).distinct()


def is_d_separator(
    g: SparkGraph, x: DataFrame, y: DataFrame, z: DataFrame
) -> bool:
    """True iff the node set ``z`` d-separates ``x`` from ``y`` in the DAG
    (``d_separation.py:231``). ``x``/``y``/``z`` are one-column id
    DataFrames. Raises like the reference: on undirected input, on
    non-disjoint sets, on unknown nodes, and on cyclic graphs.
    """
    if not g.directed:
        raise NotImplementedForDirected(
            "is_d_separator: not implemented for undirected type"
        )
    x, y, z = _ids(x), _ids(y), _ids(z)
    for a, b, names in ((x, y, "x∩y"), (x, z, "x∩z"), (y, z, "y∩z")):
        if a.join(b, "id", "left_semi").limit(1).count():
            raise NetworkXError(f"The sets are not disjoint ({names} nonempty)")
    all_ids = x.unionAll(y).unionAll(z).distinct()
    if all_ids.join(g.vertices.select("id"), "id", "left_anti").limit(1).count():
        raise ValueError("The node(s) are not found in G")
    from linkgraph.algos.dag import is_directed_acyclic_graph

    if not is_directed_acyclic_graph(g):
        raise NetworkXError("graph should be directed acyclic")

    from linkgraph.algos.setops import shortest_path_lengths

    spark = g.spark
    arcs = g.edges.select("src", "dst").distinct().persist()
    z = z.persist()
    y = y.persist()
    # ancestors(X) ∪ X ∪ Z — the forward-collider opening set
    anc_or_z = (
        shortest_path_lengths(g.reverse(), x)
        .select("id")
        .unionAll(z.select("id"))
        .distinct()
        .persist()
    )

    cache = SuperstepCache(spark)
    bwd_frontier = cache.truncate(x)
    fwd_frontier = None  # empty
    bwd_seen = bwd_frontier
    fwd_seen = None
    try:
        # the start set itself may touch nothing; X∩Y is impossible (disjoint)
        while True:
            new_bwd_parts = []
            new_fwd_parts = []
            if bwd_frontier is not None:
                b_act = bwd_frontier.join(z, "id", "left_anti")
                new_bwd_parts.append(
                    arcs.join(b_act.withColumnRenamed("id", "dst"), "dst")
                    .select(F.col("src").alias("id"))
                )
                new_fwd_parts.append(
                    arcs.join(b_act.withColumnRenamed("id", "src"), "src")
                    .select(F.col("dst").alias("id"))
                )
            if fwd_frontier is not None:
                f_open = fwd_frontier.join(anc_or_z, "id", "left_semi")
                new_bwd_parts.append(
                    arcs.join(f_open.withColumnRenamed("id", "dst"), "dst")
                    .select(F.col("src").alias("id"))
                )
                f_pass = fwd_frontier.join(z, "id", "left_anti")
                new_fwd_parts.append(
                    arcs.join(f_pass.withColumnRenamed("id", "src"), "src")
                    .select(F.col("dst").alias("id"))
                )
            if not new_bwd_parts and not new_fwd_parts:
                return True

            def _merge(parts, seen):
                if not parts:
                    return None
                out = parts[0]
                for p in parts[1:]:
                    out = out.unionAll(p)
                out = out.distinct()
                if seen is not None:
                    out = out.join(seen, "id", "left_anti")
                return out

            nb = _merge(new_bwd_parts, bwd_seen)
            nf = _merge(new_fwd_parts, fwd_seen)
            nb = cache.truncate(nb) if nb is not None else None
            nf = cache.truncate(nf) if nf is not None else None
            nb_n = nb.count() if nb is not None else 0
            nf_n = nf.count() if nf is not None else 0
            if nb_n == 0:
                nb = None
            if nf_n == 0:
                nf = None
            if nb is None and nf is None:
                return True
            # reached Y in either mode → d-connected
            touch = None
            if nb is not None:
                touch = nb
            if nf is not None:
                touch = nf if touch is None else touch.unionAll(nf)
            if touch.join(y, "id", "left_semi").limit(1).count():
                return False
            if nb is not None:
                bwd_seen = cache.truncate(
                    nb if bwd_seen is None else bwd_seen.unionAll(nb).distinct()
                )
            if nf is not None:
                fwd_seen = cache.truncate(
                    nf if fwd_seen is None else fwd_seen.unionAll(nf).distinct()
                )
            bwd_frontier, fwd_frontier = nb, nf
    finally:
        arcs.unpersist()
        z.unpersist()
        y.unpersist()
        anc_or_z.unpersist()
