"""Minimum spanning tree / forest — distributed Borůvka.

Reference: ``networkx/algorithms/tree/mst.py:47`` (``boruvka_mst_edges``) —
the one MST algorithm whose structure distributes (SURVEY §2.M note):
Kruskal needs a global edge sort + a sequential union-find; Prim grows one
frontier. Borůvka instead repeats two data-parallel steps O(log n) times:

1. every component picks its minimum-weight outgoing edge (a per-key
   ``min_by`` aggregation — map-side combinable, no sort),
2. the picked edges merge their endpoint components (a connected-components
   pass over the ≤#components picked rows — the hash-to-min loop from
   :mod:`linkgraph.algos.components`, itself O(log) on an input that
   shrinks geometrically).

Tie-breaking: the reference follows Python ``min`` over ``(weight, u, v)``
iteration order, which is arbitrary for equal weights; this twin breaks
ties deterministically on ``(weight, src, dst)`` of the canonical
(src < dst) edge, so results are reproducible across runs and partition
layouts. On distinct edge weights the MST is unique and matches the
reference exactly (pinned in tests); with ties both produce *a* valid MST
of identical total weight.

Scale notes: the per-round state is one (node → component) table and the
edge table tagged with current component labels; both shuffles key on the
component id. Edges internal to a component are dropped as soon as both
endpoints agree, so the live edge set shrinks every round alongside the
component count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.algos.components import connected_components
from linkgraph.iterutils import SuperstepCache, loop_partitions

__all__ = [
    "minimum_spanning_edges",
    "minimum_spanning_tree",
    "maximum_spanning_tree",
]


def minimum_spanning_edges(
    g: SparkGraph, *, weight=None, max_rounds: int = 50, maximum: bool = False
) -> DataFrame:
    """Edges of the minimum (or maximum) spanning forest:
    ``(src BIGINT, dst BIGINT, weight DOUBLE)``, canonical ``src < dst``
    orientation. A forest: one tree per connected component
    (``nx.minimum_spanning_edges`` semantics for disconnected graphs).

    ``weight`` accepts ``None`` (the ``weight`` column), a column name, a
    SQL expression string, or a ``Column`` — the Spark twin of the
    reference's per-edge weight callable; see
    :func:`linkgraph.graph.resolve_weight_column`.
    """
    if g.directed:
        raise ValueError("minimum_spanning_edges: undirected graphs only")
    spark = g.spark
    # canonical simple edge view; parallel edges keep the best weight so the
    # per-component argmin is over the same candidate set as the reference
    from linkgraph.graph import resolve_weight_column

    best = F.min if not maximum else F.max
    wexpr = resolve_weight_column(g.edges, weight).alias("weight")
    edges = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst", wexpr)
        .groupBy("src", "dst")
        .agg(best("weight").alias("weight"))
    )
    sign = F.lit(-1.0) if maximum else F.lit(1.0)

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cache = SuperstepCache(spark)
    m = edges.count()
    parts = loop_partitions(m, cap)
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        live = cache.truncate(edges)
        # node -> component label (init: own id)
        comp = cache.truncate(
            g.vertices.select("id", F.col("id").alias("c"))
        )
        chosen = None  # accumulated forest edges
        for _ in range(max_rounds):
            lab_s = comp.select(F.col("id").alias("src"), F.col("c").alias("c_src"))
            lab_d = comp.select(F.col("id").alias("dst"), F.col("c").alias("c_dst"))
            tagged = live.join(lab_s, "src").join(lab_d, "dst")
            # drop intra-component edges permanently (they can never be picked)
            ext = tagged.filter(F.col("c_src") != F.col("c_dst"))
            # each component's best outgoing edge, deterministic tie-break on
            # (weight, src, dst); both endpoint components score the edge
            cand = ext.select(
                "src", "dst", "weight", F.col("c_src").alias("c")
            ).unionByName(
                ext.select("src", "dst", "weight", F.col("c_dst").alias("c"))
            )
            key = F.struct(
                (sign * F.col("weight")).alias("w"), F.col("src"), F.col("dst")
            )
            picked = (
                cand.groupBy("c")
                .agg(F.min_by(F.struct("src", "dst", "weight"), key).alias("e"))
                .select("e.src", "e.dst", "e.weight")
                .distinct()  # the two endpoint components may pick the same edge
            )
            picked = cache.truncate(picked)
            if picked.limit(1).count() == 0:
                break
            chosen = (
                picked
                if chosen is None
                else cache.truncate(chosen.unionByName(picked), retire=chosen)
            )
            # contract: CC over the picked component-graph merges labels
            merge_pairs = (
                picked.join(lab_s, "src")
                .join(lab_d, "dst")
                .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
            )
            merged = connected_components(
                SparkGraph(
                    merge_pairs,
                    comp.select(F.col("c").alias("id")).distinct(),
                    directed=False,
                    coalesce_edges=False,
                )
            ).select(F.col("id").alias("c"), F.col("component").alias("c_new"))
            # materialize BOTH successors before retiring either predecessor:
            # new_live's plan reads the old comp labels (via ext) and new_comp's
            # reads the old live (via merged←picked), so an early release would
            # pull checkpoint blocks out from under the other's first read
            new_live = cache.truncate(ext.select("src", "dst", "weight"))
            new_comp = cache.truncate(
                comp.join(merged, "c").select("id", F.col("c_new").alias("c"))
            )
            cache.release(live)
            cache.release(comp)
            live, comp = new_live, new_comp
        if chosen is None:
            out = spark.createDataFrame([], "src long, dst long, weight double")
        else:
            out = chosen.localCheckpoint(eager=True)
        cache.close(keep_result=True)
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def minimum_spanning_tree(
    g: SparkGraph, *, weight=None, max_rounds: int = 50
) -> SparkGraph:
    """Spanning forest as a graph over the same vertex set
    (``nx.minimum_spanning_tree``, ``tree/mst.py:579``)."""
    return SparkGraph(
        minimum_spanning_edges(g, weight=weight, max_rounds=max_rounds),
        g.vertices.select("id"),
        directed=False,
        coalesce_edges=False,
    )


def maximum_spanning_tree(
    g: SparkGraph, *, weight=None, max_rounds: int = 50
) -> SparkGraph:
    """``nx.maximum_spanning_tree`` (``tree/mst.py:661``)."""
    return SparkGraph(
        minimum_spanning_edges(g, weight=weight, max_rounds=max_rounds, maximum=True),
        g.vertices.select("id"),
        directed=False,
        coalesce_edges=False,
    )


def maximum_spanning_edges(g: SparkGraph, *, weight=None, max_rounds: int = 50) -> DataFrame:
    """``mst.py`` ``maximum_spanning_edges`` — the max-weight forest."""
    return minimum_spanning_edges(
        g, weight=weight, max_rounds=max_rounds, maximum=True
    )
