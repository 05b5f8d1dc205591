"""Matching predicates and minimum edge covers.

Reference: ``networkx/algorithms/matching.py:86`` ``is_matching``, ``:147``
``is_maximal_matching``, ``:209`` ``is_perfect_matching``;
``networkx/algorithms/covering.py:15`` ``min_edge_cover``, ``:99``
``is_edge_cover``.

The predicates are pure joins/aggregations over the matching DataFrame —
one semi-join for edge validity, one groupBy for endpoint multiplicity,
one anti-join for maximality — all distributed. ``min_edge_cover`` follows
the reference's construction exactly: a maximum-cardinality matching
(the blossom kernel, driver-gated like every inherently sequential
augmenting-path method here) extended by one incident edge per uncovered
node (smallest neighbor — deterministic where the reference is
arbitrary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph

__all__ = [
    "is_matching",
    "is_maximal_matching",
    "is_perfect_matching",
    "min_edge_cover",
    "is_edge_cover",
]


def _matching_df(g: SparkGraph, matching) -> DataFrame:
    if isinstance(matching, DataFrame):
        a, b = matching.columns[0], matching.columns[1]
        m = matching.select(
            F.col(a).cast("long").alias("u"), F.col(b).cast("long").alias("v")
        )
    else:
        m = g.spark.createDataFrame(
            [(int(u), int(v)) for u, v in matching], "u long, v long"
        )
    return m


def is_matching(g: SparkGraph, matching) -> bool:
    """True iff ``matching`` is a valid matching of g (``matching.py:86``):
    every pair is an edge and no node appears twice. Raises on pairs that
    use nodes outside the graph, like the reference."""
    m = _matching_df(g, matching).persist()
    verts = g.vertices.select("id")
    bad_nodes = (
        m.select(F.col("u").alias("id"))
        .unionByName(m.select(F.col("v").alias("id")))
        .join(verts, "id", "left_anti")
    )
    if bad_nodes.limit(1).count() > 0:
        raise NetworkXError("matching contains edge with node not in G")
    sym = g.symmetric_edges().select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    non_edges = m.join(sym, ["u", "v"], "left_anti")
    if non_edges.limit(1).count() > 0:
        return False
    ends = m.select(F.col("u").alias("id")).unionByName(
        m.select(F.col("v").alias("id"))
    )
    dup = ends.groupBy("id").count().filter(F.col("count") > 1)
    return dup.limit(1).count() == 0


def is_maximal_matching(g: SparkGraph, matching) -> bool:
    """True iff valid and no graph edge has both endpoints unmatched
    (``matching.py:147``)."""
    if not is_matching(g, matching):
        return False
    m = _matching_df(g, matching)
    matched = m.select(F.col("u").alias("id")).unionByName(
        m.select(F.col("v").alias("id"))
    ).distinct()
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    free_free = e.join(
        matched.withColumnRenamed("id", "src"), "src", "left_anti"
    ).join(matched.withColumnRenamed("id", "dst"), "dst", "left_anti")
    return free_free.limit(1).count() == 0


def is_perfect_matching(g: SparkGraph, matching) -> bool:
    """True iff valid and every node is matched (``matching.py:209``)."""
    if not is_matching(g, matching):
        return False
    m = _matching_df(g, matching)
    matched = m.select(F.col("u").alias("id")).unionByName(
        m.select(F.col("v").alias("id"))
    ).distinct()
    unmatched = g.vertices.select("id").join(matched, "id", "left_anti")
    return unmatched.limit(1).count() == 0


def is_edge_cover(g: SparkGraph, cover) -> bool:
    """True iff every node is an endpoint of some cover edge
    (``covering.py:99``)."""
    c = _matching_df(g, cover)
    covered = c.select(F.col("u").alias("id")).unionByName(
        c.select(F.col("v").alias("id"))
    ).distinct()
    return g.vertices.select("id").join(covered, "id", "left_anti").limit(
        1
    ).count() == 0


def min_edge_cover(g: SparkGraph) -> DataFrame:
    """A minimum-cardinality edge cover as a DataFrame ``(u, v)``
    (``covering.py:15``): maximum matching (blossom) + the smallest
    incident edge for every uncovered node. |cover| = n − |max matching|,
    the Gallai identity the parity tests pin."""
    if g.directed:
        raise NetworkXError("min_edge_cover is defined on undirected graphs")
    from linkgraph.algos.matching_weight import max_weight_matching

    iso = g.isolates()
    if iso.limit(1).count() > 0:
        raise NetworkXError(
            "Graph has a node with no edge incident on it, so no edge cover exists."
        )
    m = max_weight_matching(g, maxcardinality=True, weight=F.lit(1.0))
    m = m.select(F.col(m.columns[0]).alias("u"), F.col(m.columns[1]).alias("v"))
    m = m.persist()
    matched = m.select(F.col("u").alias("id")).unionByName(
        m.select(F.col("v").alias("id"))
    ).distinct()
    sym = g.symmetric_edges().select(
        F.col("src").alias("id"), F.col("dst").alias("nbr")
    ).filter(F.col("id") != F.col("nbr"))
    extra = (
        sym.join(matched, "id", "left_anti")
        .groupBy("id")
        .agg(F.min("nbr").alias("nbr"))
        .select(F.col("id").alias("u"), F.col("nbr").alias("v"))
    )
    # canonicalize and dedupe (two uncovered... cannot be adjacent, but an
    # extra edge may coincide with a matching edge orientation-flipped)
    cover = m.unionByName(extra).select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    )
    return cover.distinct()
