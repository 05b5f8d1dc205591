"""Clique enumeration — the distributable slice of
``networkx/algorithms/clique.py`` (``find_cliques:103`` Bron-Kerbosch,
``enumerate_all_cliques:50``, ``number_of_cliques``).

The reference's recursive Bron-Kerbosch is a depth-first search with
pivoting — inherently sequential. The distributed twin is the standard
ordered k-clique JOIN plan (the triangles wedge-join generalized, cf.
Afrati et al., "Enumerating subgraph instances using map-reduce"):

1. Orient every edge by the degree total order (``du < dv`` or tie on id)
   — the same acyclic orientation triangle counting uses, which caps the
   join fan-out at the graph's degeneracy instead of its max degree.
2. A (k+1)-clique is a k-clique ``M`` plus a node ``c`` reachable from
   M's LAST member via an oriented arc and adjacent to every member:
   one equi-join to produce candidates, one explode+join+count to verify
   full adjacency — two shuffles per size step, all sizes batched per
   step, no recursion.

``enumerate`` state grows with the clique count — the intrinsic output
size (the reference pays the same in time). ``max_size`` caps the
extension depth; without it the loop stops at the clique number ω(G)
when no extension survives.

``find_cliques`` (maximal cliques) = the k-cliques minus those contained
in any (k+1)-clique; containment is an anti-join against the
(k+1)-cliques' drop-one subsets (arrays stay sorted in orientation
order, so subset = array equality after removing one position).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache
from linkgraph.exceptions import NotImplementedForDirected


def _oriented(g: SparkGraph):
    """(oriented arcs (s, d), symmetric simple arcs (u, v)) — degree order."""
    if g.directed:
        raise NotImplementedForDirected(
            "cliques: not implemented for directed type"
        )
    e = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        e.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
    )
    oriented = with_deg.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
        .alias("o")
    ).select(F.col("o.s").alias("s"), F.col("o.d").alias("d"))
    return oriented


def _extend(cliques: DataFrame, oriented: DataFrame, size: int) -> DataFrame:
    """(members, last) k-cliques → (k+1)-cliques: candidates from the last
    member's oriented out-arcs, verified adjacent to every member."""
    cand = cliques.join(
        oriented.select(F.col("s").alias("last"), F.col("d").alias("c")), "last"
    )
    # count oriented arcs member -> c over all members; == size means c
    # is adjacent to every member (orientation order makes all such arcs
    # point member -> c, since c is above every member in the order)
    checked = (
        cand.select("members", "c", F.explode("members").alias("m"))
        .join(
            oriented.select(F.col("s").alias("m"), F.col("d").alias("c")),
            ["m", "c"],
            "left_semi",
        )
        .groupBy("members", "c")
        .agg(F.count(F.lit(1)).alias("adj"))
        .filter(F.col("adj") == size)
    )
    return checked.select(
        F.concat("members", F.array("c")).alias("members"),
        F.col("c").alias("last"),
    )


def k_cliques(g: SparkGraph, k: int) -> DataFrame:
    """DataFrame ``(members array<BIGINT>)`` — every k-clique once, members
    in degree-orientation order."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if k == 1:
        return g.vertices.select(F.array("id").alias("members"))
    cache = SuperstepCache(g.spark)
    oriented = cache.truncate(_oriented(g))
    cur = oriented.select(
        F.array("s", "d").alias("members"), F.col("d").alias("last")
    )
    size = 2
    while size < k:
        cur = cache.truncate(_extend(cur, oriented, size))
        size += 1
        if cur.limit(1).count() == 0:
            break
    out = cur.select("members").localCheckpoint(eager=True)
    cache.close(keep_result=True)
    return out if size == k else g.spark.createDataFrame([], "members array<bigint>")


def k_clique_count(g: SparkGraph, k: int) -> int:
    """Number of k-cliques."""
    return k_cliques(g, k).count()


def node_clique_counts(g: SparkGraph, k: int) -> DataFrame:
    """(id, cliques BIGINT): how many k-cliques each node belongs to —
    the per-size slice of ``number_of_cliques``. Nodes in none get 0."""
    counts = (
        k_cliques(g, k)
        .select(F.explode("members").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("cliques"))
    )
    return (
        g.vertices.select("id")
        .join(counts, "id", "left")
        .select("id", F.coalesce("cliques", F.lit(0)).alias("cliques"))
    )


def find_cliques(g: SparkGraph, max_size: Optional[int] = None) -> DataFrame:
    """DataFrame ``(members array<BIGINT>)`` — the MAXIMAL cliques
    (``clique.py:103`` ``find_cliques`` semantics; isolated vertices are
    their own maximal 1-cliques, matching the reference). ``max_size``
    caps enumeration (cliques above the cap are neither returned nor used
    to disqualify smaller ones); without it the loop runs to ω(G)."""
    spark = g.spark
    cache = SuperstepCache(spark)
    oriented = cache.truncate(_oriented(g))

    # 1-cliques: isolated vertices only (any edge-covered vertex is in a
    # 2-clique); they are maximal by definition
    endpoints = oriented.select(F.col("s").alias("id")).unionAll(
        oriented.select(F.col("d").alias("id"))
    )
    singletons = (
        g.vertices.select("id")
        .join(endpoints, "id", "left_anti")
        .select(F.array("id").alias("members"))
    )

    levels = []  # per size: (members, last)
    cur = oriented.select(
        F.array("s", "d").alias("members"), F.col("d").alias("last")
    )
    size = 2
    while True:
        cur = cache.truncate(cur)
        if cur.limit(1).count() == 0:
            break
        levels.append((size, cur))
        if max_size is not None and size >= max_size:
            break
        cur = _extend(cur, oriented, size)
        size += 1

    out = singletons
    for i, (size, lvl) in enumerate(levels):
        if i + 1 < len(levels):
            bigger = levels[i + 1][1]
            # drop-one subsets of each (size+1)-clique, as sorted arrays
            subsets = bigger.select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(size)),
                        lambda idx: F.filter(
                            "members", lambda _, j: j != idx
                        ),
                    )
                ).alias("members")
            ).distinct()
            maximal = lvl.select("members").join(
                subsets, "members", "left_anti"
            )
        else:
            maximal = lvl.select("members")
        out = out.unionByName(maximal)
    out = out.localCheckpoint(eager=True)
    cache.close(keep_result=True)
    return out
