"""k-core decomposition — iterative degree peeling.

Semantics match ``networkx/algorithms/core.py``:

- ``core_number`` (``core.py:47``): largest k such that the node belongs to
  a subgraph where every node has degree >= k. Directed degree = in + out
  (``core.py:74-76``); self-loops raise (``core.py:101-106``).
- ``k_core`` (``core.py:154``): maximal subgraph with all degrees >= k;
  default k = max core number.

The reference peels with the O(m) Batagelj–Zaveršnik bucket algorithm —
inherently sequential. The distributed equivalent peels level-by-level:
for k = 0, 1, 2, …, repeatedly delete nodes whose remaining degree <= k
(assigning them core number k) until none remain at that level, then raise
k. Each peel round is one degree aggregation + one anti-join; rounds are
bounded by the degeneracy plus the peel depth per level (O(log n) typical
per level). At true web scale the h-index fixpoint of Lü et al. gives the
same numbers with fewer barriers; the level-peel keeps exact parity with
bounded, easily-verified rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache


def _arc_ends(edges: DataFrame) -> DataFrame:
    """Per-arc endpoint multiset: degree = count of incident arc ends
    (directed: in+out, core.py:74-76; undirected canonical rows count once
    per side)."""
    return edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    )


def core_number(g: SparkGraph, *, max_rounds: int = 10_000) -> DataFrame:
    """Return DataFrame ``(id BIGINT, core BIGINT)`` for every vertex."""
    if g.edges.filter(F.col("src") == F.col("dst")).limit(1).count() > 0:
        raise ValueError(
            "Input graph has self loops which is not permitted; "
            "Consider using G.remove_edges_from(nx.selfloop_edges(G))."
        )
    spark = g.spark
    cache = SuperstepCache(spark)
    edges = cache.truncate(g.edges.select("src", "dst"))
    remaining = cache.truncate(g.vertices.select("id"))
    assigned = []  # list of (DataFrame (id), k)
    k = 0
    rounds = 0
    while True:
        n_remaining = remaining.count()
        if n_remaining == 0:
            break
        deg = _arc_ends(edges).groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
        cur = remaining.join(deg, "id", "left").select(
            "id", F.coalesce("deg", F.lit(0)).alias("deg")
        )
        peel = cur.filter(F.col("deg") <= k).select("id")
        peel = cache.truncate(peel)
        if peel.count() == 0:
            k += 1
            continue
        assigned.append((peel, k))
        remaining = cache.truncate(remaining.join(peel, "id", "left_anti"))
        edges = cache.truncate(
            edges.join(peel.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(peel.withColumnRenamed("id", "dst"), "dst", "left_anti")
        )
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError("core_number exceeded max_rounds")
    out = None
    for df, kk in assigned:
        part = df.select("id", F.lit(kk).cast("long").alias("core"))
        out = part if out is None else out.unionByName(part)
    if out is None:
        return g.spark.createDataFrame([], "id long, core long")
    res = out.persist()
    res.count()
    cache.close(keep_result=False)
    return res


def k_core(g: SparkGraph, k: int) -> SparkGraph:
    """Maximal subgraph with every degree >= k (``core.py:154``): iterate
    'drop nodes with degree < k' to fixpoint."""
    cache = SuperstepCache(g.spark)
    edges = cache.truncate(g.edges.select("src", "dst", "weight"))
    vertices = cache.truncate(g.vertices.select("id"))
    while True:
        deg = _arc_ends(edges).groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
        keep = vertices.join(deg, "id", "left").filter(
            F.coalesce("deg", F.lit(0)) >= k
        ).select("id")
        keep = cache.truncate(keep)
        n_before = vertices.count()
        n_after = keep.count()
        vertices = keep
        edges = cache.truncate(
            edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        if n_after == n_before:
            break
    sub = SparkGraph(
        edges, vertices, directed=g.directed, coalesce_edges=False
    )
    cache.close(keep_result=True)
    return sub
