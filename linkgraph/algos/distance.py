"""Distance-based measures: all-pairs BFS, closeness/harmonic centrality,
eccentricity / diameter / radius / center / periphery, and
``average_shortest_path_length``.

Reference semantics:

- ``closeness_centrality`` — ``networkx/algorithms/centrality/closeness.py:15``:
  C(u) = (n_r − 1) / Σ_v d(v, u) over the n_r nodes that can REACH u
  (incoming distance for directed graphs); with ``wf_improved`` (the
  default) scaled by (n_r − 1)/(N − 1). Nodes nobody reaches get 0.0.
- ``harmonic_centrality`` — ``networkx/algorithms/centrality/harmonic.py``:
  H(u) = Σ_{v≠u} 1/d(v, u), incoming distance, unreachable terms are 0.
- ``eccentricity/diameter/radius/center/periphery`` —
  ``networkx/algorithms/distance_measures.py:150,230,292,320,348``:
  ecc(u) = max_v d(u, v) (OUTGOING distance); raises when the graph is not
  (strongly) connected, matching the reference's "Found infinite path
  length" error.
- ``average_shortest_path_length`` —
  ``networkx/algorithms/shortest_paths/generic.py:356``: mean of d(u, v)
  over all ordered pairs; raises on a disconnected (undirected) or
  non-strongly-connected (directed) graph.

Spark plan: ONE primitive — a batched multi-source BFS whose state is the
``(source, id, distance)`` table — powers everything; each BFS level is a
single frontier⋈arcs shuffle join + composite-key anti-join, all sources
advancing simultaneously (no per-source driver loop). Every measure above
is then one aggregation over that table.

Scale note: with ``sources=None`` the result is O(n·reach) rows — exact
all-pairs is inherently quadratic (the reference pays the same O(n·m)
time). At web scale pass ``sources=`` a landmark sample (the standard
approximation: closeness/eccentricity estimated from k pivots); the
superstep machinery is identical and the aggregations below accept the
restricted table unchanged.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache

__all__ = [
    "all_pairs_shortest_path_lengths",
    "closeness_centrality",
    "harmonic_centrality",
    "eccentricity",
    "diameter",
    "radius",
    "center",
    "periphery",
    "average_shortest_path_length",
]


def _arcs(g: SparkGraph, reverse: bool) -> DataFrame:
    if g.directed:
        a = g.edges.select("src", "dst")
        if reverse:
            a = a.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        return a
    return g.symmetric_edges().select("src", "dst")


def all_pairs_shortest_path_lengths(
    g: SparkGraph,
    sources: Optional[DataFrame] = None,
    *,
    reverse: bool = False,
    max_depth: Optional[int] = None,
) -> DataFrame:
    """Batched multi-source BFS: ``(source BIGINT, id BIGINT, distance
    BIGINT)`` — unweighted distance from ``source`` to ``id`` following
    out-arcs (``reverse=True`` follows in-arcs, i.e. distance TO source).
    Row ``(s, s, 0)`` is present for every source, like the reference's
    ``dict(nx.all_pairs_shortest_path_length(G))`` including the source
    itself (``unweighted.py:22``). Unreachable pairs are absent.

    ``sources=None`` uses every vertex (exact all-pairs); pass a one-column
    DataFrame of landmark ids for the sampled approximation at scale.
    """
    spark = g.spark
    if sources is None:
        src_df = g.vertices.select(F.col("id").alias("source"))
    else:
        src_df = sources.select(
            F.col(sources.columns[0]).cast("long").alias("source")
        ).join(g.vertices.select(F.col("id").alias("source")), "source", "left_semi")

    adj = _arcs(g, reverse).persist()
    cache = SuperstepCache(spark)
    visited = cache.truncate(
        src_df.select(
            "source",
            F.col("source").alias("id"),
            F.lit(0).cast("long").alias("distance"),
        )
    )
    frontier = visited
    depth = 0
    while True:
        if max_depth is not None and depth >= max_depth:
            break
        depth += 1
        nxt = (
            adj.join(frontier.withColumnRenamed("id", "src"), "src")
            .select("source", F.col("dst").alias("id"))
            .distinct()
            .join(visited, ["source", "id"], "left_anti")
            .select("source", "id", F.lit(depth).cast("long").alias("distance"))
        )
        nxt = cache.truncate(nxt)
        if nxt.limit(1).count() == 0:
            break
        visited = cache.truncate(visited.unionByName(nxt))
        frontier = nxt
    adj.unpersist()
    cache.close(keep_result=True)
    return visited


def closeness_centrality(
    g: SparkGraph,
    *,
    wf_improved: bool = True,
    sources: Optional[DataFrame] = None,
) -> DataFrame:
    """``(id, closeness DOUBLE)`` for every vertex — exact
    ``nx.closeness_centrality`` semantics (``closeness.py:15``): incoming
    distances, (n_r−1)/Σd, Wasserman-Faust (n_r−1)/(N−1) factor when
    ``wf_improved``; nodes that nobody reaches get 0.0.

    ``sources=`` restricts the BFS to landmark targets (then the result is
    the landmark estimate, only exact when sources covers all vertices).
    """
    n_total = g.number_of_nodes()
    # BFS from u over REVERSED arcs reaches exactly the v that reach u,
    # at distance d(v, u) — so rows (source=u, id=v) give incoming distances.
    sp = all_pairs_shortest_path_lengths(g, sources, reverse=True)
    agg = sp.groupBy(F.col("source").alias("id")).agg(
        F.sum("distance").alias("totsp"),
        F.count("*").alias("n_reach"),
    )
    if n_total <= 1:
        return g.vertices.select("id", F.lit(0.0).alias("closeness"))
    base = (F.col("n_reach") - 1) / F.col("totsp")
    if wf_improved:
        base = base * (F.col("n_reach") - 1) / F.lit(float(n_total - 1))
    scored = agg.select(
        "id",
        F.when(F.col("totsp") > 0, base).otherwise(F.lit(0.0)).alias("closeness"),
    )
    out = g.vertices.select("id").join(scored, "id", "left")
    return out.select("id", F.coalesce("closeness", F.lit(0.0)).alias("closeness"))


def harmonic_centrality(
    g: SparkGraph, *, sources: Optional[DataFrame] = None
) -> DataFrame:
    """``(id, harmonic DOUBLE)`` — ``nx.harmonic_centrality`` (``harmonic.py``):
    Σ_{v≠u} 1/d(v, u) with incoming distances; unreachable pairs add 0."""
    sp = all_pairs_shortest_path_lengths(g, sources, reverse=True)
    agg = (
        sp.filter(F.col("distance") > 0)
        .groupBy(F.col("source").alias("id"))
        .agg(F.sum(F.lit(1.0) / F.col("distance")).alias("harmonic"))
    )
    return (
        g.vertices.select("id")
        .join(agg, "id", "left")
        .select("id", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"))
    )


def _ecc_table(g: SparkGraph) -> DataFrame:
    """Per-node eccentricity; raises like the reference when some pair is
    unreachable (``distance_measures.py:150``: "Found infinite path
    length")."""
    n = g.number_of_nodes()
    sp = all_pairs_shortest_path_lengths(g, reverse=False).persist()
    try:
        reached = sp.count()
        if reached != n * n:
            kind = "strongly connected" if g.directed else "connected"
            raise ValueError(
                "Found infinite path length because the "
                f"{'di' if g.directed else ''}graph is not {kind}"
            )
        ecc = sp.groupBy(F.col("source").alias("id")).agg(
            F.max("distance").alias("eccentricity")
        )
        # materialize before releasing the BFS table
        rows = ecc.localCheckpoint(eager=True)
    finally:
        sp.unpersist()
    return rows


def eccentricity(g: SparkGraph) -> DataFrame:
    """``(id, eccentricity BIGINT)`` — max distance from each node
    (``distance_measures.py:150``)."""
    return _ecc_table(g)


def diameter(g: SparkGraph) -> int:
    """Max eccentricity (``distance_measures.py:230``)."""
    return _ecc_table(g).agg(F.max("eccentricity")).first()[0]


def radius(g: SparkGraph) -> int:
    """Min eccentricity (``distance_measures.py:292``)."""
    return _ecc_table(g).agg(F.min("eccentricity")).first()[0]


def center(g: SparkGraph) -> DataFrame:
    """Nodes with ecc == radius (``distance_measures.py:320``)."""
    ecc = _ecc_table(g)
    r = ecc.agg(F.min("eccentricity").alias("r"))
    return ecc.join(F.broadcast(r), ecc.eccentricity == r.r, "left_semi").select("id")


def periphery(g: SparkGraph) -> DataFrame:
    """Nodes with ecc == diameter (``distance_measures.py:348``)."""
    ecc = _ecc_table(g)
    d = ecc.agg(F.max("eccentricity").alias("d"))
    return ecc.join(F.broadcast(d), ecc.eccentricity == d.d, "left_semi").select("id")


def average_shortest_path_length(g: SparkGraph) -> float:
    """Mean d(u, v) over ordered pairs (``generic.py:356``); raises on a
    disconnected / non-strongly-connected graph like the reference."""
    n = g.number_of_nodes()
    if n <= 1:
        raise ValueError(
            "the graph is empty" if n == 0 else "graph has fewer than two nodes"
        )
    sp = all_pairs_shortest_path_lengths(g, reverse=False).persist()
    try:
        row = sp.agg(
            F.count("*").alias("pairs"), F.sum("distance").alias("total")
        ).first()
        if row["pairs"] != n * n:
            kind = "strongly connected" if g.directed else "connected"
            raise ValueError(f"Graph is not {kind}.")
        return float(row["total"]) / (n * (n - 1))
    finally:
        sp.unpersist()
