"""Connected components — alternating large-star / small-star min-label.

Semantics match ``networkx/algorithms/components/connected.py:17``
(``connected_components``: partition of an undirected graph into maximal
components, BFS-based O(n+m)) and ``weakly_connected.py:15``. The BFS is
inherently sequential, so the distributed algorithm is the **two-phase
large-star/small-star** method of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC 2014), which converges in O(log² n) rounds
(O(log n) in practice) to star graphs rooted at each component's minimum
node id — yielding the exact same partition as BFS.

- large-star(u): connect every strictly-larger neighbor of u to
  ``m = min(Γ(u) ∪ {u})``
- small-star(u): connect every neighbor ≤ u (and u itself) to the minimum
  of that set
- converged when the edge set stops changing; then every surviving edge is
  ``(v, component_min)``.

Everything is joins + groupBy-min: per round, one shuffle for the
neighborhood-min aggregation and one for dedup. Map-side partial min bounds
hub skew. Lineage is truncated each round (localCheckpoint / CheckpointStore).

Convergence detection at scale: comparing edge sets with ``except`` is a
full shuffle, so we compare (count, sum(xxhash64(src, dst))) fingerprints —
deterministic, one aggregation, and collision-safe for any practical input.
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache
from linkgraph.state import CheckpointStore, IterationMetrics


def _fingerprint(e: DataFrame):
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: exact and overflow-free under ANSI mode
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def _large_star(e: DataFrame) -> DataFrame:
    """Emit (v, m) for every neighbor v > u, m = min(Γ(u) ∪ {u}).

    No dedup here: duplicates are harmless to the following small-star's
    min aggregation and its single per-round ``distinct`` — one shuffle per
    round instead of two."""
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", "src").alias("m"))
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges (max, min); connect all smaller neighbors and u to the
    minimum of the closed smaller-neighborhood."""
    t = e.filter(F.col("src") != F.col("dst")).select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = t.groupBy("src").agg(F.min("dst").alias("m"))
    nbr_edges = t.join(mins, "src").select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    self_edges = mins.select("src", F.col("m").alias("dst"))
    return (
        nbr_edges.unionAll(self_edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    g: SparkGraph,
    *,
    max_rounds: int = 50,
    checkpoint_store: Optional[CheckpointStore] = None,
    resume: bool = False,
) -> DataFrame:
    """Return DataFrame ``(id BIGINT, component BIGINT)`` where ``component``
    is the minimum node id of the node's component — an exact encoding of
    the ``nx.connected_components`` partition (``connected.py:17``).

    Directed input is treated as its underlying undirected graph, i.e. this
    doubles as ``weakly_connected_components`` (``weakly_connected.py:15``).
    """
    vertices = g.vertices.select("id")
    e = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )

    start_round = 0
    if resume and checkpoint_store is not None and checkpoint_store.latest_iteration() >= 0:
        start_round = checkpoint_store.latest_iteration() + 1
        e = checkpoint_store.load(start_round - 1, g.spark)

    cache = SuperstepCache(g.spark)

    # Same loop tuning as PageRank: no AQE re-planning, hash joins instead
    # of per-round re-sorts of the star edge sets. Restored on exit.
    spark = g.spark
    saved_conf = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.join.preferSortMergeJoin": spark.conf.get(
            "spark.sql.join.preferSortMergeJoin"
        ),
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    try:
        # Lazy checkpoint + fingerprint: the fingerprint aggregation is the
        # action that materializes the checkpointed RDD, so lineage
        # truncation and convergence detection share ONE job per round
        # (AQE is off inside the loop, so the lazy variant runs the plan
        # exactly once).
        e = e.localCheckpoint(eager=False)
        fp = _fingerprint(e)
        # Size the loop's shuffle partitions by DATA VOLUME (~250k pair
        # rows per reduce task), capped at the session default: with AQE
        # off, a small graph would otherwise pay the session's full
        # partition count in per-task fixed cost EVERY round — pure
        # overhead locally, and the same rows-per-task rule is how a
        # 1000-executor run would be sized (it hits the session cap and
        # keeps the configured parallelism).
        default_parts = int(saved_conf["spark.sql.shuffle.partitions"])
        loop_parts = max(4, min(default_parts, (fp[0] or 1) // 250_000 + 1))
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        for k in range(start_round, max_rounds):
            t0 = time.monotonic()
            e2 = _small_star(_large_star(e))
            if checkpoint_store is not None:
                e2 = checkpoint_store.commit(
                    e2,
                    IterationMetrics(
                        k,
                        wall_ms=int((time.monotonic() - t0) * 1000),
                    ),
                )
            else:
                e2 = e2.localCheckpoint(eager=False)
            fp2 = _fingerprint(e2)
            cache.release(e)  # prev round's blocks are dead past this point
            if checkpoint_store is not None:
                checkpoint_store.update_metrics(
                    k, changed=0 if fp2 == fp else 1, edges_processed=fp2[0]
                )
            if fp2 == fp:
                e = e2
                break
            e, fp = e2, fp2
        else:
            if start_round < max_rounds:
                cache.close()
                raise RuntimeError(
                    f"connected_components did not converge in {max_rounds} rounds"
                )
    finally:
        for key, val in saved_conf.items():
            spark.conf.set(key, val)

    # Converged star edges map node -> component min; roots and isolated
    # nodes map to themselves.
    labels = vertices.join(
        e.select(F.col("src").alias("id"), F.col("dst").alias("component")),
        "id",
        "left",
    ).select("id", F.coalesce("component", "id").alias("component"))
    cache.close(keep_result=True)
    return labels


def weakly_connected_components(g: SparkGraph, **kwargs) -> DataFrame:
    """``networkx/algorithms/components/weakly_connected.py:15`` — components
    of the underlying undirected graph."""
    return connected_components(g, **kwargs)


def number_connected_components(g: SparkGraph, **kwargs) -> int:
    """``connected.py:94``."""
    return (
        connected_components(g, **kwargs)
        .agg(F.countDistinct("component"))
        .first()[0]
    )


def component_sizes(g: SparkGraph, **kwargs) -> DataFrame:
    """DataFrame (component, size) — the distributed stand-in for
    ``[len(c) for c in connected_components(G)]``."""
    return (
        connected_components(g, **kwargs)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
    )


def is_connected(g: SparkGraph) -> bool:
    """True iff the undirected graph has exactly one component
    (``components/connected.py``; raises on directed like the decorator,
    and on the null graph like the reference)."""
    if g.directed:
        from linkgraph.exceptions import NotImplementedForDirected

        raise NotImplementedForDirected(
            "is_connected: not implemented for directed type"
        )
    if g.number_of_nodes() == 0:
        raise ValueError(
            "Connectivity is undefined for the null graph."
        )
    return number_connected_components(g) == 1


def is_weakly_connected(g: SparkGraph) -> bool:
    """True iff the digraph's underlying undirected graph is connected
    (``components/weakly_connected.py``; raises on undirected input and
    the null graph like the reference)."""
    if not g.directed:
        raise ValueError(
            "is_weakly_connected: not implemented for undirected type"
        )
    if g.number_of_nodes() == 0:
        raise ValueError(
            "Connectivity is undefined for the null graph."
        )
    return (
        weakly_connected_components(g)
        .select("component")
        .distinct()
        .limit(2)
        .count()
        == 1
    )


def node_connected_component(g: SparkGraph, n: int) -> DataFrame:
    """(id): the nodes of n's connected component
    (``components/connected.py:380`` ``node_connected_component``) — one
    filter over the distributed component labeling."""
    cc = connected_components(g)
    lab = cc.filter(F.col("id") == int(n)).select(
        F.col("component").alias("c")
    )
    return cc.join(F.broadcast(lab), cc["component"] == F.col("c")).select("id")


def number_weakly_connected_components(g: SparkGraph) -> int:
    """``weakly_connected.py:109`` — distinct WCC labels."""
    return (
        weakly_connected_components(g)
        .select("component")
        .distinct()
        .count()
    )
