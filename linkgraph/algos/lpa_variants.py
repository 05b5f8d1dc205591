"""Randomized label-propagation variants — ``asyn_lpa_communities``
(``networkx/algorithms/community/label_propagation.py:142``) and
``fast_label_propagation_communities`` (``label_propagation.py:19``).

Both reference algorithms are RANDOM by contract: a seeded shuffle decides
the node visit order and ties break by ``seed.choice`` — their own test
suite only checks the resulting partition, not a specific labeling, and
SURVEY §2.F marks them "parity only set-statistically". A sequential
visit order cannot be replayed across partitions, so the distributed twins
keep the defining traits and replace the schedule:

- update rule (both, = ``label_propagation.py:218-232``): a node KEEPS its
  label when it already has maximal neighborhood weight; otherwise it
  adopts an argmax label, ties broken by a seeded hash of
  (seed+round, id, label) — the distributed ``seed.choice(best_labels)``.
- asynchrony: a seeded coin activates ~3/4 of the eligible nodes per
  round (the rest wait), which breaks the two-coloring oscillation a
  fully synchronous sweep admits — the same role the reference's random
  visit order plays. Termination = a round changes nothing
  (``_labeling_complete``-equivalent under keep-if-in-best).
- ``fast_label_propagation_communities`` additionally keeps the
  reference's QUEUE discipline (``label_propagation.py:55-60``): only
  nodes whose neighborhood changed re-enter the eligible set, so late
  rounds touch the active boundary, not the whole graph.

Weighted graphs sum edge weights per neighbor label like the reference
(``label_propagation.py:216``, ``:57``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache


def _sym(g: SparkGraph) -> DataFrame:
    e = g.symmetric_edges() if not g.directed else g.edges
    return e.filter(F.col("src") != F.col("dst")).select("src", "dst", "weight")


def _relabel(sym: DataFrame, labels: DataFrame, active: DataFrame, salt) -> DataFrame:
    """Rows ``(id, label)`` for active nodes whose label CHANGES this round:
    keep-if-in-best, else hash-tie-broken argmax — one join + one agg."""
    freq = (
        sym.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(F.col("src").alias("id"), F.col("label").alias("nlab"))
        .agg(F.sum("weight").alias("w"))
    )
    cur = labels.select("id", F.col("label").alias("cur"))
    ranked = freq.join(cur, "id").withColumn(
        "tie", F.xxhash64(salt, F.col("id"), F.col("nlab"))
    )
    agg = ranked.groupBy("id").agg(
        F.max(F.struct("w", "tie", "nlab")).alias("b"),
        F.max(F.when(F.col("nlab") == F.col("cur"), F.col("w"))).alias("cw"),
        F.first("cur").alias("cur"),
    )
    return agg.filter(
        F.col("cw").isNull() | (F.col("cw") < F.col("b.w"))
    ).select("id", F.col("b.nlab").alias("label"))


def _coin_subset(nodes: DataFrame, salt) -> DataFrame:
    """~3/4 of the nodes by seeded hash; all of them if the coin empties
    the set (progress guarantee on tiny frontiers)."""
    sub = nodes.filter(F.pmod(F.xxhash64(salt, F.col("id")), F.lit(4)) != 0)
    if sub.limit(1).count() == 0:
        return nodes
    return sub


def asyn_lpa_communities(
    g: SparkGraph, *, seed: int = 0, max_sweeps: int = 500
) -> DataFrame:
    """DataFrame ``(id BIGINT, label BIGINT)`` — a fixpoint of the LPA
    keep-if-in-best update with seeded random tie-breaks
    (``label_propagation.py:142`` semantics, distributed schedule)."""
    spark = g.spark
    cache = SuperstepCache(spark)
    sym = _sym(g).persist()
    all_nodes = g.vertices.select("id")
    labels = cache.truncate(all_nodes.select("id", F.col("id").alias("label")))
    stable_probe_due = True
    for sweep in range(max_sweeps):
        salt = F.lit(int(seed) * 1_000_003 + sweep)
        active = _coin_subset(all_nodes, salt)
        changed = _relabel(sym, labels, active, salt).persist()
        n_changed = changed.count()
        if n_changed == 0:
            # the coin subset saw nothing to do; certify with a FULL pass
            if stable_probe_due:
                full_changed = _relabel(sym, labels, all_nodes, salt)
                if full_changed.limit(1).count() == 0:
                    changed.unpersist()
                    break
                stable_probe_due = False
                changed.unpersist()
                continue
            changed.unpersist()
            continue
        stable_probe_due = True
        new_labels = cache.truncate(
            labels.join(changed.select("id"), "id", "left_anti").unionByName(changed)
        )
        changed.unpersist()
        cache.release(labels)
        labels = new_labels
    else:
        sym.unpersist()
        cache.close()
        raise RuntimeError(f"asyn_lpa did not stabilize in {max_sweeps} sweeps")
    sym.unpersist()
    cache.close(keep_result=True)
    return labels


def fast_label_propagation_communities(
    g: SparkGraph, *, seed: int = 0, max_rounds: int = 2000
) -> DataFrame:
    """Queue-driven variant (``label_propagation.py:19``): the frontier is
    the reference's deque — after a round, exactly the neighbors of
    relabeled nodes re-enter it (``label_propagation.py:55-60``)."""
    spark = g.spark
    cache = SuperstepCache(spark)
    sym = _sym(g).persist()
    labels = cache.truncate(g.vertices.select("id", F.col("id").alias("label")))
    frontier = labels.select("id")
    for rnd in range(max_rounds):
        if frontier.limit(1).count() == 0:
            break
        salt = F.lit(int(seed) * 1_000_003 + rnd)
        active = _coin_subset(frontier, salt)
        changed = _relabel(sym, labels, active, salt).persist()
        prev_frontier = frontier
        if changed.limit(1).count() == 0:
            # processed-and-unchanged nodes leave the queue
            frontier = cache.truncate(
                frontier.join(active, "id", "left_anti"), retire=prev_frontier
            )
            changed.unpersist()
            continue
        new_labels = cache.truncate(
            labels.join(changed.select("id"), "id", "left_anti").unionByName(changed)
        )
        # queue update: drop processed nodes, re-queue neighbors of changes
        requeued = (
            sym.join(
                changed.select(F.col("id").alias("dst")), "dst", "left_semi"
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        # materialize the new queue BEFORE the old labels snapshot (which
        # `changed` reads) can be released
        frontier = cache.truncate(
            frontier.join(active, "id", "left_anti")
            .unionByName(requeued)
            .distinct(),
            retire=prev_frontier,
        )
        changed.unpersist()
        cache.release(labels)
        labels = new_labels
    else:
        sym.unpersist()
        cache.close()
        raise RuntimeError(
            f"fast_label_propagation did not drain in {max_rounds} rounds"
        )
    sym.unpersist()
    cache.close(keep_result=True)
    return labels
