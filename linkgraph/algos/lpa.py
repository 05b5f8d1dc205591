"""Semi-synchronous label propagation communities.

Replicates ``networkx.community.label_propagation_communities``
(``networkx/algorithms/community/label_propagation.py:238``) exactly:

1. Proper-color the graph with ``greedy_color`` (default strategy
   ``largest_first``, ``networkx/algorithms/coloring/greedy_coloring.py:266``).
2. Initial label of each node = its enumeration index
   (``label_propagation.py:269``). We use the node id itself: when nodes are
   enumerated in ascending-id order the index is a strictly monotone
   transform of the id, and the algorithm only ever compares labels by
   equality and ``max`` — so the resulting *partition* is identical.
3. Until every node's label is in the argmax of its neighbors' label
   frequencies (``_labeling_complete``, ``:297-307``): for each color class
   in ascending color order, set every node's label to the most frequent
   neighbor label with the **Prec-Max** tie-break — keep the current label if
   it is in the argmax set, else take the maximum label of that set
   (``_update_label``, ``:326-338``).

Nodes within one color class are pairwise non-adjacent, so their updates are
order-independent — that is precisely what makes each color class one
distributed superstep of joins + groupBy aggregations (Cordasco & Gargano
2010). Directed input raises, matching ``@not_implemented_for("directed")``
(``label_propagation.py:236``).

Scale notes: the greedy coloring itself is sequential in the reference; it
runs driver-side here over the collected simple edge list (guarded by
``max_driver_edges``). For partition-exact parity this is unavoidable — any
other proper coloring changes the update schedule and may change the
partition. At true web scale one would swap in a distributed Jones-Plassmann
coloring (same proper-coloring contract, different schedule) and accept
set-statistical rather than exact parity; the superstep machinery below is
schedule-agnostic and unchanged.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache
from linkgraph.state import CheckpointStore, IterationMetrics
from linkgraph.exceptions import NotImplementedForDirected

__all__ = [
    "label_propagation_communities",
    "communities_as_sets",
    "NotImplementedForDirected",
]


def _greedy_color_largest_first(edges: list[tuple[int, int]], nodes: list[int]):
    """Exact replication of ``nx.coloring.greedy_color(G)`` with the default
    ``largest_first`` strategy (``greedy_coloring.py:266``, strategy at
    ``:42``): nodes sorted by degree descending (stable: ties keep
    enumeration order, here ascending id), each assigned the smallest color
    unused by already-colored neighbors. Returns {node: color}."""
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    order = sorted(nodes, key=lambda n: len(adj[n]), reverse=True)
    colors: dict[int, int] = {}
    for n in order:
        used = {colors[nbr] for nbr in adj[n] if nbr in colors}
        c = 0
        while c in used:
            c += 1
        colors[n] = c
    return colors


def _jones_plassmann_coloring(
    sym: DataFrame, vertices: DataFrame, cache: SuperstepCache, seed: int = 17
) -> DataFrame:
    """Distributed proper coloring (Jones & Plassmann 1993): random
    priorities from a hash; a node takes the smallest color unused by its
    already-colored higher-priority neighbors, rounds until all colored.

    Any proper coloring yields a valid semi-synchronous LPA schedule
    (color classes are independent sets); it just differs from the
    reference's sequential ``largest_first`` order, so the resulting
    partition is LPA-valid but not bit-identical to NetworkX's. This is the
    scale path — no driver-side edge collection.
    """
    pri = vertices.select(
        "id", F.xxhash64(F.col("id"), F.lit(seed)).alias("pri")
    ).persist()
    nbr_pri = (
        sym.join(pri.withColumnRenamed("id", "src").withColumnRenamed("pri", "src_pri"), "src")
        .join(pri.withColumnRenamed("id", "dst").withColumnRenamed("pri", "dst_pri"), "dst")
        .select("src", "dst", "src_pri", "dst_pri")
        .persist()
    )
    colored = cache.truncate(
        vertices.limit(0).select("id", F.lit(0).cast("int").alias("color"))
    )
    uncolored = cache.truncate(vertices.select("id"))
    while uncolored.limit(1).count() > 0:
        # higher-priority uncolored neighbors block a node this round
        blocked = (
            nbr_pri.join(uncolored.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(uncolored.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .filter(
                (F.col("dst_pri") > F.col("src_pri"))
                | ((F.col("dst_pri") == F.col("src_pri")) & (F.col("dst") > F.col("src")))
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        ready = uncolored.join(blocked, "id", "left_anti")
        # smallest color not used by already-colored neighbors
        used = (
            nbr_pri.select("src", "dst")
            .join(ready.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(colored.withColumnRenamed("id", "dst"), "dst")
            .select(F.col("src").alias("id"), "color")
            .groupBy("id")
            .agg(F.collect_set("color").alias("used"))
        )
        empty = F.expr("array()").cast("array<int>")
        used_arr = F.coalesce("used", empty)
        assigned = (
            ready.join(used, "id", "left")
            .select(
                "id",
                F.coalesce(
                    F.array_position(
                        F.transform(
                            F.sequence(F.lit(0), F.size(used_arr)),
                            lambda c: ~F.array_contains(used_arr, c.cast("int")),
                        ),
                        True,
                    ).cast("int")
                    - 1,
                    F.lit(0),
                ).alias("color"),
            )
        )
        colored = cache.truncate(colored.unionByName(assigned))
        uncolored = cache.truncate(uncolored.join(assigned, "id", "left_anti"))
    pri.unpersist()
    nbr_pri.unpersist()
    return colored


def label_propagation_communities(
    g: SparkGraph,
    *,
    max_sweeps: int = 100,
    max_driver_edges: int = 5_000_000,
    checkpoint_store: Optional[CheckpointStore] = None,
    coloring: str = "auto",
) -> DataFrame:
    """Return DataFrame ``(id BIGINT, label BIGINT)``; nodes sharing a label
    form one community. The partition matches the reference exactly when the
    reference enumerates nodes in ascending-id order.

    ``coloring="reference"`` replicates ``greedy_color`` on the driver for
    exact partition parity (guarded by ``max_driver_edges``, raises above
    it); ``coloring="distributed"`` uses Jones-Plassmann coloring entirely
    in Spark — the scale path: same LPA update rule and termination, a
    valid (but schedule-different) partition. ``coloring="auto"`` (default)
    uses the reference schedule up to ``max_driver_edges`` and falls back
    to the distributed one (with a warning) beyond it, so big graphs run
    instead of raising.
    """
    if g.directed:
        raise NotImplementedForDirected(
            "label_propagation_communities: not implemented for directed type"
        )
    spark = g.spark
    vertices = g.vertices.select("id").persist()

    simple = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    m = simple.count()

    sym_early = simple.unionAll(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()

    if coloring == "auto":
        if m > max_driver_edges:
            import warnings

            warnings.warn(
                f"label_propagation_communities: {m} edges > "
                f"max_driver_edges={max_driver_edges}; using distributed "
                "Jones-Plassmann coloring (schedule differs from the "
                "reference's greedy_color; the partition is LPA-valid but "
                "not bit-identical)",
                stacklevel=2,
            )
            coloring = "distributed"
        else:
            coloring = "reference"

    if coloring == "distributed":
        _cc = SuperstepCache(spark)
        color_df = _jones_plassmann_coloring(sym_early, vertices, _cc).persist()
        n_colors = (color_df.agg(F.max("color")).first()[0] or 0) + 1
    else:
        if m > max_driver_edges:
            raise ValueError(
                f"exact-parity LPA collects the edge list for greedy coloring; "
                f"{m} edges > max_driver_edges={max_driver_edges}; "
                "use coloring='distributed' for the scale path"
            )
        edge_list = [(r["src"], r["dst"]) for r in simple.collect()]
        node_list = sorted(r["id"] for r in vertices.collect())
        cmap = _greedy_color_largest_first(edge_list, node_list)
        n_colors = (max(cmap.values()) + 1) if cmap else 0
        color_df = (
            spark.createDataFrame(list(cmap.items()), ["id", "color"])
            if cmap
            else spark.createDataFrame([], "id long, color int")
        ).persist()

    sym = sym_early

    cache = SuperstepCache(spark, truncate_interval=1)
    labels = vertices.select("id", F.col("id").alias("label"))

    def neighbor_freq(lbls: DataFrame) -> DataFrame:
        """(id, nlab, cnt): frequency of each label among id's neighbors."""
        return (
            sym.join(
                lbls.select(
                    F.col("id").alias("dst"), F.col("label").alias("nlab")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "nlab")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    # Termination: the reference checks ``_labeling_complete``
    # (``label_propagation.py:297-307``: every node-with-neighbors' label is
    # in its neighborhood argmax) BEFORE each sweep — a full neighbor_freq
    # pass over all m edges. A sweep's Prec-Max update changes a node iff
    # its label is NOT in that argmax, and color classes partition the
    # nodes, so "a full sweep changed nothing" is exactly the same predicate
    # — checked here with one n-row label comparison instead of an extra
    # m-edge aggregation pass per sweep. (When the initial labeling is
    # already complete this runs one provably-no-op sweep; the result is
    # identical.)
    labels = cache.truncate(labels)
    sweeps = 0
    while True:
        if sweeps >= max_sweeps:
            raise RuntimeError(f"LPA did not stabilize in {max_sweeps} sweeps")
        prev = labels
        t0 = time.monotonic()
        for c in range(n_colors):
            cls = color_df.filter(F.col("color") == c).select("id")
            freq = neighbor_freq(labels).join(cls, "id", "left_semi")
            mx = freq.groupBy("id").agg(F.max("cnt").alias("mx"))
            cand = freq.join(mx, "id").filter(F.col("cnt") == F.col("mx"))
            upd = (
                cand.join(labels, "id")
                .groupBy("id")
                .agg(
                    F.max("nlab").alias("maxlab"),
                    F.max(
                        F.when(F.col("nlab") == F.col("label"), 1).otherwise(0)
                    ).alias("curin"),
                    F.first("label").alias("cur"),
                )
                .select(
                    "id",
                    F.when(F.col("curin") == 1, F.col("cur"))
                    .otherwise(F.col("maxlab"))
                    .alias("label"),
                )
            )
            # Truncate lineage per color class: each class references the
            # previous labels plan ~5×, so chaining a whole sweep lazily
            # grows the Catalyst tree exponentially in the color count.
            # Retire the pre-update snapshot (except the sweep-start one,
            # which the changed-count below still reads).
            old = labels
            labels = cache.truncate(
                labels.join(upd, "id", "left_anti").unionByName(upd),
                retire=None if old is prev else old,
            )
        sweeps += 1
        changed = (
            labels.join(
                prev.select("id", F.col("label").alias("plab")), "id"
            )
            .filter(F.col("label") != F.col("plab"))
            .count()
        )
        cache.release(prev)
        if checkpoint_store is not None:
            labels = checkpoint_store.commit(
                labels,
                IterationMetrics(
                    sweeps - 1,
                    changed=changed,
                    edges_processed=m * n_colors,
                    wall_ms=int((time.monotonic() - t0) * 1000),
                ),
            )
        if changed == 0:
            break
    cache.close(keep_result=True)
    return labels


def communities_as_sets(labels: DataFrame) -> list[frozenset]:
    """Parity helper: collect the partition as a list of frozensets (the
    shape ``nx.community.label_propagation_communities`` yields). Only for
    test-scale graphs — never at scale (SURVEY.md §3 EP3)."""
    rows = labels.groupBy("label").agg(F.collect_set("id").alias("members")).collect()
    return [frozenset(r["members"]) for r in rows]
