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


class NotImplementedForDirected(Exception):
    """Mirror of ``networkx.NetworkXNotImplemented`` for directed input
    (``label_propagation.py:236``)."""


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


def label_propagation_communities(
    g: SparkGraph,
    *,
    max_sweeps: int = 100,
    max_driver_edges: int = 5_000_000,
    checkpoint_store: Optional[CheckpointStore] = None,
) -> DataFrame:
    """Return DataFrame ``(id BIGINT, label BIGINT)``; nodes sharing a label
    form one community. The partition matches the reference exactly when the
    reference enumerates nodes in ascending-id order."""
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
    if m > max_driver_edges:
        raise ValueError(
            f"exact-parity LPA collects the edge list for greedy coloring; "
            f"{m} edges > max_driver_edges={max_driver_edges}"
        )
    edge_list = [(r["src"], r["dst"]) for r in simple.collect()]
    node_list = sorted(r["id"] for r in vertices.collect())
    coloring = _greedy_color_largest_first(edge_list, node_list)
    n_colors = (max(coloring.values()) + 1) if coloring else 0

    color_df = (
        spark.createDataFrame(list(coloring.items()), ["id", "color"])
        if coloring
        else spark.createDataFrame([], "id long, color int")
    ).persist()

    sym = simple.unionAll(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()

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

    def incomplete_count(lbls: DataFrame) -> int:
        """Nodes (with neighbors) whose label is not in the argmax set
        (``_labeling_complete``, ``label_propagation.py:297-307``)."""
        freq = neighbor_freq(lbls)
        mx = freq.groupBy("id").agg(F.max("cnt").alias("mx"))
        cand = freq.join(mx, "id").filter(F.col("cnt") == F.col("mx"))
        ok = cand.join(
            lbls, (cand["id"] == lbls["id"]) & (cand["nlab"] == lbls["label"]),
            "left_semi",
        ).select("id")
        with_nbrs = sym.select(F.col("src").alias("id")).distinct()
        return with_nbrs.join(ok, "id", "left_anti").count()

    sweeps = 0
    while incomplete_count(labels) > 0:
        if sweeps >= max_sweeps:
            raise RuntimeError(f"LPA did not stabilize in {max_sweeps} sweeps")
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
            labels = cache.truncate(
                labels.join(upd, "id", "left_anti").unionByName(upd)
            )
        sweeps += 1
        if checkpoint_store is not None:
            labels = checkpoint_store.commit(
                labels,
                IterationMetrics(
                    sweeps - 1,
                    edges_processed=m * n_colors,
                    wall_ms=int((time.monotonic() - t0) * 1000),
                ),
            )
    cache.close(keep_result=True)
    return labels


def communities_as_sets(labels: DataFrame) -> list[frozenset]:
    """Parity helper: collect the partition as a list of frozensets (the
    shape ``nx.community.label_propagation_communities`` yields). Only for
    test-scale graphs — never at scale (SURVEY.md §3 EP3)."""
    rows = labels.groupBy("label").agg(F.collect_set("id").alias("members")).collect()
    return [frozenset(r["members"]) for r in rows]
