"""Strong regularity / distance-regularity probes.

Reference: ``networkx/algorithms/distance_regular.py``
(``is_distance_regular:14``, ``intersection_array:72``,
``global_parameters:131``, ``is_strongly_regular:166``).

All distributed: strong regularity is three aggregations (degree
constancy, common-neighbor counts per adjacent / non-adjacent pair);
distance-regularity derives the intersection array from the batched
all-pairs BFS table with two joins (neighbor distance vs pair distance)
and checks constancy per distance class — never a per-node python loop.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph

__all__ = [
    "is_strongly_regular",
    "intersection_array",
    "is_distance_regular",
    "global_parameters",
    "hyper_wiener_index",
]


def is_strongly_regular(g: SparkGraph) -> bool:
    """``distance_regular.py:166`` — k-regular, every adjacent pair has
    the same number λ of common neighbors, every distinct non-adjacent
    pair the same number μ."""
    if g.directed:
        raise NetworkXError("is_strongly_regular: undirected only")
    from linkgraph.algos.degrees import degrees

    degs = degrees(g).agg(
        F.countDistinct("degree").alias("k"), F.min("degree").alias("d")
    ).first()
    if degs["k"] != 1:
        return False
    sym = g.symmetric_edges().select("src", "dst").filter(
        F.col("src") != F.col("dst")
    )
    # common-neighbor counts per unordered pair via the wedge join
    wedges = (
        sym.select(F.col("src").alias("a"), F.col("dst").alias("m"))
        .join(sym.select(F.col("src").alias("m"), F.col("dst").alias("b")), "m")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    adj = sym.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.lit(1).alias("e")
    )
    tagged = wedges.join(adj, ["a", "b"], "left").select(
        "cn", F.coalesce("e", F.lit(0)).alias("e")
    ).persist()
    # pairs absent from `wedges` have cn = 0 implicitly; a class (adjacent
    # or non-adjacent) is constant iff its wedge rows carry ONE distinct
    # value AND either cover the whole class or are empty (all zeros)
    n = g.number_of_nodes()
    n_adj = adj.count()
    non_adj = n * (n - 1) // 2 - n_adj

    def constant(rows_e, class_size):
        stats = tagged.filter(F.col("e") == rows_e).agg(
            F.count(F.lit(1)).alias("n"), F.countDistinct("cn").alias("u")
        ).first()
        covered, distinct = stats["n"], stats["u"]
        if covered == 0:
            return True  # the whole class sits at 0
        return distinct == 1 and covered == class_size

    ok = constant(1, n_adj) and constant(0, non_adj)
    tagged.unpersist()
    return ok


def intersection_array(g: SparkGraph) -> "tuple[list, list]":
    """``distance_regular.py:72`` — (b, c) arrays of a distance-regular
    graph; raises when the graph is not distance-regular. b_i = neighbors
    one step FURTHER from the source, c_i = one step CLOSER — constant per
    distance class by definition, checked over every (source, node) pair
    from the batched all-pairs BFS."""
    if g.directed:
        raise NetworkXError("intersection_array: undirected only")
    from linkgraph.algos.degrees import degrees
    from linkgraph.algos.distance import all_pairs_shortest_path_lengths

    dd = degrees(g).agg(F.countDistinct("degree").alias("u")).first()
    if dd["u"] != 1:
        raise NetworkXError("graph is not distance regular (not regular)")
    dist = all_pairs_shortest_path_lengths(g).persist()
    n = g.number_of_nodes()
    reach = dist.count()
    if reach != n * n:
        dist.unpersist()
        raise NetworkXError("graph is not distance regular (not connected)")
    diameter = dist.agg(F.max("distance")).first()[0]
    sym = g.symmetric_edges().select("src", "dst")
    # for each (source, v) at distance i, count neighbors w of v by
    # dist(source, w) - i ∈ {-1, 0, +1}
    nbr = (
        dist.select("source", F.col("id").alias("v"), F.col("distance").alias("dv"))
        .join(sym.select(F.col("src").alias("v"), F.col("dst").alias("w")), "v")
        .join(
            dist.select(
                "source", F.col("id").alias("w"), F.col("distance").alias("dw")
            ),
            ["source", "w"],
        )
        .groupBy("source", "v", "dv")
        .agg(
            F.sum(F.when(F.col("dw") == F.col("dv") + 1, 1).otherwise(0)).alias("b"),
            F.sum(F.when(F.col("dw") == F.col("dv") - 1, 1).otherwise(0)).alias("c"),
        )
    )
    per_class = nbr.groupBy("dv").agg(
        F.countDistinct("b").alias("nb"),
        F.countDistinct("c").alias("nc"),
        F.min("b").alias("bv"),
        F.min("c").alias("cv"),
    )
    rows = {r["dv"]: r for r in per_class.collect()}
    dist.unpersist()
    for i in range(diameter + 1):
        r = rows.get(i)
        if r is None or r["nb"] != 1 or r["nc"] != 1:
            raise NetworkXError("graph is not distance regular")
    b = [int(rows[i]["bv"]) for i in range(diameter)]
    c = [int(rows[i]["cv"]) for i in range(1, diameter + 1)]
    return b, c


def is_distance_regular(g: SparkGraph) -> bool:
    """``distance_regular.py:14``."""
    try:
        intersection_array(g)
        return True
    except NetworkXError:
        return False


def global_parameters(b: "list[int]", c: "list[int]"):
    """``distance_regular.py:131`` — [(c_i, a_i, b_i)] with
    a_i = b_0 - b_i - c_i (pure arithmetic, same as the reference)."""
    return [
        (cc, b[0] - bb - cc, bb)
        for bb, cc in zip(b + [0], [0] + c)
    ]


def hyper_wiener_index(g: SparkGraph, weight=None) -> float:
    """``distance_measures.py`` ``hyper_wiener_index`` —
    ½ Σ_{pairs} (d + d²) over distinct unordered pairs, from the batched
    all-pairs table in one aggregation (``weight=`` → weighted
    lengths)."""
    from linkgraph.algos.distance import all_pairs_shortest_path_lengths

    d = all_pairs_shortest_path_lengths(g, distance=weight).filter(
        F.col("source") < F.col("id")
    )
    row = d.agg(
        F.sum(F.col("distance") + F.col("distance") * F.col("distance"))
    ).first()[0]
    return 0.5 * float(row or 0.0)
