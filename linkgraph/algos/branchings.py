"""Optimum spanning arborescences — Edmonds / Chu-Liu
(``networkx/algorithms/tree/branchings.py`` ``minimum_spanning_arborescence``
/ ``maximum_spanning_arborescence``).

The reference's ``Edmonds`` class mutates one graph sequentially. The
distributed formulation is the classic parallel contraction loop (the same
skeleton as the Borůvka MST this repo already ships, plus Edmonds' reduced
costs). Per round, entirely as DataFrame ops:

1. **min in-arc**: every non-root node picks its cheapest incoming arc —
   one ``groupBy(head).min(struct(w, orig))`` with a deterministic
   ``(weight, orig_src, orig_dst)`` tie-break. A non-root node with no
   in-arc certifies "no spanning arborescence" (``branchings.py`` raises
   ``NetworkXException`` for the same condition).
2. **cycle detection**: the picks form a functional graph (out-degree ≤ 1
   pointers, root absorbing). Any walk of ≥ n steps ends on a cycle, so
   the image of the 2^K-step ancestor map (K = ⌈log₂ n⌉ + 1, computed by
   K pointer-doubling self-joins) is exactly {cycle nodes} ∪ {root} — no
   sequential tail peel.
3. **cycle labeling**: min-label connected components over the pick arcs
   restricted to cycle nodes (each component is exactly one cycle).
4. **contract**: map cycle nodes to their label, re-weight arcs entering a
   cycle by ``w − w(pick(head))`` (the reduced cost), drop intra-supernode
   arcs, keep the cheapest arc per (tail, head) supernode pair. Every arc
   row permanently carries its ORIGINAL (src, dst, weight) identity —
   unique per level by construction — plus ``enter`` = its head node id
   one level down, which is all the expansion needs.

No cycles → the picks ARE the arborescence on the contracted nodes.
Unwind newest-first: the one selected arc entering each contracted cycle
displaces the cycle's own pick at the node it enters (one anti-join on
``enter``); every other cycle pick joins the solution; selected arcs are
re-represented one level down by semi-joining their original ids. Rounds =
contraction depth ≤ n, in practice O(log n) (every round removes ≥1 node
per cycle and cycles cover ≥2 nodes each).

``root=None`` minimizes over all roots via the virtual-root reduction:
arcs (VR → v, W) with W above any achievable total; a spanning
arborescence exists iff the VR-rooted optimum uses exactly one virtual arc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache
from linkgraph.exceptions import NetworkXError, NotImplementedForDirected

_VROOT = -(2**61)


def _rooted(edges: DataFrame, n0: int, root: int, spark) -> DataFrame:
    """Contraction + expansion. ``edges``: (src, dst, w, ow) no self-loops,
    w = working weight (negated for maximization), ow = original weight.
    Returns the selected original arcs (ou, ov, ow)."""
    from linkgraph.algos.components import connected_components

    cache = SuperstepCache(spark)
    arcs = cache.truncate(
        edges.groupBy("src", "dst")
        .agg(F.min(F.struct("w", "ow")).alias("m"))
        .select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.col("m.w").alias("w"),
            F.col("src").alias("ou"),
            F.col("dst").alias("ov"),
            F.col("m.ow").alias("ow"),
            F.col("dst").alias("enter"),
        )
    )
    n_nodes = n0
    levels: list[tuple[DataFrame, DataFrame, DataFrame]] = []

    while True:
        picks = cache.truncate(
            arcs.filter(F.col("v") != root)
            .groupBy("v")
            .agg(F.min(F.struct("w", "ou", "ov", "u", "ow", "enter")).alias("m"))
            .select(
                "v",
                F.col("m.u").alias("u"),
                F.col("m.w").alias("w"),
                F.col("m.ou").alias("ou"),
                F.col("m.ov").alias("ov"),
                F.col("m.ow").alias("ow"),
                F.col("m.enter").alias("enter"),
            )
        )
        if picks.count() < n_nodes - 1:
            cache.close()
            raise NetworkXError("No spanning arborescence in G.")

        # cycle nodes = image of the 2^K-step ancestor map, root excluded
        anc = cache.truncate(
            picks.select("v", F.col("u").alias("a")).unionByName(
                spark.createDataFrame([(int(root), int(root))], "v long, a long")
            )
        )
        for _ in range(max(1, int(n_nodes).bit_length() + 1)):
            anc = cache.truncate(
                anc.join(
                    anc.select(F.col("v").alias("a"), F.col("a").alias("a2")),
                    "a",
                ).select("v", F.col("a2").alias("a")),
                retire=anc,
            )
        cyc_nodes = cache.truncate(
            anc.filter(F.col("a") != root).select(F.col("a").alias("v")).distinct()
        )
        cache.release([anc])
        if cyc_nodes.limit(1).count() == 0:
            selected = picks
            break

        cyc_arcs = (
            picks.join(cyc_nodes, "v", "left_semi")
            .join(cyc_nodes.select(F.col("v").alias("u")), "u", "left_semi")
            .select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        labels = cache.truncate(
            connected_components(
                SparkGraph(cyc_arcs, directed=False, coalesce_edges=False)
            ).select(F.col("id").alias("node"), F.col("component").alias("super"))
        )
        levels.append((arcs, picks, labels))

        mapped = (
            arcs.join(
                labels.select(F.col("node").alias("u"), F.col("super").alias("mu")),
                "u",
                "left",
            )
            .join(
                labels.select(F.col("node").alias("v"), F.col("super").alias("mv")),
                "v",
                "left",
            )
            .join(picks.select("v", F.col("w").alias("pw")), "v", "left")
            .select(
                F.coalesce("mu", "u").alias("nu"),
                F.coalesce("mv", "v").alias("nv"),
                F.when(F.col("mv").isNotNull(), F.col("w") - F.col("pw"))
                .otherwise(F.col("w"))
                .alias("w"),
                "ou",
                "ov",
                "ow",
                F.col("v").alias("enter"),
            )
            .filter(F.col("nu") != F.col("nv"))
        )
        arcs = cache.truncate(
            mapped.groupBy(F.col("nu").alias("u"), F.col("nv").alias("v"))
            .agg(F.min(F.struct("w", "ou", "ov", "ow", "enter")).alias("m"))
            .select(
                "u",
                "v",
                F.col("m.w").alias("w"),
                F.col("m.ou").alias("ou"),
                F.col("m.ov").alias("ov"),
                F.col("m.ow").alias("ow"),
                F.col("m.enter").alias("enter"),
            )
        )
        n_contracted = labels.count() - labels.select("super").distinct().count()
        if n_contracted <= 0:
            cache.close()
            raise RuntimeError("arborescence contraction failed to shrink")
        n_nodes -= n_contracted

    # ---- expansion ----------------------------------------------------- #
    sel = selected
    for arcs_l, picks_l, labels_l in reversed(levels):
        cyc_picks = picks_l.join(
            labels_l.select(F.col("node").alias("v")), "v", "left_semi"
        )
        kept_cyc = cyc_picks.join(
            sel.select(F.col("enter").alias("v")), "v", "left_anti"
        )
        sel_below = arcs_l.join(
            sel.select("ou", "ov"), ["ou", "ov"], "left_semi"
        )
        sel = cache.truncate(
            sel_below.select("v", "u", "w", "ou", "ov", "ow", "enter").unionByName(
                kept_cyc.select("v", "u", "w", "ou", "ov", "ow", "enter")
            )
        )
        cache.release([arcs_l, picks_l, labels_l])
    out = sel.select(
        F.col("ou").alias("src"), F.col("ov").alias("dst"), F.col("ow").alias("weight")
    ).localCheckpoint(eager=True)
    cache.close(keep_result=True)
    return out


def _prep(g: SparkGraph, maximize: bool) -> DataFrame:
    sign = F.lit(-1.0) if maximize else F.lit(1.0)
    return (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            (sign * F.col("weight")).cast("double").alias("w"),
            F.col("weight").cast("double").alias("ow"),
        )
    )


def _spanning_arborescence(
    g: SparkGraph, root, maximize: bool
) -> DataFrame:
    if not g.directed:
        raise NotImplementedForDirected(
            "spanning arborescence: not implemented for undirected type"
        )
    spark = g.spark
    edges = _prep(g, maximize)
    n = g.number_of_nodes()
    if n == 0:
        raise NetworkXError("No spanning arborescence in G.")
    if root is not None:
        return _rooted(edges, n, int(root), spark)

    # virtual-root reduction: W exceeds |sum of working weights|, so the
    # optimum never takes a second virtual arc when a real one exists
    big = edges.agg(F.coalesce(F.sum(F.abs("w")), F.lit(0.0))).first()[0] + 1.0
    varcs = g.vertices.select(
        F.lit(_VROOT).cast("long").alias("src"),
        F.col("id").cast("long").alias("dst"),
        F.lit(float(big)).alias("w"),
        F.lit(float(big)).alias("ow"),
    )
    sel = _rooted(edges.unionByName(varcs), n + 1, _VROOT, spark)
    sel = sel.persist()
    if sel.filter(F.col("src") == _VROOT).count() != 1:
        sel.unpersist()
        raise NetworkXError("No spanning arborescence in G.")
    out = sel.filter(F.col("src") != _VROOT).localCheckpoint(eager=True)
    sel.unpersist()
    return out


def minimum_spanning_arborescence(g: SparkGraph, *, root=None) -> DataFrame:
    """Arcs (src, dst, weight) of a minimum-total-weight spanning
    arborescence (``branchings.py`` ``minimum_spanning_arborescence``);
    ``root`` pins the root, ``None`` optimizes over roots like the
    reference. Raises :class:`NetworkXError` when none exists."""
    return _spanning_arborescence(g, root, maximize=False)


def maximum_spanning_arborescence(g: SparkGraph, *, root=None) -> DataFrame:
    """``branchings.py`` ``maximum_spanning_arborescence`` — weight-negated
    twin of the minimum variant."""
    return _spanning_arborescence(g, root, maximize=True)


def _branching(g: SparkGraph, maximize: bool) -> DataFrame:
    """Optimum branching (in-degree <= 1, acyclic, no spanning
    requirement): the virtual-root reduction with ZERO-weight virtual
    arcs — a real arc joins the solution iff it beats "no arc at all",
    which is exactly the reference's Edmonds style='branching'
    (``branchings.py:837``)."""
    if not g.directed:
        raise NotImplementedForDirected(
            "branching: not implemented for undirected type"
        )
    spark = g.spark
    edges = _prep(g, maximize)
    n = g.number_of_nodes()
    if n == 0:
        return spark.createDataFrame([], "src long, dst long, weight double")
    varcs = g.vertices.select(
        F.lit(_VROOT).cast("long").alias("src"),
        F.col("id").cast("long").alias("dst"),
        F.lit(0.0).alias("w"),
        F.lit(0.0).alias("ow"),
    )
    sel = _rooted(edges.unionByName(varcs), n + 1, _VROOT, spark)
    return sel.filter(F.col("src") != _VROOT)


def maximum_branching(g: SparkGraph) -> DataFrame:
    """``branchings.py`` ``maximum_branching`` — arcs (src, dst, weight)
    of a maximum-total-weight branching (only arcs with positive weight
    can help, so the result never spans unless profitable)."""
    return _branching(g, maximize=True)


def minimum_branching(g: SparkGraph) -> DataFrame:
    """``branchings.py`` ``minimum_branching`` — minimum-weight twin
    (only negative-weight arcs lower the total)."""
    return _branching(g, maximize=False)
