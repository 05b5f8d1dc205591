"""Bipartite projections — the web/co-occurrence graph construction.

Reference: ``networkx/algorithms/bipartite/projection.py`` —
``projected_graph`` (``:12``), ``weighted_projected_graph`` (``:90``,
weight = number of shared neighbors, or the ratio of that count to the
opposite-side size), ``overlap_weighted_projected_graph`` (``:244``,
Jaccard of neighborhoods). This family IS the engine's copurchase pattern
(items sharing an order) generalized.

Spark shape: one self-join of the arc table on the opposite-side node plus
a count aggregation — no iteration. The join key is the opposite-side
vertex, so power-law "hub" opposite nodes (an order containing thousands of
items) blow up quadratically; ``max_opposite_degree`` drops those hubs
before the join, the standard projection guard at crawl scale (a 100 TB
run would cap, then handle the capped hubs with a dedicated path if their
pairs matter).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph

__all__ = [
    "projected_graph",
    "weighted_projected_graph",
    "overlap_weighted_projected_graph",
    "birank",
]


def _side_arcs(g: SparkGraph, nodes: DataFrame, max_opposite_degree: Optional[int]):
    """(node, other) arcs with ``node`` on the projected side, hub-capped.
    Direction is meaningless for side membership, so arcs are symmetrized
    regardless of the graph's directed flag (the reference's bipartite
    module treats DiGraph input the same way)."""
    e = g.edges
    arcs = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    keep = nodes.select(F.col(nodes.columns[0]).cast("long").alias("src"))
    arcs = arcs.join(keep, "src").select(
        F.col("src").alias("node"), F.col("dst").alias("other")
    ).distinct()
    if max_opposite_degree is not None:
        deg = arcs.groupBy("other").agg(F.count(F.lit(1)).alias("d"))
        arcs = arcs.join(
            deg.filter(F.col("d") <= max_opposite_degree).select("other"), "other"
        )
    return arcs


def weighted_projected_graph(
    g: SparkGraph,
    nodes: DataFrame,
    *,
    ratio: bool = False,
    max_opposite_degree: Optional[int] = None,
) -> SparkGraph:
    """Project the bipartite graph onto ``nodes``; edge weight = number of
    shared opposite-side neighbors (``ratio=True`` divides by the size of
    the opposite side, ``projection.py:90`` semantics). Returns an
    undirected SparkGraph over ``nodes``.
    """
    arcs = _side_arcs(g, nodes, max_opposite_degree)
    a = arcs.select(F.col("node").alias("src"), "other")
    b = arcs.select(F.col("node").alias("dst"), "other")
    pairs = (
        a.join(b, "other")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    if ratio:
        keep = nodes.select(F.col(nodes.columns[0]).cast("long").alias("id"))
        n_opp = (
            g.vertices.select("id").join(keep, "id", "left_anti").count()
        )
        pairs = pairs.withColumn(
            "weight", F.col("weight") / F.lit(float(n_opp or 1))
        )
    return SparkGraph(
        pairs,
        nodes.select(F.col(nodes.columns[0]).cast("long").alias("id")),
        directed=False,
        coalesce_edges=False,
    )


def projected_graph(
    g: SparkGraph, nodes: DataFrame, *, max_opposite_degree: Optional[int] = None
) -> SparkGraph:
    """Unweighted projection (``projection.py:12``): u ~ v iff they share at
    least one opposite-side neighbor."""
    w = weighted_projected_graph(
        g, nodes, max_opposite_degree=max_opposite_degree
    )
    return SparkGraph(
        w.edges.select("src", "dst", F.lit(1.0).alias("weight")),
        w.vertices,
        directed=False,
        coalesce_edges=False,
    )


def overlap_weighted_projected_graph(
    g: SparkGraph,
    nodes: DataFrame,
    *,
    jaccard: bool = True,
    max_opposite_degree: Optional[int] = None,
) -> SparkGraph:
    """Neighborhood-overlap weights (``projection.py:244``): Jaccard
    |N(u)∩N(v)| / |N(u)∪N(v)|, or with ``jaccard=False`` the overlap
    coefficient |N(u)∩N(v)| / min(|N(u)|, |N(v)|)."""
    arcs = _side_arcs(g, nodes, max_opposite_degree)
    deg = arcs.groupBy("node").agg(F.count(F.lit(1)).alias("nd"))
    a = arcs.select(F.col("node").alias("src"), "other")
    b = arcs.select(F.col("node").alias("dst"), "other")
    inter = (
        a.join(b, "other")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("i"))
    )
    da = deg.select(F.col("node").alias("src"), F.col("nd").alias("da"))
    db = deg.select(F.col("node").alias("dst"), F.col("nd").alias("db"))
    joined = inter.join(da, "src").join(db, "dst")
    if jaccard:
        w = F.col("i") / (F.col("da") + F.col("db") - F.col("i"))
    else:
        w = F.col("i") / F.least("da", "db")
    pairs = joined.select("src", "dst", w.alias("weight"))
    return SparkGraph(
        pairs,
        nodes.select(F.col(nodes.columns[0]).cast("long").alias("id")),
        directed=False,
        coalesce_edges=False,
    )


def birank(
    g: SparkGraph,
    top_nodes: DataFrame,
    *,
    alpha: Optional[float] = None,
    beta: Optional[float] = None,
    top_personalization: Optional[DataFrame] = None,
    bottom_personalization: Optional[DataFrame] = None,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    fixed_iter: Optional[int] = None,
) -> DataFrame:
    """BiRank scores (He et al., TKDE 2017) — ``(id BIGINT, score DOUBLE)``
    over both bipartite sides.

    Matches ``networkx/algorithms/bipartite/link_analysis.py:9`` exactly:
    symmetric-sqrt-normalized biadjacency ``S = D_u^{-1/2} W D_p^{-1/2}``
    (disconnected degrees treated as 1), iteration
    ``p = α·Sᵀu + (1−α)·p0`` / ``u = β·Sp + (1−β)·u0`` from
    ``p = 1/|top|``, relative-L1 convergence per side (err < n_side·tol),
    L1 normalization of both sides when α = β = 1, and
    ``PowerIterationFailedConvergence`` past ``max_iter``. α/β default to
    0.8 when the matching personalization is given, else 1; personalization
    values must be non-negative and are NOT normalized (unlike pagerank).

    Same plan shape as :func:`linkgraph.algos.hits.hits`: the normalized
    arc table is computed once and pinned; each iteration is two join+agg
    passes over it plus one state checkpoint.

    ``fixed_iter=k`` runs exactly k iterations with no convergence test
    (the deterministic oracle/benchmark workload).
    """
    from linkgraph.iterutils import SuperstepCache, loop_partitions
    from linkgraph.exceptions import PowerIterationFailedConvergence

    spark = g.spark
    top = top_nodes.select(
        F.col(top_nodes.columns[0]).cast("long").alias("id")
    ).distinct()
    bottom = g.vertices.select("id").join(top, "id", "left_anti")
    n_top = top.count()
    n_bottom = bottom.count()
    if n_top == 0 or n_bottom == 0:
        raise ValueError(
            "birank requires a bipartite graph with at least one node per set"
        )
    if alpha is None:
        alpha = 0.8 if top_personalization is not None else 1.0
    if beta is None:
        beta = 0.8 if bottom_personalization is not None else 1.0
    if not (0 <= alpha <= 1 and 0 <= beta <= 1):
        raise ValueError("alpha and beta must be in [0, 1]")

    def _pers(df, side, name):
        if df is None:
            return side.select("id", F.lit(0.0).alias(name))
        p = df.select(
            F.col(df.columns[0]).cast("long").alias("id"),
            F.col(df.columns[1]).cast("double").alias(name),
        )
        if p.filter(F.col(name) < 0).limit(1).count():
            raise ValueError("personalization values must be non-negative")
        return side.join(p, "id", "left").select(
            "id", F.coalesce(name, F.lit(0.0)).alias(name)
        )

    # cross-side arcs (i in bottom, j in top) with symmetric-sqrt weights
    sym = g.symmetric_edges()
    bt = (
        sym.join(bottom.select(F.col("id").alias("src")), "src")
        .join(top.select(F.col("id").alias("dst")), "dst")
        .select(F.col("src").alias("i"), F.col("dst").alias("j"), "weight")
    )
    di = bt.groupBy("i").agg(F.sum("weight").alias("di"))
    dj = bt.groupBy("j").agg(F.sum("weight").alias("dj"))
    arcs = (
        bt.join(di, "i")
        .join(dj, "j")
        .select(
            "i",
            "j",
            (
                F.col("weight")
                / F.sqrt(F.when(F.col("di") != 0, F.col("di")).otherwise(1.0))
                / F.sqrt(F.when(F.col("dj") != 0, F.col("dj")).otherwise(1.0))
            ).alias("s"),
        )
    )
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    m = bt.count()
    parts = loop_partitions(m, cap, rows_per_partition=40_000)
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    cache = SuperstepCache(spark)
    try:
        arcs = arcs.repartition(parts, "i").persist()
        arcs.count()
        p0 = _pers(top_personalization, top, "p0")
        u0 = _pers(bottom_personalization, bottom, "u0")
        base_t = cache.truncate(p0)  # (id, p0)
        base_b = cache.truncate(u0)  # (id, u0)

        def s_p(p):  # u-side contribution: (S p)_i = Σ_j s_ij p_j
            return (
                arcs.join(p.withColumnRenamed("id", "j"), "j")
                .groupBy(F.col("i").alias("id"))
                .agg(F.sum(F.col("s") * F.col("val")).alias("c"))
            )

        def s_t_u(u):  # p-side contribution: (Sᵀ u)_j = Σ_i s_ij u_i
            return (
                arcs.join(u.withColumnRenamed("id", "i"), "i")
                .groupBy(F.col("j").alias("id"))
                .agg(F.sum(F.col("s") * F.col("val")).alias("c"))
            )

        p = top.select("id", F.lit(1.0 / n_top).alias("val"))
        u = base_b.join(s_p(p), "id", "left").select(
            "id",
            (
                F.lit(beta) * F.coalesce("c", F.lit(0.0))
                + F.lit(1.0 - beta) * F.col("u0")
            ).alias("val"),
        )
        state_p = cache.truncate(p)
        state_u = cache.truncate(u)
        n_iter = fixed_iter if fixed_iter is not None else max_iter
        converged = fixed_iter is not None
        for _ in range(n_iter):
            new_p = base_t.join(s_t_u(state_u), "id", "left").select(
                "id",
                (
                    F.lit(alpha) * F.coalesce("c", F.lit(0.0))
                    + F.lit(1.0 - alpha) * F.col("p0")
                ).alias("val"),
            )
            new_p = cache.truncate(new_p)
            new_u = base_b.join(s_p(new_p), "id", "left").select(
                "id",
                (
                    F.lit(beta) * F.coalesce("c", F.lit(0.0))
                    + F.lit(1.0 - beta) * F.col("u0")
                ).alias("val"),
            )
            new_u = cache.truncate(new_u)
            if fixed_iter is None:
                # relative-L1 errors, both sides in one pass each
                def _err(old, new):
                    return (
                        old.select("id", F.col("val").alias("o"))
                        .join(new, "id")
                        .agg(
                            F.sum(
                                F.abs(
                                    (F.col("o") - F.col("val"))
                                    / F.greatest(F.lit(1.0), F.col("o"))
                                )
                            )
                        )
                        .first()[0]
                        or 0.0
                    )

                err_u = _err(state_u, new_u)
                done = err_u < n_bottom * tol and _err(state_p, new_p) < n_top * tol
            else:
                done = False
            cache.release(state_p)
            cache.release(state_u)
            state_p, state_u = new_p, new_u
            if done:
                converged = True
                break
        if not converged:
            raise PowerIterationFailedConvergence(max_iter)
        out = state_p.unionByName(state_u)
        if alpha == 1 and beta == 1:
            sums = state_p.agg(F.sum("val").alias("sp")).crossJoin(
                state_u.agg(F.sum("val").alias("su"))
            )
            out = (
                state_p.crossJoin(F.broadcast(sums)).select(
                    "id", (F.col("val") / F.col("sp")).alias("val")
                )
            ).unionByName(
                state_u.crossJoin(F.broadcast(sums)).select(
                    "id", (F.col("val") / F.col("su")).alias("val")
                )
            )
        res = out.select("id", F.col("val").alias("score"))
        res = res.localCheckpoint(eager=True)
        arcs.unpersist()
        cache.close(keep_result=True)
        return res
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def color(g: SparkGraph) -> DataFrame:
    """(id, color): a two-coloring (``networkx/algorithms/bipartite/
    basic.py:17``): per component the min-id node takes color 1 (the
    reference's scan-order start), neighbors alternate; isolates take 0.
    Raises :class:`NetworkXError` when the graph is not bipartite.

    Plan: BFS parity from every component root simultaneously (the roots
    come from the large-star/small-star CC labels), then one edge⋈color
    join checks every edge is bi-chromatic.
    """
    from linkgraph.exceptions import NetworkXError
    from linkgraph.algos.components import connected_components
    from linkgraph.algos.distance import all_pairs_shortest_path_lengths

    und = g.undirected_view() if g.directed else g
    comp = connected_components(und)
    roots = comp.select(F.col("component").alias("id")).distinct()
    dist = all_pairs_shortest_path_lengths(und, sources=roots)
    deg0 = und.symmetric_edges().select(F.col("src").alias("id")).distinct()
    colors = (
        dist.select("id", (1 - F.pmod(F.col("distance"), F.lit(2))).alias("color"))
        .join(deg0, "id", "left_semi")  # non-isolates: parity color
        .unionByName(
            g.vertices.select("id").join(deg0, "id", "left_anti")
            .select("id", F.lit(0).cast("long").alias("color"))
        )
    ).localCheckpoint()
    bad = (
        und.symmetric_edges()
        .join(colors.select(F.col("id").alias("src"), F.col("color").alias("cs")), "src")
        .join(colors.select(F.col("id").alias("dst"), F.col("color").alias("cd")), "dst")
        .filter(F.col("cs") == F.col("cd"))
    )
    if not bad.isEmpty():
        raise NetworkXError("Graph is not bipartite.")
    return colors


def is_bipartite(g: SparkGraph) -> bool:
    """``basic.py:88``."""
    from linkgraph.exceptions import NetworkXError

    try:
        color(g)
        return True
    except NetworkXError:
        return False


def sets(g: SparkGraph) -> "tuple[DataFrame, DataFrame]":
    """Bipartite node sets (X, Y) as two one-column DataFrames
    (``basic.py:109``). Like the reference, raises
    :class:`AmbiguousSolution` when the graph is disconnected (the
    bipartition is not unique) and :class:`NetworkXError` when it is not
    bipartite."""
    from linkgraph.exceptions import AmbiguousSolution

    und = g.undirected_view() if g.directed else g
    from linkgraph.algos.components import connected_components

    n_comp = (
        connected_components(und).select("component").distinct().count()
    )
    if n_comp > 1:
        raise AmbiguousSolution(
            "Disconnected graph: ambiguous solution for bipartite sets."
        )
    c = color(g)
    return (
        c.filter(F.col("color") == 1).select("id"),
        c.filter(F.col("color") == 0).select("id"),
    )


def maximum_matching(g: SparkGraph, top_nodes: DataFrame) -> DataFrame:
    """Maximum-cardinality bipartite matching as ``(u, v)`` rows (u on the
    top side) — ``networkx/algorithms/bipartite/matching.py:58``
    ``hopcroft_karp_matching`` result parity via unit-capacity Dinitz
    (max matching = max flow through a super source/sink; the blocking-flow
    phases ARE Hopcroft–Karp's level phases, O(√V) of them).
    """
    from linkgraph.algos.flow import maximum_flow

    spark = g.spark
    top = top_nodes.select(
        F.col(top_nodes.columns[0]).cast("long").alias("id")
    ).persist()
    verts = g.vertices.select("id")
    bottom = verts.join(top, "id", "left_anti").persist()
    hi = verts.agg(F.max("id")).collect()[0][0] or 0
    s, t = int(hi) + 1, int(hi) + 2
    arcs = g.symmetric_edges().select("src", "dst")
    tb = arcs.join(top.withColumnRenamed("id", "src"), "src", "left_semi").join(
        bottom.withColumnRenamed("id", "dst"), "dst", "left_semi"
    )
    net = (
        top.select(F.lit(s).cast("long").alias("src"), F.col("id").alias("dst"))
        .unionByName(tb.select("src", "dst"))
        .unionByName(
            bottom.select(F.col("id").alias("src"), F.lit(t).cast("long").alias("dst"))
        )
        .withColumn("capacity", F.lit(1.0))
    )
    net_g = SparkGraph(net, directed=True, coalesce_edges=False)
    _, flow = maximum_flow(net_g, s, t, "capacity")
    out = (
        flow.filter((F.col("flow") > 0.5) & (F.col("u") != s) & (F.col("v") != t))
        .select(F.col("u"), F.col("v"))
        .join(top.withColumnRenamed("id", "u"), "u", "left_semi")
    )
    return out


def to_vertex_cover(g: SparkGraph, matching: DataFrame, top_nodes: DataFrame) -> DataFrame:
    """König's theorem: a minimum vertex cover from a maximum bipartite
    matching (``bipartite/matching.py:172`` ``to_vertex_cover``):
    Z = nodes reachable from unmatched top nodes by alternating paths;
    cover = (top − Z) ∪ (bottom ∩ Z). Alternating reachability is one
    distributed BFS over (unmatched-direction top→bottom, matched-direction
    bottom→top) arcs."""
    from linkgraph.iterutils import SuperstepCache

    spark = g.spark
    top = top_nodes.select(
        F.col(top_nodes.columns[0]).cast("long").alias("id")
    ).persist()
    verts = g.vertices.select("id")
    bottom = verts.join(top, "id", "left_anti")
    m = matching.select(
        F.col(matching.columns[0]).cast("long").alias("u"),
        F.col(matching.columns[1]).cast("long").alias("v"),
    ).persist()
    arcs = g.symmetric_edges().select("src", "dst")
    tb = arcs.join(top.withColumnRenamed("id", "src"), "src", "left_semi").join(
        bottom.withColumnRenamed("id", "dst"), "dst", "left_semi"
    )
    unmatched_fwd = tb.join(m.withColumnRenamed("u", "src").withColumnRenamed("v", "dst"), ["src", "dst"], "left_anti")
    matched_back = m.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    walk = unmatched_fwd.unionByName(matched_back).persist()
    free_top = top.join(m.select(F.col("u").alias("id")), "id", "left_anti")
    cache = SuperstepCache(spark)
    seen = cache.truncate(free_top.select("id"))
    frontier = seen
    while True:
        nxt = cache.truncate(
            walk.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(seen, "id", "left_anti")
        )
        if nxt.limit(1).count() == 0:
            break
        seen = cache.truncate(seen.unionByName(nxt))
        frontier = nxt
    z = seen.localCheckpoint(eager=True)
    cache.close(keep_result=True)
    cover = top.join(z, "id", "left_anti").unionByName(
        bottom.join(z, "id", "left_semi")
    )
    walk.unpersist()
    return cover


def latapy_clustering(g: SparkGraph, *, mode: str = "dot") -> DataFrame:
    """(id, clustering): the Latapy bipartite clustering coefficient
    (``bipartite/cluster.py:31`` ``latapy_clustering``):
    c_u = mean over second-order neighbors v of c_uv, with c_uv the
    dot/min/max common-neighbor ratio. Three joins: wedges u–w–v give the
    common counts, a degree join gives the denominators, one groupBy
    averages — no per-node Python."""
    if mode not in ("dot", "min", "max"):
        raise ValueError(f"Mode for bipartite clustering must be: dot, min or max")
    from linkgraph.algos.degrees import degrees

    arcs = g.symmetric_edges().select("src", "dst")
    deg = degrees(g).persist()
    a = arcs.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    b = arcs.select(F.col("dst").alias("w"), F.col("src").alias("v"))
    common = (
        a.join(b, "w")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("degree").alias("dv"))
    pairs = common.join(du, "u").join(dv, "v")
    if mode == "dot":
        cc = F.col("c") / (F.col("du") + F.col("dv") - F.col("c"))
    elif mode == "min":
        cc = F.col("c") / F.least("du", "dv")
    else:
        cc = F.col("c") / F.greatest("du", "dv")
    per_u = pairs.groupBy(F.col("u").alias("id")).agg(
        (F.sum(cc) / F.count(F.lit(1))).alias("clustering")
    )
    out = g.vertices.select("id").join(per_u, "id", "left").select(
        "id", F.coalesce("clustering", F.lit(0.0)).alias("clustering")
    )
    return out


def average_bipartite_clustering(g: SparkGraph, nodes: "Optional[DataFrame]" = None,
                                 *, mode: str = "dot") -> float:
    """Mean Latapy clustering (``bipartite/cluster.py:153``
    ``average_clustering``), optionally over one node set."""
    cl = latapy_clustering(g, mode=mode)
    if nodes is not None:
        cl = cl.join(
            nodes.select(F.col(nodes.columns[0]).cast("long").alias("id")),
            "id",
            "left_semi",
        )
    return float(cl.agg(F.avg("clustering")).collect()[0][0])


def robins_alexander_clustering(g: SparkGraph) -> float:
    """4·C₄ / L₃ (``bipartite/cluster.py:218``
    ``robins_alexander_clustering``): C₄ from same-side common-neighbor
    pairs (Σ C(c_uv, 2) / 2 — each square is seen from both sides), L₃
    from per-edge degree products (bipartite graphs are triangle-free, so
    Σ_(u,v)∈E (d_u−1)(d_v−1) counts 3-edge paths exactly)."""
    from linkgraph.algos.degrees import degrees

    if g.number_of_nodes() < 4 or g.number_of_edges() < 3:
        return 0.0
    deg = degrees(g).persist()
    e = g.edges.select("src", "dst")
    l3 = (
        e.join(deg.select(F.col("id").alias("src"), F.col("degree").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("dv")), "dst")
        .agg(F.sum((F.col("du") - 1) * (F.col("dv") - 1)))
        .collect()[0][0]
    )
    if not l3:
        return 0.0
    arcs = g.symmetric_edges().select("src", "dst")
    a = arcs.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    b = arcs.select(F.col("dst").alias("w"), F.col("src").alias("v"))
    sq = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2))
        .collect()[0][0]
    ) or 0
    c4 = float(sq) / 2.0
    return float(4.0 * c4 / float(l3))


def bipartite_density(g: SparkGraph, nodes: DataFrame) -> float:
    """Bipartite density (``bipartite/basic.py:226`` ``density``)."""
    n = g.number_of_nodes()
    m = g.number_of_edges()
    nb = nodes.select(
        F.col(nodes.columns[0]).cast("long").alias("id")
    ).distinct().count()
    nt = n - nb
    if m == 0:
        return 0.0
    if g.directed:
        return float(m) / (2.0 * nb * nt)
    return float(m) / (nb * nt)


def bipartite_degrees(g: SparkGraph, nodes: DataFrame, *, weight=None):
    """(degrees of the opposite set, degrees of ``nodes``) —
    ``bipartite/basic.py:279`` ``degrees``."""
    from linkgraph.algos.degrees import degrees

    d = degrees(g, weight is not None, weight=weight)
    side = nodes.select(F.col(nodes.columns[0]).cast("long").alias("id"))
    bottom = d.join(side, "id", "left_semi")
    top = d.join(side, "id", "left_anti")
    return top, bottom
