"""Community detection: Newman modularity and Louvain.

- :func:`modularity` — exact ``nx.community.modularity`` semantics
  (``networkx/algorithms/community/quality.py:145``): for undirected
  graphs Q = Σ_c [L_c/m − γ·(D_c/2m)²] where L_c is intra-community edge
  weight (self-loops once), D_c the community degree sum (self-loops
  twice), m = D/2; directed uses L_c/m − γ·D_c_out·D_c_in/m². Raises when
  ``communities`` is not a partition of the node set, mirroring
  ``NotAPartition``. One join + two aggregations — fully SQL-expressible.

- :func:`louvain_communities` — the Louvain method
  (``networkx/algorithms/community/louvain.py:16``; Blondel et al. 2008)
  re-expressed for synchronous distributed execution. The reference's
  local-moving phase sweeps nodes one at a time in seeded-shuffle order
  (``louvain.py:269``) — inherently sequential, so bit-identical output is
  out of reach by design. This twin keeps the same gain formula
  (``_one_level``, ``louvain.py:227``: remove_cost + k_i,in/m −
  γ·Stot·k_i/2m²) and level structure (local moves to a fixpoint, then
  community-aggregation coarsening), but evaluates all nodes' best moves
  per superstep from the same snapshot and applies a deterministic
  hash-coin half of the positive-gain moves per round — the standard
  guard against the A↔B swap oscillation of synchronous Louvain
  (cf. distributed Louvain literature, e.g. Que et al. IPDPS'15). Results
  are valid Louvain partitions, deterministic for a fixed seed; quality is
  asserted via :func:`modularity` in the parity tests rather than exact
  set equality.

Scale notes. One move round is: arcs ⋈ state (hash join on the pinned arc
layout) → two shuffle aggregations → one state checkpoint. The per-node
degree and community live in ONE state table, so no per-round degree join;
the community-strength table ``stot`` stays a lazy aggregate of that state.
Each level re-sizes ``spark.sql.shuffle.partitions`` to its arc count —
coarsened levels shrink geometrically and would otherwise pay the full
fan-out in empty-task scheduling (the local-bench killer, and at 1000
executors the same waste in reverse).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache, loop_partitions

__all__ = [
    "modularity",
    "louvain_communities",
    "leiden_communities",
    "partition_quality",
]

@contextmanager
def _loop_conf(spark, extra=None):
    """Freeze planner features that charge per-plan costs the iterative
    loop cannot amortize: AQE re-planning, sort-merge preference, and
    runtime-filter injection (whose search is superlinear in join count)."""
    keys = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
    }
    if extra:
        keys.update(extra)
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            pass
    for k, v in keys.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    try:
        yield
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _require_partition(g: SparkGraph, communities: DataFrame) -> None:
    """Raise like ``NotAPartition`` (``quality.py:107``) unless every node
    appears exactly once. Two anti-join probes, no collect."""
    ids = g.vertices.select("id")
    com = communities.select(F.col(communities.columns[0]).alias("id"))
    missing = ids.join(com, "id", "left_anti").limit(1).count()
    extra_or_dup = (
        com.join(ids, "id", "left_anti").limit(1).count()
        or com.groupBy("id").count().filter(F.col("count") > 1).limit(1).count()
    )
    if missing or extra_or_dup:
        raise ValueError("communities is not a valid partition of the graph nodes")


def modularity(
    g: SparkGraph, communities: DataFrame, *, resolution: float = 1.0
) -> float:
    """Exact Newman modularity of a partition. ``communities`` is a
    two-column DataFrame ``(id, community)``."""
    _require_partition(g, communities)
    com = communities.select(
        F.col(communities.columns[0]).cast("long").alias("id"),
        F.col(communities.columns[1]).alias("community"),
    )
    return _modularity_unchecked(g, com, resolution)


def _modularity_unchecked(
    g: SparkGraph, com: DataFrame, resolution: float
) -> float:
    """Newman modularity without the partition probes — internal path for
    the Louvain level loop, where the partition is valid by construction.
    One action (a single summed DataFrame)."""
    e = g.edges  # canonical storage: undirected rows once, self-loops once
    lab = com.select(F.col("id").alias("src"), F.col("community").alias("c_src"))
    lab2 = com.select(F.col("id").alias("dst"), F.col("community").alias("c_dst"))
    tagged = e.join(lab, "src").join(lab2, "dst")
    intra = tagged.filter(F.col("c_src") == F.col("c_dst")).groupBy(
        F.col("c_src").alias("community")
    ).agg(F.sum("weight").alias("lc"))

    if g.directed:
        m = e.agg(F.sum("weight")).first()[0]
        if not m:
            return 0.0
        m = float(m)
        outd = (
            e.join(lab, "src")
            .groupBy(F.col("c_src").alias("community"))
            .agg(F.sum("weight").alias("dout"))
        )
        ind = (
            e.join(lab2, "dst")
            .groupBy(F.col("c_dst").alias("community"))
            .agg(F.sum("weight").alias("din"))
        )
        per = (
            outd.join(ind, "community", "full")
            .join(intra, "community", "left")
            .select(
                (
                    F.coalesce("lc", F.lit(0.0)) / m
                    - F.lit(resolution)
                    * F.coalesce("dout", F.lit(0.0))
                    * F.coalesce("din", F.lit(0.0))
                    / (m * m)
                ).alias("q")
            )
        )
    else:
        # degree sum: each canonical row credits both endpoints (self-loop
        # row credits its node twice), matching nx degree semantics
        contrib = e.select(F.col("src").alias("id"), "weight").unionAll(
            e.select(F.col("dst").alias("id"), "weight")
        )
        deg = contrib.groupBy("id").agg(F.sum("weight").alias("k"))
        deg_sum = deg.agg(F.sum("k")).first()[0]  # = 2m
        if not deg_sum:
            return 0.0
        deg_sum = float(deg_sum)
        m = deg_sum / 2.0
        dsum = (
            com.join(deg, "id")
            .groupBy("community")
            .agg(F.sum("k").alias("dc"))
        )
        per = dsum.join(intra, "community", "left").select(
            (
                F.coalesce("lc", F.lit(0.0)) / m
                - F.lit(resolution)
                * F.col("dc")
                * F.col("dc")
                / (deg_sum * deg_sum)
            ).alias("q")
        )
    return float(per.agg(F.sum("q")).first()[0] or 0.0)


def _level_tables(g: SparkGraph):
    """(arcs-without-self-loops, initial state, m, arc_count) for one level.

    ``arcs`` is the symmetric neighbour-weight table (directed graphs merge
    out- and in-arcs, ``louvain.py:252-261``), hash-partitioned by ``dst``
    and pinned so every round's state join reuses the layout and only the
    small state side shuffles. The state table carries the per-node degree
    columns alongside the community label — the degrees are level constants,
    so folding them into the state removes a join from every round.

    Undirected state: ``(id, community, k)`` with self-loops counted twice
    in ``k`` and m = Σk/2. Directed: ``(id, community, kout, kin)``,
    m = total arc weight.
    """
    e = g.edges
    if g.directed:
        outd = e.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("kout"))
        ind = e.groupBy(F.col("dst").alias("id")).agg(F.sum("weight").alias("kin"))
        state = (
            g.vertices.select("id")
            .join(outd, "id", "left")
            .join(ind, "id", "left")
            .select(
                "id",
                F.col("id").alias("community"),
                F.coalesce("kout", F.lit(0.0)).alias("kout"),
                F.coalesce("kin", F.lit(0.0)).alias("kin"),
            )
        )
        m = e.agg(F.sum("weight")).first()[0]
        noself = e.filter(F.col("src") != F.col("dst"))
        arcs = noself.select("src", "dst", "weight").unionAll(
            noself.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
        arcs = arcs.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    else:
        contrib = e.select(F.col("src").alias("id"), "weight").unionAll(
            e.select(F.col("dst").alias("id"), "weight")
        )
        state = (
            g.vertices.select("id")
            .join(contrib.groupBy("id").agg(F.sum("weight").alias("k")), "id", "left")
            .select(
                "id",
                F.col("id").alias("community"),
                F.coalesce("k", F.lit(0.0)).alias("k"),
            )
        )
        m = e.agg(F.sum("weight")).first()[0]
        noself = e.filter(F.col("src") != F.col("dst"))
        arcs = noself.unionAll(
            noself.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    return arcs, state, float(m or 0.0)


def _one_level(
    g: SparkGraph,
    cache: SuperstepCache,
    *,
    resolution: float,
    seed: int,
    max_move_rounds: int,
) -> DataFrame:
    """Local-moving phase on one level graph: returns ``(id, community)``.

    Per round (one snapshot, synchronous):
    1. ``w2c``: Σ weight from node i to each neighbouring community, union'd
       with a zero-weight row for i's OWN community so every node scores its
       stay option through the same formula — exactly ``_one_level``'s
       defaultdict semantics (``louvain.py:276-315``: w(i→c_i) defaults
       to 0 when i has no intra-community neighbour).
    2. score(c) = w(i→c)/m − γ·k_i·Stot'(c)/(2m²) per candidate, where
       Stot' has i removed when c is i's own community; gain = best
       foreign score − stay score.
    3. Nodes with a strictly positive best gain move — gated by a per-round
       hash coin (about half move) to break synchronous A↔B swaps;
       converged when no node has a positive gain. ONE checkpoint per round
       (the next state, carrying a had-gain flag for the termination probe).
    """
    spark = g.spark
    arcs, state0, m = _level_tables(g)
    if m <= 0:
        return g.vertices.select("id", F.col("id").alias("community"))
    directed = g.directed

    n_arcs = arcs.count()
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = loop_partitions(n_arcs, default_parts)

    with _loop_conf(spark, {"spark.sql.shuffle.partitions": str(parts)}):
        arcs = arcs.repartition(parts, "dst").persist()
        state = cache.truncate(state0)
        carry = ["kout", "kin"] if directed else ["k"]
        for rnd in range(max_move_rounds):
            if directed:
                stot = state.groupBy("community").agg(
                    F.sum("kout").alias("s_out"), F.sum("kin").alias("s_in")
                )
            else:
                stot = state.groupBy("community").agg(F.sum("k").alias("s"))
            # weights from each node to each neighbouring community, plus a
            # zero row for the node's own community (see docstring)
            w2c = (
                arcs.join(
                    state.select(
                        F.col("id").alias("dst"), F.col("community").alias("c")
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("id"), "c")
                .agg(F.sum("weight").alias("w"))
                .unionByName(
                    state.select(
                        "id",
                        F.col("community").alias("c"),
                        F.lit(0.0).alias("w"),
                    )
                )
                .groupBy("id", "c")
                .agg(F.sum("w").alias("w"))
            )
            cand = w2c.join(state, "id").join(
                stot.withColumnRenamed("community", "c"), "c"
            )
            is_own = F.col("c") == F.col("community")
            if directed:
                s_in_adj = F.col("s_in") - F.when(is_own, F.col("kin")).otherwise(
                    F.lit(0.0)
                )
                s_out_adj = F.col("s_out") - F.when(is_own, F.col("kout")).otherwise(
                    F.lit(0.0)
                )
                score = F.col("w") / m - F.lit(resolution) * (
                    F.col("kout") * s_in_adj + F.col("kin") * s_out_adj
                ) / (m * m)
            else:
                s_adj = F.col("s") - F.when(is_own, F.col("k")).otherwise(F.lit(0.0))
                score = F.col("w") / m - F.lit(resolution) * (
                    s_adj * F.col("k")
                ) / (2.0 * m * m)
            agg = (
                cand.select(
                    "id", "c", *carry, score.alias("score"), is_own.alias("is_own")
                )
                .groupBy("id")
                .agg(
                    *[F.first(col).alias(col) for col in carry],
                    F.max(F.when(F.col("is_own"), F.col("c"))).alias("community"),
                    F.max(F.when(F.col("is_own"), F.col("score"))).alias("stay"),
                    F.max(F.when(~F.col("is_own"), F.col("score"))).alias(
                        "best_score"
                    ),
                    F.max_by(
                        F.when(~F.col("is_own"), F.col("c")),
                        F.when(
                            ~F.col("is_own"),
                            F.struct(F.col("score"), (-F.col("c")).alias("tie")),
                        ),
                    ).alias("new_c"),
                )
            )
            has_gain = F.col("best_score").isNotNull() & (
                F.col("best_score") - F.col("stay") > 1e-12
            )
            moves = F.pmod(F.xxhash64("id", F.lit(seed), F.lit(rnd)), F.lit(2)) == 0
            nxt = agg.select(
                "id",
                F.when(has_gain & moves, F.col("new_c"))
                .otherwise(F.col("community"))
                .alias("community"),
                *carry,
                has_gain.alias("_gain"),
            )
            # ONE checkpoint per round: re-roots the ~6-join plan (Catalyst
            # analysis goes superlinear if plans compound across rounds) and
            # backs both the termination probe and the next round's reads
            nxt = cache.truncate(nxt, retire=state)
            state = nxt
            if state.filter(F.col("_gain")).limit(1).count() == 0:
                break
        arcs.unpersist()
    return state.select("id", "community")


def _refine_connectivity(
    level_g: SparkGraph, comm: DataFrame, cache: SuperstepCache
) -> DataFrame:
    """Leiden refinement, connectivity form (Traag, Waltman & van Eck 2019,
    "From Louvain to Leiden", §A refinement): split every community into
    its connected components so no community is internally disconnected —
    the paper's headline defect of Louvain. Splitting a disconnected
    community never lowers Q (intra weight is unchanged; the degree-sum
    penalty (D/2m)² strictly drops), so refined levels dominate unrefined
    ones. Reuses the large-star/small-star CC machinery over the
    intra-community edge set — one extra CC run per level."""
    from linkgraph.algos.components import connected_components

    lab = comm.select(F.col("id").alias("src"), F.col("community").alias("c_src"))
    lab2 = comm.select(F.col("id").alias("dst"), F.col("community").alias("c_dst"))
    intra = (
        level_g.edges.join(lab, "src")
        .join(lab2, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .select("src", "dst", "weight")
    )
    sub = SparkGraph(
        intra,
        level_g.vertices.select("id"),
        directed=False,  # weak connectivity is the Leiden criterion
        coalesce_edges=False,
    )
    cc = connected_components(sub)
    return cache.truncate(cc.select("id", F.col("component").alias("community")))


def partition_quality(
    g: SparkGraph, communities: DataFrame
) -> "tuple[float, float]":
    """``(coverage, performance)`` of a partition —
    ``networkx/algorithms/community/quality.py:346``.

    Coverage is the intra-community edge fraction; performance is
    ``(intra edges + inter-community non-edges) / total node pairs``
    (``quality.py:166,259`` semantics, multigraph edges counted with
    multiplicity). Plan: one edges⋈labels⋈labels tagging pass for the
    intra count plus one community-size aggregation — the non-edge term is
    closed-form (``Σ s_c·(s_c−1)`` pairs), never enumerated.
    """
    _require_partition(g, communities)
    com = communities.select(
        F.col(communities.columns[0]).cast("long").alias("id"),
        F.col(communities.columns[1]).alias("community"),
    )
    m = g.number_of_edges()
    n = g.number_of_nodes()
    lab_s = com.select(F.col("id").alias("src"), F.col("community").alias("c_src"))
    lab_d = com.select(F.col("id").alias("dst"), F.col("community").alias("c_dst"))
    intra = (
        g.edges.join(lab_s, "src")
        .join(lab_d, "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .count()
    )
    inter = m - intra
    pair_row = (
        com.groupBy("community")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1)).alias("p"))
        .first()
    )
    intra_pairs = int(pair_row["p"] or 0)
    total_pairs = n * (n - 1)
    if not g.directed:
        intra_pairs //= 2
        total_pairs //= 2
    coverage = intra / m if m else 1.0
    performance = (
        (intra + (total_pairs - intra_pairs - inter)) / total_pairs
        if total_pairs
        else 1.0
    )
    return coverage, performance


def louvain_communities(
    g: SparkGraph,
    *,
    resolution: float = 1.0,
    threshold: float = 1e-7,
    max_level: Optional[int] = None,
    seed: int = 42,
    max_move_rounds: int = 50,
) -> DataFrame:
    """Louvain partition as ``(id, community)`` over the ORIGINAL node ids;
    the community label is the minimum member id (deterministic).

    Level loop mirrors ``louvain_partitions`` (``louvain.py:135``): local
    moves to a fixpoint, stop when the level's modularity gain ≤
    ``threshold`` (or ``max_level`` reached), else coarsen communities into
    super-nodes (intra-community weight becomes a self-loop) and recurse.
    The per-level modularity is computed on the LEVEL graph — Q is
    invariant under the coarsening (the self-loop carries L_c, the
    super-node degree carries D_c), so this matches the reference's value
    while touching only the (geometrically shrinking) coarsened tables.
    """
    return _partition_levels(
        g,
        refine=False,
        resolution=resolution,
        threshold=threshold,
        max_level=max_level,
        seed=seed,
        max_move_rounds=max_move_rounds,
    )


def leiden_communities(
    g: SparkGraph,
    *,
    resolution: float = 1.0,
    threshold: float = 1e-7,
    max_level: Optional[int] = None,
    seed: int = 42,
    max_move_rounds: int = 50,
) -> DataFrame:
    """Leiden partition (Traag et al. 2019; the reference grew
    ``nx.community.leiden_communities`` alongside ``louvain.py``):
    the Louvain level loop with a CONNECTIVITY REFINEMENT pass between
    local moving and coarsening, so every returned community is internally
    connected — the guarantee Louvain lacks. The refinement is the
    deterministic connectivity form (see :func:`_refine_connectivity`);
    the paper's randomized merge queue has no distributed analog, and the
    connectivity guarantee plus the Q-dominance argument are what the
    parity tests pin (partition validity, every community connected,
    modularity >= Louvain's on the same fixture and seed)."""
    return _partition_levels(
        g,
        refine=True,
        resolution=resolution,
        threshold=threshold,
        max_level=max_level,
        seed=seed,
        max_move_rounds=max_move_rounds,
    )


def _partition_levels(
    g: SparkGraph,
    *,
    refine: bool,
    resolution: float,
    threshold: float,
    max_level: Optional[int],
    seed: int,
    max_move_rounds: int,
) -> DataFrame:
    spark = g.spark
    cache = SuperstepCache(spark)
    # mapping from original id to current community
    mapping = cache.truncate(g.vertices.select("id", F.col("id").alias("community")))
    level_g = g
    prev_q = _modularity_unchecked(
        g, g.vertices.select("id", F.col("id").alias("community")), resolution
    )
    level = 0
    with _loop_conf(spark):
        while True:
            level += 1
            comm = _one_level(
                level_g,
                cache,
                resolution=resolution,
                seed=seed + level,
                max_move_rounds=max_move_rounds,
            )
            if refine:
                comm = _refine_connectivity(level_g, comm, cache)
            # compose: original -> old community -> new community
            new_mapping = cache.truncate(
                mapping.join(
                    comm.select(
                        F.col("id").alias("community"), F.col("community").alias("c2")
                    ),
                    "community",
                ).select("id", F.col("c2").alias("community")),
                retire=mapping,
            )
            q = _modularity_unchecked(level_g, comm, resolution)
            mapping = new_mapping
            if q - prev_q <= threshold:
                break
            prev_q = q
            if max_level is not None and level >= max_level:
                break
            # coarsen: communities become nodes; weights aggregate; intra
            # weight becomes a self-loop (canonicalization handles orientation)
            lab = comm.select(
                F.col("id").alias("src"), F.col("community").alias("c_src")
            )
            lab2 = comm.select(
                F.col("id").alias("dst"), F.col("community").alias("c_dst")
            )
            e2 = (
                level_g.edges.join(lab, "src")
                .join(lab2, "dst")
                .select(
                    F.col("c_src").alias("src"), F.col("c_dst").alias("dst"), "weight"
                )
            )
            v2 = comm.select(F.col("community").alias("id")).distinct()
            # materialize the coarsened tables: without this each level's plan
            # embeds every previous level's joins and the driver OOMs on plan
            # bookkeeping alone after a few levels
            coarse = SparkGraph(e2, v2, directed=g.directed, coalesce_edges=True)
            level_g = SparkGraph(
                cache.truncate(coarse.edges),
                cache.truncate(coarse.vertices),
                directed=g.directed,
                coalesce_edges=False,
            )
    # deterministic label: min original member id
    canon = mapping.groupBy("community").agg(F.min("id").alias("label"))
    out = mapping.join(canon, "community").select(
        "id", F.col("label").alias("community")
    )
    out = cache.truncate(out, retire=mapping)
    cache.close(keep_result=True)
    return out
