"""Distributed PageRank — damped power iteration as DataFrame join + agg.

Semantics match the reference's scipy kernel
(``networkx/algorithms/link_analysis/pagerank_alg.py:358-498``) exactly:

- right-stochastic normalization ``A = Q @ A`` where ``Q = diag(1/S)`` and
  ``S`` is the per-row weight sum; rows with ``S == 0`` become zero rows,
  i.e. **dangling** (``pagerank_alg.py:477-481, 489``)
- ``x_{k+1} = alpha * (x_k @ A + danglesum * dangling_weights) + (1-alpha) * p``
  (``pagerank_alg.py:491-493``)
- init ``x_0 = 1/N`` or normalized ``nstart`` (``:468-472``)
- personalization normalized, ``ZeroDivisionError`` on zero sum (``:475-481``)
- L1 convergence ``err < N * tol`` (``:495-496``)
- ``PowerIterationFailedConvergence`` after ``max_iter`` (``:498``)
- undirected input symmetrized (``pagerank_alg.py:128`` via
  ``to_scipy_sparse_array``); multigraph parallel edges summed
  (``convert_matrix.py:649-656`` — handled at SparkGraph construction)

Scale design (the 100 TB story):

- The normalized edge table is computed **once**, hash-partitioned by ``src``
  and persisted; every iteration re-joins the (N-row) rank vector against it,
  so the big side never re-shuffles after the first materialization.
- The per-iteration ``groupBy(dst)`` runs with map-side partial aggregation
  (Spark HashAggregate partial → final), which bounds hub-key (power-law
  in-degree) reduce skew to ≤ one row per map task per key. On top of that,
  ``hub_salt`` enables an explicit two-phase salted aggregation
  (``groupBy(dst, pmod(hash(src), s))`` → ``groupBy(dst)``) for clusters
  where a single final-agg partition would still be hot.
- Dangling mass is a driver-side scalar per iteration (one tiny agg job),
  exactly the reference's closed form — never a dense N×N correction.
- Lineage is truncated every iteration (localCheckpoint) or re-rooted at a
  parquet snapshot via :class:`linkgraph.state.CheckpointStore`, which also
  provides mid-run resume with per-iteration convergence metrics.
"""

from __future__ import annotations

import time
from typing import Optional, Union

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.iterutils import SuperstepCache
from linkgraph.state import CheckpointStore, IterationMetrics


class PowerIterationFailedConvergence(Exception):
    """Raised when power iteration fails to converge within ``max_iter``
    iterations (mirror of ``networkx.PowerIterationFailedConvergence``)."""

    def __init__(self, num_iterations: int):
        self.num_iterations = num_iterations
        super().__init__(
            f"power iteration failed to converge within {num_iterations} iterations"
        )


def _node_vector(g: SparkGraph, spec, name: str) -> DataFrame:
    """Normalize a {id: value} dict or an (id, value) DataFrame to a
    DataFrame (id, <name>) summing to 1. Missing nodes get 0, matching
    ``personalization.get(n, 0)`` (``pagerank_alg.py:476, 486``)."""
    if isinstance(spec, dict):
        rows = [(int(k), float(v)) for k, v in spec.items()]
        df = g.spark.createDataFrame(rows, ["id", name])
    else:
        df = spec.select(
            F.col(spec.columns[0]).cast("long").alias("id"),
            F.col(spec.columns[1]).cast("double").alias(name),
        )
    total = df.agg(F.sum(name)).first()[0]
    if total is None or total == 0:
        raise ZeroDivisionError(f"sum of {name} values is zero")
    return df.withColumn(name, F.col(name) / F.lit(float(total)))


def pagerank(
    g: SparkGraph,
    alpha: float = 0.85,
    personalization: Optional[Union[dict, DataFrame]] = None,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    nstart: Optional[Union[dict, DataFrame]] = None,
    dangling: Optional[Union[dict, DataFrame]] = None,
    *,
    hub_salt: int = 0,
    checkpoint_store: Optional[CheckpointStore] = None,
    checkpoint_interval: int = 1,
    resume: bool = False,
    lineage_truncate_interval: int = 10,
) -> DataFrame:
    """Return DataFrame ``(id BIGINT, rank DOUBLE)``; ranks sum to 1.

    Raises :class:`PowerIterationFailedConvergence` like the reference
    (``pagerank_alg.py:498``) and ``ZeroDivisionError`` on an all-zero
    personalization vector (``pagerank_alg.py:478``).
    """
    spark = g.spark
    vertices = g.vertices.select("id").persist()
    n = vertices.count()
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")

    # --- one-time edge prep: stochastic normalization ------------------- #
    # (stochastic_graph semantics, networkx/generators/stochastic.py:17)
    adj = g.symmetric_edges()
    out_w = adj.groupBy("src").agg(F.sum("weight").alias("out_w"))
    norm = (
        adj.join(out_w, "src")
        .filter(F.col("out_w") != 0)
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("p_edge"))
    )
    if g.num_partitions:
        norm = norm.repartition(g.num_partitions, "src")
    norm = norm.persist()
    edge_count = norm.count()  # materialize once; also the per-iter work metric

    # Dangling nodes: zero out-weight rows of A (pagerank_alg.py:489).
    # Carried as a flag on the per-node base table so the dangling-mass sum
    # fuses into the convergence aggregation (one driver job per iteration).
    nondangling = out_w.filter(F.col("out_w") != 0).select(F.col("src").alias("id"))
    base = vertices.join(
        nondangling.withColumn("_nd", F.lit(True)), "id", "left"
    ).select("id", F.coalesce("_nd", F.lit(False)).alias("is_nd"))
    base = base.select("id", (~F.col("is_nd")).alias("is_dang"))
    n_dangling = base.filter("is_dang").count()

    # --- per-node constant vectors p (teleport) and dw (dangling) ------- #
    uniform = personalization is None and dangling is None
    if not uniform:
        p_df = (
            _node_vector(g, personalization, "p")
            if personalization is not None
            else vertices.withColumn("p", F.lit(1.0 / n))
        )
        dw_df = (
            _node_vector(g, dangling, "dw")
            if dangling is not None
            else p_df.select("id", F.col("p").alias("dw"))
        )
        base = (
            base.join(p_df, "id", "left")
            .join(dw_df, "id", "left")
            .select(
                "id",
                "is_dang",
                F.coalesce("p", F.lit(0.0)).alias("p"),
                F.coalesce("dw", F.lit(0.0)).alias("dw"),
            )
        )
    base = base.persist()
    base.count()

    # --- initial vector -------------------------------------------------- #
    start_iter = 0
    danglesum: Optional[float] = None
    if resume and checkpoint_store is not None and checkpoint_store.latest_iteration() >= 0:
        start_iter = checkpoint_store.latest_iteration() + 1
        x = checkpoint_store.load(start_iter - 1, spark)
    elif nstart is not None:
        x = _node_vector(g, nstart, "rank").join(vertices, "id", "right").select(
            "id", F.coalesce("rank", F.lit(0.0)).alias("rank")
        )
    else:
        x = vertices.select("id", F.lit(1.0 / n).alias("rank"))
        danglesum = n_dangling / n  # uniform init: exact, no job needed

    cache = SuperstepCache(spark, truncate_interval=lineage_truncate_interval)
    inv_n = 1.0 / n
    for k in range(start_iter, max_iter):
        t0 = time.monotonic()
        xlast = x

        # danglesum = sum of rank over dangling nodes (pagerank_alg.py:492).
        # Normally carried over from the previous iteration's fused
        # aggregation; computed explicitly only on resume / nstart entry.
        if n_dangling == 0:
            danglesum = 0.0
        elif danglesum is None:
            danglesum = (
                x.join(base.filter("is_dang"), "id", "left_semi")
                .agg(F.sum("rank"))
                .first()[0]
                or 0.0
            )

        # x @ A : join ranks to normalized edges on src, sum into dst.
        contrib_rows = norm.join(
            x.withColumnRenamed("id", "src"), "src"
        ).select("src", "dst", (F.col("rank") * F.col("p_edge")).alias("c"))
        if hub_salt > 1:
            # explicit two-phase salted aggregation for hot dst keys: spread a
            # hub's incoming contributions over `hub_salt` partial keys by the
            # hash of the contributing src, then combine.
            contrib = (
                contrib_rows.withColumn(
                    "_salt", F.pmod(F.hash("src"), F.lit(hub_salt))
                )
                .groupBy("dst", "_salt")
                .agg(F.sum("c").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("c"))
            )
        else:
            contrib = contrib_rows.groupBy("dst").agg(F.sum("c").alias("c"))

        if uniform:
            rank_expr = (
                F.lit(alpha)
                * (F.coalesce("c", F.lit(0.0)) + F.lit(danglesum * inv_n))
                + F.lit((1.0 - alpha) * inv_n)
            )
        else:
            rank_expr = (
                F.lit(alpha)
                * (F.coalesce("c", F.lit(0.0)) + F.lit(danglesum) * F.col("dw"))
                + F.lit(1.0 - alpha) * F.col("p")
            )
        x_new = base.join(
            contrib.withColumnRenamed("dst", "id"), "id", "left"
        ).select("id", rank_expr.alias("rank"), "is_dang")

        # Materialize the superstep (truncates lineage: write+read parquet),
        # then one fused aggregation yields both the L1 error and the next
        # iteration's dangling mass — two driver jobs per iteration total.
        joined = x_new.join(
            xlast.select("id", F.col("rank").alias("rank_prev")), "id"
        )
        if checkpoint_store is not None and (k % checkpoint_interval == 0):
            joined = checkpoint_store.commit(
                joined,
                IterationMetrics(
                    k,
                    edges_processed=edge_count,
                    wall_ms=int((time.monotonic() - t0) * 1000),
                    extra={"danglesum": danglesum, "alpha": alpha},
                ),
            )
        else:
            joined = cache.truncate(joined)
        row = joined.agg(
            F.sum(F.abs(F.col("rank") - F.col("rank_prev"))).alias("err"),
            F.sum(F.when(F.col("is_dang"), F.col("rank")).otherwise(0.0)).alias(
                "dsum"
            ),
        ).first()
        err, danglesum = row["err"], row["dsum"]
        x = joined.select("id", "rank")
        if checkpoint_store is not None and (k % checkpoint_interval == 0):
            checkpoint_store.update_metrics(k, l1_err=float(err))

        if err < n * tol:
            cache.close(keep_result=True)
            return x
    cache.close()
    raise PowerIterationFailedConvergence(max_iter)


def top_pagerank(g: SparkGraph, k: int = 20, **kwargs) -> DataFrame:
    """Top-k nodes by rank — Catalyst compiles orderBy+limit to
    TakeOrderedAndProject (true distributed top-k, SURVEY.md §2.H)."""
    return pagerank(g, **kwargs).orderBy(F.desc("rank"), "id").limit(k)
