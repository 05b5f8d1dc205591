"""Algebraic connectivity and the Fiedler vector.

Reference: ``networkx/linalg/algebraicconnectivity.py`` —
``algebraic_connectivity`` (:385), ``fiedler_vector`` (:445),
``spectral_ordering`` (:503), ``spectral_bisection`` (:586). The
reference runs TraceMIN / Lanczos / LOBPCG over a SciPy Laplacian; this
module runs **inverse power iteration with the distributed conjugate
gradient** already powering resistance distance and current-flow
centrality (``currentflow._batched_cg_diag``): every outer step solves
``L y = x`` with nothing but arc⋈vector joins, deflates the constant
null vector by mean-centering (one scalar aggregate), and normalizes.
Convergence ratio per outer step is λ₂/λ₃ — the inverse iteration
analogue of the reference's shift-and-invert TraceMIN — and each step is
edge-linear, so the whole computation is a fixed number of CG sweeps
over the edge table: the only Fiedler shape that survives 100 TB.

Zero-weight edges are ignored and weights enter by absolute value,
matching the reference's ``_preprocess_graph``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.exceptions import NetworkXError, NotImplementedForDirected
from linkgraph.graph import SparkGraph

__all__ = [
    "algebraic_connectivity",
    "fiedler_vector",
    "spectral_ordering",
    "spectral_bisection",
]


def _fiedler_state(
    g: SparkGraph,
    weight,
    tol: float,
    max_iter: int,
    seed: int,
    normalized: bool = False,
) -> "tuple[DataFrame, float]":
    from linkgraph.algos.components import is_connected
    from linkgraph.algos.currentflow import _batched_cg_diag
    from linkgraph.graph import resolve_weight_column

    if g.directed:
        raise NotImplementedForDirected("fiedler_vector: undirected only")
    n = g.number_of_nodes()
    if n < 2:
        raise NetworkXError("graph has less than 2 nodes.")
    if not is_connected(g):
        raise NetworkXError("graph is not connected.")

    spark = g.spark
    wcol = resolve_weight_column(g.edges, weight)
    base = (
        g.symmetric_edges()
        .select("src", "dst", F.abs(wcol).alias("c"))
        .filter((F.col("c") > 0) & (F.col("src") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.sum("c").alias("c"))
        .persist()
    )
    verts = g.vertices.select("id").persist()
    diag = base.groupBy(F.col("src").alias("id")).agg(F.sum("c").alias("d"))
    diag = verts.join(diag, "id", "left").select(
        "id", F.coalesce("d", F.lit(0.0)).alias("d")
    )

    null = None  # normalized Laplacian's kernel direction D^{1/2}·1
    if normalized:
        # L_norm = D^{-1/2} L D^{-1/2}: unit diagonal (connected ⇒ no
        # isolated nodes), off-diagonals scaled by 1/sqrt(d_u d_v); the
        # constant null vector becomes sqrt(d), so deflation projects
        # against it instead of mean-centering.
        dsr = diag.select("id", F.sqrt(F.col("d")).alias("sq")).persist()
        scaled = (
            base.join(
                dsr.select(F.col("id").alias("src"), F.col("sq").alias("_su")),
                "src",
            )
            .join(
                dsr.select(F.col("id").alias("dst"), F.col("sq").alias("_sv")),
                "dst",
            )
            .select(
                "src", "dst",
                (F.col("c") / (F.col("_su") * F.col("_sv"))).alias("c"),
            )
            .persist()
        )
        base.unpersist()
        base = scaled
        diag = verts.select("id", F.lit(1.0).alias("d"))
        nn = dsr.agg(F.sqrt(F.sum(F.col("sq") * F.col("sq")))).first()[0]
        null = dsr.select("id", (F.col("sq") / F.lit(float(nn))).alias("w")).persist()

    # deterministic pseudo-random start, deflated against the kernel
    x = verts.select(
        "id",
        (F.xxhash64("id", F.lit(seed)).cast("double") / F.lit(2.0**63)).alias("v"),
    )

    def center_normalize(df):
        if null is None:
            mu = df.agg(F.avg("v")).collect()[0][0]
            c = df.select("id", (F.col("v") - F.lit(float(mu))).alias("v"))
        else:
            dot = (
                df.join(null, "id")
                .agg(F.sum(F.col("v") * F.col("w")))
                .first()[0]
                or 0.0
            )
            c = df.join(null, "id").select(
                "id", (F.col("v") - F.lit(float(dot)) * F.col("w")).alias("v")
            )
        nrm = c.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("s")).collect()[0][
            "s"
        ]
        if not nrm or nrm == 0.0:
            raise NetworkXError("fiedler iteration degenerated")
        return c.select("id", (F.col("v") / F.lit(float(nrm))).alias("v"))

    x = center_normalize(x).persist()
    lam_prev = None
    lam = None
    for _ in range(max_iter):
        rhs = x.select(F.lit(0).alias("s"), "id", F.col("v").alias("b"))
        sol = _batched_cg_diag(
            spark, verts, base, diag, rhs, tol=min(tol, 1e-10), max_iter=5000
        )
        y = sol.select("id", F.col("x").alias("v"))
        # Rayleigh quotient of y: with L y = x (up to deflation),
        # yᵀLy / yᵀy = yᵀx / yᵀy
        dots = (
            y.join(x.select("id", F.col("v").alias("xv")), "id")
            .agg(
                F.sum(F.col("v") * F.col("xv")).alias("yx"),
                F.sum(F.col("v") * F.col("v")).alias("yy"),
            )
            .collect()[0]
        )
        lam = float(dots["yx"]) / float(dots["yy"])
        nxt = center_normalize(y).persist()
        x.unpersist()
        x = nxt
        if lam_prev is not None and abs(lam - lam_prev) <= tol * max(abs(lam), 1e-30):
            lam_prev = lam
            break
        lam_prev = lam
    base.unpersist()
    verts.unpersist()
    return x, float(lam)


def fiedler_vector(
    g: SparkGraph,
    weight=None,
    normalized: bool = False,
    *,
    tol: float = 1e-8,
    max_iter: int = 100,
    seed: int = 42,
    method=None,
) -> DataFrame:
    """(id, value): the unit-norm eigenvector of the second-smallest
    Laplacian eigenvalue (``algebraicconnectivity.py:445``;
    ``normalized=True`` uses D^{-1/2} L D^{-1/2}). ``method`` is accepted
    for signature parity — every reference method converges to the same
    eigenpair; the engine always runs the distributed inverse-power/CG
    kernel. Sign is normalized so the smallest node id carries a
    non-negative value (the reference's sign is solver-dependent;
    eigenvectors are sign-free)."""
    x, _ = _fiedler_state(g, weight, tol, max_iter, seed, normalized)
    head = x.orderBy("id").limit(1).collect()[0]["v"]
    if head < 0:
        x = x.select("id", (-F.col("v")).alias("v"))
    return x.select("id", F.col("v").alias("value"))


def algebraic_connectivity(
    g: SparkGraph,
    weight=None,
    normalized: bool = False,
    *,
    tol: float = 1e-8,
    max_iter: int = 100,
    seed: int = 42,
    method=None,
) -> float:
    """λ₂ of the (weighted) Laplacian (``algebraicconnectivity.py:385``);
    ``normalized=True`` → λ₂ of D^{-1/2} L D^{-1/2}. ``method`` accepted
    for parity (all reference methods compute the same value)."""
    _, lam = _fiedler_state(g, weight, tol, max_iter, seed, normalized)
    return lam


def spectral_ordering(
    g: SparkGraph,
    weight=None,
    *,
    tol: float = 1e-8,
    max_iter: int = 100,
    seed: int = 42,
) -> DataFrame:
    """(id, pos): nodes ordered by Fiedler value
    (``algebraicconnectivity.py:503``; connected graphs — the reference
    concatenates per-component orderings, run per component here).
    Ordering between equal values breaks on id; the reverse ordering is
    equally valid spectrally (eigenvector sign), normalized like
    :func:`fiedler_vector`."""
    from pyspark.sql import Window

    fv = fiedler_vector(g, weight, tol=tol, max_iter=max_iter, seed=seed)
    return fv.select(
        "id",
        (F.row_number().over(Window.orderBy("value", "id")) - 1).alias("pos"),
    )


def spectral_bisection(
    g: SparkGraph,
    weight=None,
    *,
    tol: float = 1e-8,
    max_iter: int = 100,
    seed: int = 42,
) -> "tuple[DataFrame, DataFrame]":
    """Two node DataFrames split by Fiedler sign
    (``algebraicconnectivity.py:586``): (negative side, non-negative
    side)."""
    fv = fiedler_vector(g, weight, tol=tol, max_iter=max_iter, seed=seed).persist()
    neg = fv.filter(F.col("value") < 0).select("id")
    pos = fv.filter(F.col("value") >= 0).select("id")
    return neg, pos
