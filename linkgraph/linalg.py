"""Dense linear-algebra bridges: matrices and spectra.

Reference: ``networkx/linalg/`` — ``graphmatrix.py`` (``adjacency_matrix``,
``incidence_matrix``), ``laplacianmatrix.py`` (``laplacian_matrix``,
``normalized_laplacian_matrix``), ``modularitymatrix.py``,
``bethehessianmatrix.py``, ``spectrum.py`` (the ``*_spectrum`` family),
plus ``networkx/algorithms/non_randomness.py:14``.

These objects are dense/O(n²) BY DEFINITION, so like the reference (which
materializes SciPy arrays) they are driver-gated numpy bridges over the
distributed edge table, guarded by ``max_nodes``. The distributed twins
remain the scale path: pagerank for spectra-derived ranking, the CG
kernel for Laplacian solves, :mod:`linkgraph.algos.fiedler` for λ₂.
Matrices return ``(ndarray, ids)`` — SciPy is not in this environment, so
the ndarray replaces the reference's sparse array (same values).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import functions as F

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph, resolve_weight_column

__all__ = [
    "adjacency_matrix",
    "incidence_matrix",
    "laplacian_matrix",
    "normalized_laplacian_matrix",
    "modularity_matrix",
    "bethe_hessian_matrix",
    "adjacency_spectrum",
    "laplacian_spectrum",
    "normalized_laplacian_spectrum",
    "modularity_spectrum",
    "bethe_hessian_spectrum",
    "non_randomness",
    "attr_matrix",
    "attr_sparse_matrix",
    "directed_laplacian_matrix",
    "directed_combinatorial_laplacian_matrix",
    "directed_modularity_matrix",
]

_MAX_NODES = 20_000


def _ids(g: SparkGraph, nodelist):
    return list(nodelist) if nodelist is not None else sorted(
        r["id"] for r in g.vertices.select("id").collect()
    )


def adjacency_matrix(g: SparkGraph, nodelist=None, *, weight=None,
                     max_nodes: int = _MAX_NODES):
    """(A, ids): dense weighted adjacency (``graphmatrix.py:117``;
    undirected graphs symmetric, self-loop weight on the diagonal once,
    parallel-edge weights summed by the SparkGraph coalesce)."""
    import numpy as np

    ids = _ids(g, nodelist)
    n = len(ids)
    if n > max_nodes:
        raise NetworkXError(f"adjacency_matrix is dense; {n} > {max_nodes}")
    idx = {v: i for i, v in enumerate(ids)}
    base = g.symmetric_edges() if not g.directed else g.edges
    rows = base.select(
        "src", "dst", resolve_weight_column(base, weight).alias("w")
    ).collect()
    A = np.zeros((n, n))
    for r in rows:
        if r["src"] in idx and r["dst"] in idx:
            A[idx[r["src"]], idx[r["dst"]]] += float(r["w"])
    return A, ids


def incidence_matrix(
    g: SparkGraph, nodelist=None, *, oriented: bool = False, weight=None,
    max_nodes: int = _MAX_NODES,
):
    """(B, ids): node × edge incidence (``graphmatrix.py:17``): column per
    edge in (src, dst)-sorted order; oriented puts -1 at the source."""
    import numpy as np

    ids = _ids(g, nodelist)
    n = len(ids)
    if n > max_nodes:
        raise NetworkXError(f"incidence_matrix is dense; {n} > {max_nodes}")
    idx = {v: i for i, v in enumerate(ids)}
    base = g.edges
    rows = (
        base.select("src", "dst", resolve_weight_column(base, weight).alias("w"))
        .orderBy("src", "dst")
        .collect()
    )
    B = np.zeros((n, len(rows)))
    for j, r in enumerate(rows):
        u, v, w = idx[r["src"]], idx[r["dst"]], float(r["w"])
        wv = w if weight is not None else 1.0
        if oriented and u != v:
            B[u, j] = -wv
            B[v, j] = wv
        else:
            B[u, j] = wv
            B[v, j] = wv
    return B, ids


def laplacian_matrix(g: SparkGraph, nodelist=None, *, weight=None,
                     max_nodes: int = _MAX_NODES):
    """(L, ids) = D − A (``laplacianmatrix.py:13``)."""
    import numpy as np

    A, ids = adjacency_matrix(g, nodelist, weight=weight, max_nodes=max_nodes)
    return np.diag(A.sum(axis=1)) - A, ids


def normalized_laplacian_matrix(g: SparkGraph, nodelist=None, *, weight=None,
                                max_nodes: int = _MAX_NODES):
    """(N, ids) = D^{-1/2} L D^{-1/2} with 0 for isolated nodes
    (``laplacianmatrix.py:92``)."""
    import numpy as np

    A, ids = adjacency_matrix(g, nodelist, weight=weight, max_nodes=max_nodes)
    d = A.sum(axis=1)
    with np.errstate(divide="ignore"):
        dh = np.where(d > 0, 1.0 / np.sqrt(d), 0.0)
    L = np.diag(d) - A
    return (dh[:, None] * L) * dh[None, :], ids


def modularity_matrix(g: SparkGraph, nodelist=None, *, weight=None,
                      max_nodes: int = _MAX_NODES):
    """(B, ids) = A − k kᵀ / 2m (``modularitymatrix.py:9``; undirected)."""
    if g.directed:
        raise NetworkXError("modularity_matrix: undirected only")
    A, ids = adjacency_matrix(g, nodelist, weight=weight, max_nodes=max_nodes)
    k = A.sum(axis=1)
    two_m = k.sum()
    return A - k[:, None] * k[None, :] / two_m, ids


def bethe_hessian_matrix(g: SparkGraph, r: Optional[float] = None, nodelist=None,
                         *, max_nodes: int = _MAX_NODES):
    """(H, ids) = (r²−1)I − rA + D (``bethehessianmatrix.py:10``);
    default r = Σd²/Σd − 1, like the reference."""
    import numpy as np

    A, ids = adjacency_matrix(g, nodelist, max_nodes=max_nodes)
    d = A.sum(axis=1)
    if r is None:
        r = float((d ** 2).sum() / d.sum() - 1.0)
    n = len(ids)
    return (r ** 2 - 1) * np.eye(n) - r * A + np.diag(d), ids


def adjacency_spectrum(g: SparkGraph, *, weight=None, max_nodes: int = _MAX_NODES):
    """Eigenvalues of A, descending by real part (``spectrum.py:77``; the
    reference's order is solver-dependent — sorted here)."""
    import numpy as np

    A, _ = adjacency_matrix(g, weight=weight, max_nodes=max_nodes)
    ev = np.linalg.eigvals(A)
    return ev[np.argsort(-ev.real)]


def laplacian_spectrum(g: SparkGraph, *, weight=None, max_nodes: int = _MAX_NODES):
    """Ascending eigenvalues of L (``spectrum.py:12``)."""
    import numpy as np

    L, _ = laplacian_matrix(g, weight=weight, max_nodes=max_nodes)
    return np.sort(np.linalg.eigvalsh(L))


def normalized_laplacian_spectrum(g: SparkGraph, *, weight=None,
                                  max_nodes: int = _MAX_NODES):
    """Ascending eigenvalues of the normalized Laplacian
    (``spectrum.py:42``)."""
    import numpy as np

    N, _ = normalized_laplacian_matrix(g, weight=weight, max_nodes=max_nodes)
    return np.sort(np.linalg.eigvalsh(N))


def modularity_spectrum(g: SparkGraph, *, max_nodes: int = _MAX_NODES):
    """Eigenvalues of the modularity matrix, descending real
    (``spectrum.py:106``)."""
    import numpy as np

    B, _ = modularity_matrix(g, max_nodes=max_nodes)
    ev = np.linalg.eigvals(B)
    return ev[np.argsort(-ev.real)]


def bethe_hessian_spectrum(g: SparkGraph, r: Optional[float] = None,
                           *, max_nodes: int = _MAX_NODES):
    """Ascending eigenvalues of the Bethe Hessian (``spectrum.py:142``)."""
    import numpy as np

    H, _ = bethe_hessian_matrix(g, r, max_nodes=max_nodes)
    return np.sort(np.linalg.eigvalsh(H))


def non_randomness(g: SparkGraph, k: Optional[int] = None, *, weight=None,
                   max_nodes: int = _MAX_NODES) -> "tuple[float, float]":
    """(R_G, R*_G) — Ying & Wu spectral non-randomness
    (``non_randomness.py:14``, eq. 4.4/4.5): R_G = sum of the k largest
    adjacency eigenvalues, R* its ER-normalized form. The reference sums
    the first k eigenvalues in solver order (explicitly order-unstable —
    its own docstring shows two identical graphs disagreeing); here the
    eigenvalues are sorted descending by real part, the deterministic
    reading of eq. 4.4. ``k`` defaults to the engine's label-propagation
    community count, like the reference."""
    import numpy as np

    from linkgraph.algos.components import is_connected

    n = g.number_of_nodes()
    m = g.number_of_edges()
    if m == 0:
        raise NetworkXError("non_randomness not applicable to empty graphs")
    if not is_connected(g):
        raise NetworkXError("Non connected graph.")
    if g.selfloop_edges().limit(1).count() > 0:
        raise NetworkXError("Graph must not contain self-loops")
    if k is None:
        from linkgraph.algos.lpa import label_propagation_communities

        k = (
            label_propagation_communities(g)
            .select("community")
            .distinct()
            .count()
        )
    p = (2 * k * m) / (n * (n - k)) if n > k else 0
    if not 1 <= k < n or not 0 < p < 1:
        raise ValueError(
            f"invalid number of communities for graph with {n} nodes and "
            f"{m} edges: {k}"
        )
    ev = adjacency_spectrum(g, weight=weight, max_nodes=max_nodes)
    nr = float(np.real(np.sum(ev[:k])))
    nr_rd = (nr - ((n - 2 * k) * p + k)) / math.sqrt(2 * k * p * (1 - p))
    return nr, float(nr_rd)


def _attr_group_sums(g: SparkGraph, edge_attr, node_attr):
    """Distributed core of ``attr_matrix``: one groupBy over the edge
    table keyed by the endpoint attribute values. Returns rows
    ((u_val, v_val), summed edge value) with undirected edges counted
    once per unordered pair (mirrored later)."""
    if node_attr is None:
        nval = lambda side: F.col(side)  # noqa: E731 — node itself
        vcols = g.vertices.select(F.col("id"), F.col("id").alias("_nv"))
    else:
        if node_attr not in g.vertices.columns:
            raise NetworkXError(f"attr_matrix: no vertex column {node_attr!r}")
        vcols = g.vertices.select("id", F.col(node_attr).alias("_nv"))
    base = g.edges
    if edge_attr is None:
        ev = F.lit(1.0)
    elif edge_attr in base.columns:
        ev = F.col(edge_attr).cast("double")
    else:
        raise NetworkXError(f"attr_matrix: no edge column {edge_attr!r}")
    joined = (
        base.select("src", "dst", ev.alias("_ev"))
        .join(vcols.select(F.col("id").alias("src"), F.col("_nv").alias("_uv")), "src")
        .join(vcols.select(F.col("id").alias("dst"), F.col("_nv").alias("_vv")), "dst")
    )
    return joined.groupBy("_uv", "_vv").agg(F.sum("_ev").alias("_s")).collect()


def attr_matrix(
    g: SparkGraph,
    edge_attr=None,
    node_attr=None,
    normalized: bool = False,
    rc_order=None,
):
    """``networkx/linalg/attrmatrix.py`` ``attr_matrix`` — the edge table
    aggregated by endpoint attribute classes. ``edge_attr``/``node_attr``
    are COLUMN NAMES (the Spark twin of the reference's callables; None =
    count / node identity). The heavy part — summing edge values per
    attribute pair — is one distributed groupBy; only the k×k class
    matrix reaches the driver. Returns (M, ordering) or M when
    ``rc_order`` is given, like the reference (ordering sorted for
    determinism where the reference's set order is arbitrary)."""
    import numpy as np

    rows = _attr_group_sums(g, edge_attr, node_attr)
    if rc_order is None:
        if node_attr is None:
            ordering = sorted(r["id"] for r in g.vertices.select("id").collect())
        else:
            ordering = sorted(
                r[0] for r in g.vertices.select(node_attr).distinct().collect()
            )
    else:
        ordering = list(rc_order)
    index = {v: i for i, v in enumerate(ordering)}
    N = len(ordering)
    M = np.zeros((N, N))
    for r in rows:
        if r["_uv"] not in index or r["_vv"] not in index:
            continue
        i, j = index[r["_uv"]], index[r["_vv"]]
        M[i, j] += float(r["_s"])
        if not g.directed and i != j:
            M[j, i] += float(r["_s"])
    if normalized:
        sums = M.sum(axis=1).reshape((N, 1))
        sums[sums == 0] = 1.0
        M = M / sums
    if rc_order is None:
        return M, ordering
    return M


def attr_sparse_matrix(
    g: SparkGraph,
    edge_attr=None,
    node_attr=None,
    normalized: bool = False,
    rc_order=None,
):
    """``attrmatrix.py`` ``attr_sparse_matrix`` — sparse twin (SciPy
    gated; raises ImportError without it, like the reference)."""
    import scipy.sparse as sp

    out = attr_matrix(g, edge_attr, node_attr, normalized, rc_order)
    if rc_order is None:
        M, ordering = out
        return sp.lil_array(M), ordering
    return sp.lil_array(out)


def _transition_matrix(g: SparkGraph, ids, weight, walk_type, alpha):
    """Chung-Laplacian transition matrix P (``laplacianmatrix.py``
    ``_transition_matrix``): random / lazy / pagerank walks."""
    import numpy as np

    from linkgraph.algos.strongly_connected import is_strongly_connected, is_aperiodic

    if walk_type is None:
        if is_strongly_connected(g):
            walk_type = "random" if is_aperiodic(g) else "lazy"
        else:
            walk_type = "pagerank"
    A, _ = adjacency_matrix(g, ids, weight=weight)
    n = A.shape[0]
    if walk_type in ("random", "lazy"):
        rs = A.sum(axis=1)
        rs[rs == 0] = 1.0
        P = A / rs[:, None]
        if walk_type == "lazy":
            P = (np.identity(n) + P) / 2.0
    elif walk_type == "pagerank":
        if not 0 < alpha < 1:
            raise NetworkXError("alpha must be between 0 and 1")
        A = A.copy()
        A[A.sum(axis=1) == 0, :] = 1 / n
        A = A / A.sum(axis=1)[:, None]
        P = alpha * A + (1 - alpha) / n
    else:
        raise NetworkXError("walk_type must be random, lazy, or pagerank")
    return P


def _stationary(P):
    import numpy as np

    evals, evecs = np.linalg.eig(P.T)
    v = evecs[:, np.argmax(evals.real)].real
    return v / v.sum()


def directed_laplacian_matrix(
    g: SparkGraph, nodelist=None, *, weight=True, walk_type=None,
    alpha: float = 0.95, max_nodes: int = _MAX_NODES,
):
    """``laplacianmatrix.py`` ``directed_laplacian_matrix`` — Chung's
    normalized directed Laplacian ``I - (Φ^½ P Φ^-½ + Φ^-½ Pᵀ Φ^½)/2``
    with Φ the walk's stationary distribution. Dense by definition →
    driver-gated numerics over the distributed edge table."""
    import numpy as np

    ids = _ids(g, nodelist)
    if len(ids) > max_nodes:
        raise NetworkXError(f"directed_laplacian_matrix is dense; {len(ids)} > {max_nodes}")
    P = _transition_matrix(g, ids, weight, walk_type, alpha)
    p = _stationary(P)
    sqrtp = np.sqrt(np.abs(p))
    inv = np.divide(1.0, sqrtp, out=np.zeros_like(sqrtp), where=sqrtp != 0)
    Q = (sqrtp[:, None] * P) * inv[None, :]
    return np.identity(len(ids)) - (Q + Q.T) / 2.0


def directed_combinatorial_laplacian_matrix(
    g: SparkGraph, nodelist=None, *, weight=True, walk_type=None,
    alpha: float = 0.95, max_nodes: int = _MAX_NODES,
):
    """``laplacianmatrix.py`` ``directed_combinatorial_laplacian_matrix``
    — ``Φ - (ΦP + PᵀΦ)/2``."""
    import numpy as np

    ids = _ids(g, nodelist)
    if len(ids) > max_nodes:
        raise NetworkXError(
            f"directed_combinatorial_laplacian_matrix is dense; {len(ids)} > {max_nodes}"
        )
    P = _transition_matrix(g, ids, weight, walk_type, alpha)
    p = _stationary(P)
    Phi = np.diag(p)
    return Phi - (Phi @ P + P.T @ Phi) / 2.0


def directed_modularity_matrix(
    g: SparkGraph, nodelist=None, *, weight=None, max_nodes: int = _MAX_NODES
):
    """``modularitymatrix.py`` ``directed_modularity_matrix`` —
    ``B = A - k_out k_inᵀ / m``."""
    import numpy as np

    ids = _ids(g, nodelist)
    if len(ids) > max_nodes:
        raise NetworkXError(f"directed_modularity_matrix is dense; {len(ids)} > {max_nodes}")
    A, _ = adjacency_matrix(g, ids, weight=weight)
    k_in = A.sum(axis=0)
    k_out = A.sum(axis=1)
    m = k_in.sum()
    return A - np.outer(k_out, k_in) / m
