"""Dense matrix bridges: the Google matrix and Kirchhoff's spanning-tree
count.

Reference: ``networkx/algorithms/link_analysis/pagerank_alg.py``
``google_matrix`` (:330) and
``networkx/algorithms/tree/mst.py``-sibling ``number_of_spanning_trees``
(``networkx/algorithms/tree/branchings.py`` / ``total_spanning_tree_weight``
lineage; nx ≥3.3 exposes ``number_of_spanning_trees``).

Both are O(n²)/O(n³) dense objects BY DEFINITION (an n×n stochastic
matrix; a determinant), so they are driver-gated numpy bridges over the
distributed edge table — the same division the reference draws, where
these APIs materialize numpy arrays while the iterative twins (pagerank,
MST) stay sparse. The scale path for ranking is :func:`linkgraph.algos.
pagerank.pagerank`; these exist for the small-matrix API surface.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph, resolve_weight_column

__all__ = ["google_matrix", "number_of_spanning_trees"]


def google_matrix(
    g: SparkGraph,
    alpha: float = 0.85,
    personalization: Optional[dict] = None,
    nodelist: Optional[list] = None,
    dangling: Optional[dict] = None,
    *,
    weight=None,
    max_nodes: int = 20_000,
):
    """(matrix, ids): the dense Google matrix and its row/column node ids
    (``pagerank_alg.py:330``): row-stochastic weighted adjacency, dangling
    rows replaced by the dangling (default personalization) vector, damped
    toward the personalization vector."""
    import numpy as np

    ids = nodelist or sorted(r["id"] for r in g.vertices.select("id").collect())
    n = len(ids)
    if n > max_nodes:
        raise NetworkXError(
            f"google_matrix is dense O(n²); {n} nodes > max_nodes={max_nodes}"
        )
    idx = {v: i for i, v in enumerate(ids)}
    base = g.symmetric_edges() if not g.directed else g.edges
    rows = base.select(
        "src", "dst", resolve_weight_column(base, weight).alias("w")
    ).collect()
    A = np.zeros((n, n))
    for r in rows:
        A[idx[r["src"]], idx[r["dst"]]] += float(r["w"])

    if personalization is None:
        p = np.full(n, 1.0 / n)
    else:
        p = np.array([float(personalization.get(v, 0.0)) for v in ids])
        if p.sum() == 0:
            raise ZeroDivisionError("personalization vector sums to 0")
        p = p / p.sum()
    if dangling is None:
        dang = p
    else:
        dang = np.array([float(dangling.get(v, 0.0)) for v in ids])
        dang = dang / dang.sum()

    out = A.sum(axis=1)
    is_dangling = out == 0
    A[is_dangling] = dang
    out = A.sum(axis=1)
    A = A / out[:, None]
    return alpha * A + (1 - alpha) * p, ids


def number_of_spanning_trees(
    g: SparkGraph, *, weight=None, max_nodes: int = 5_000
) -> float:
    """Kirchhoff's matrix-tree count: det of any cofactor of the (weighted)
    Laplacian (nx ``number_of_spanning_trees``; weighted = total spanning
    tree weight). Undirected, connected; raises otherwise like the
    reference."""
    import numpy as np

    if g.directed:
        raise NetworkXError(
            "number_of_spanning_trees: directed form (arborescences) not implemented"
        )
    from linkgraph.algos.components import is_connected

    n = g.number_of_nodes()
    if n == 0:
        raise NetworkXError("Graph G must contain at least one node.")
    if n == 1:
        return 1.0
    if not is_connected(g):
        return 0.0
    if n > max_nodes:
        raise NetworkXError(
            f"number_of_spanning_trees is a dense determinant; {n} nodes > "
            f"max_nodes={max_nodes}"
        )
    ids = sorted(r["id"] for r in g.vertices.select("id").collect())
    idx = {v: i for i, v in enumerate(ids)}
    base = g.edges
    rows = base.select(
        "src", "dst", resolve_weight_column(base, weight).alias("w")
    ).collect()
    L = np.zeros((n, n))
    for r in rows:
        u, v, w = idx[r["src"]], idx[r["dst"]], float(r["w"])
        if u == v:
            continue
        L[u, v] -= w
        L[v, u] -= w
        L[u, u] += w
        L[v, v] += w
    return float(np.linalg.det(L[1:, 1:]))
