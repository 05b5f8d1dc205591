"""Small-world coefficient.

Reference: ``networkx/algorithms/smallworld.py`` ``sigma`` — the
Humphries–Gurney coefficient ``(C/Cr)/(L/Lr)`` where C is transitivity, L
the average shortest path length, and the r-subscripted values come from
degree-preserving randomized references (Maslov–Sneppen rewiring, the
reference's ``random_reference``). The distributed twin reuses
:func:`linkgraph.algos.swap.double_edge_swap` (parallel swap rounds,
seeded) for the references, the wedge-join transitivity, and the batched
all-pairs BFS for L — so the whole measure is the composition of three
already-distributed operators. ``omega`` stays out of scope: its
``lattice_reference`` rewires toward a lattice under an acceptance test
that is inherently one-swap-at-a-time.

Deviation (documented): a randomized reference can disconnect; the
reference's ``average_shortest_path_length`` would raise there, so for the
REFERENCE graphs L_r is taken over reachable pairs (the standard
estimator). For the input graph the strict reference behavior is kept
(raises when disconnected).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.exceptions import NotImplementedForDirected
from linkgraph.graph import SparkGraph

__all__ = ["sigma", "random_reference"]


def random_reference(g: SparkGraph, niter: int = 1, seed: int = 42) -> SparkGraph:
    """Degree-preserving randomized copy: ~``niter`` swaps per edge
    (``smallworld.py:16`` semantics via the parallel double-edge-swap)."""
    from linkgraph.algos.swap import double_edge_swap

    m = g.number_of_edges()
    return double_edge_swap(g, nswap=max(1, niter * m), seed=seed)


def _reachable_aspl(g: SparkGraph) -> float:
    from linkgraph.algos.distance import all_pairs_shortest_path_lengths

    row = (
        all_pairs_shortest_path_lengths(g)
        .filter(F.col("distance") > 0)
        .agg(F.avg("distance"))
        .first()
    )
    return float(row[0])


def sigma(
    g: SparkGraph, niter: int = 5, nrand: int = 3, seed: int = 42
) -> float:
    """Small-world coefficient ``(C/Cr)/(L/Lr)`` (``smallworld.py:216``);
    > 1 is commonly read as small-world. Deterministic per seed."""
    if g.directed:
        raise NotImplementedForDirected("sigma: not implemented for directed type")
    from linkgraph.algos.triangles import transitivity
    from linkgraph.algos.distance import average_shortest_path_length

    C = transitivity(g)
    L = average_shortest_path_length(g)
    crs, lrs = [], []
    for i in range(nrand):
        gr = random_reference(g, niter=niter, seed=seed + 977 * i)
        crs.append(transitivity(gr))
        lrs.append(_reachable_aspl(gr))
    cr = sum(crs) / len(crs)
    lr = sum(lrs) / len(lrs)
    return (C / cr) / (L / lr)
