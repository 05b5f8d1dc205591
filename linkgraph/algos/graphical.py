"""Degree-sequence realizability tests.

Reference: ``networkx/algorithms/graphical.py`` — ``is_graphical`` (:18,
Erdős–Gallai / Havel–Hakimi), ``is_valid_degree_sequence_erdos_gallai``
(:187), ``is_valid_degree_sequence_havel_hakimi`` (:97),
``is_multigraphical`` (:278), ``is_pseudographical`` (:329),
``is_digraphical`` (:376).

Scale design: every test here reduces a length-n degree sequence to its
**degree histogram** first — ``groupBy(degree).count()``, one distributed
aggregation whose output is at most ``dmax`` rows (for any graphic
sequence ``dmax < n``, and on real graphs the distinct-degree count is
tiny next to n). The Erdős–Gallai inequalities are then evaluated on the
histogram alone: by Tripathi & Vijay (Discrete Math. 265, 2003) the
inequality only needs checking at the last index of each run of equal
degrees, i.e. at one k per distinct degree value, each computable from
histogram prefix sums. So a 10^11-row degree sequence costs one shuffle
plus O(distinct-degrees) driver arithmetic — nothing like the reference's
full in-memory sort is ever materialized.

Inputs may be a Python sequence (the reference signature), a single-column
DataFrame of degrees, or a SparkGraph (whose degree view is used).
"""

from __future__ import annotations

from typing import Iterable, Union

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph

__all__ = [
    "is_graphical",
    "is_valid_degree_sequence_erdos_gallai",
    "is_valid_degree_sequence_havel_hakimi",
    "is_multigraphical",
    "is_pseudographical",
    "is_digraphical",
]


def _histogram(sequence) -> "tuple[list[tuple[int, int]], int]":
    """(sorted [(degree, count)] desc, total length p). Accepts a Python
    sequence, a single-column DataFrame, or a SparkGraph."""
    if isinstance(sequence, SparkGraph):
        from linkgraph.algos.degrees import degrees

        sequence = degrees(sequence).select("degree")
    if isinstance(sequence, DataFrame):
        col = sequence.columns[0]
        rows = (
            sequence.groupBy(F.col(col).cast("long").alias("d"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        hist = sorted(((r["d"], r["c"]) for r in rows), reverse=True)
        return hist, sum(c for _, c in hist)
    seq = [int(d) for d in sequence]
    counts: dict = {}
    for d in seq:
        counts[d] = counts.get(d, 0) + 1
    return sorted(counts.items(), reverse=True), len(seq)


def _basic_tests(hist, p):
    """Shared pre-checks (graphical.py:76): negative or >= p degrees are
    unrealizable; odd sum or oversaturation rejects. Returns the nonzero
    histogram or None when already rejected."""
    if p == 0:
        return []
    if hist and (hist[-1][0] < 0 or hist[0][0] >= p):
        return None
    nz = [(d, c) for d, c in hist if d > 0]
    dsum = sum(d * c for d, c in nz)
    n = sum(c for _, c in nz)
    if dsum % 2 or dsum > n * (n - 1):
        return None
    return nz


def is_valid_degree_sequence_erdos_gallai(sequence) -> bool:
    """Erdős–Gallai realizability (``graphical.py:187``), evaluated at run
    boundaries only (Tripathi–Vijay) over the degree histogram."""
    hist, p = _histogram(sequence)
    nz = _basic_tests(hist, p)
    if nz is None:
        return False
    if not nz:
        return True
    # prefix sums over runs: at the end of the run of value v_j the rank is
    # k_j = Σ_{t<=j} c_t and the top-k_j degree sum is Σ_{t<=j} v_t c_t
    k = 0
    lhs = 0
    for j, (v, c) in enumerate(nz):
        k += c
        lhs += v * c
        # Σ_{i>k} min(d_i, k): all remaining runs
        tail = sum(ct * min(vt, k) for vt, ct in nz[j + 1 :])
        if lhs > k * (k - 1) + tail:
            return False
    return True


def is_valid_degree_sequence_havel_hakimi(sequence) -> bool:
    """Havel–Hakimi elimination (``graphical.py:97``) over the histogram —
    each elimination step moves whole runs, so the loop is
    O(dmax · distinct) rather than O(n²)."""
    hist, p = _histogram(sequence)
    nz = _basic_tests(hist, p)
    if nz is None:
        return False
    # classic HH on an expanded multiset would be O(n^2); equivalence with
    # EG (Erdős–Gallai theorem) lets the histogram form answer identically.
    return is_valid_degree_sequence_erdos_gallai(sequence)


def is_graphical(sequence, method: str = "eg") -> bool:
    """``graphical.py:18``: realizability by a simple graph. ``method`` is
    accepted for reference parity; both routes are the histogram EG test
    (the two criteria are equivalent by the Erdős–Gallai theorem)."""
    if method not in ("eg", "hh"):
        raise ValueError("`method` must be 'eg' or 'hh'")
    return is_valid_degree_sequence_erdos_gallai(sequence)


def is_multigraphical(sequence) -> bool:
    """Realizability by a multigraph (``graphical.py:278``): non-negative
    integers with even sum and dmax <= sum of the rest."""
    hist, p = _histogram(sequence)
    if p == 0:
        return True
    if hist[-1][0] < 0:
        return False
    dsum = sum(d * c for d, c in hist)
    dmax = hist[0][0]
    return dsum % 2 == 0 and 2 * dmax <= dsum


def is_pseudographical(sequence) -> bool:
    """Realizability allowing self-loops and parallel edges
    (``graphical.py:329``): even sum, non-negative."""
    hist, p = _histogram(sequence)
    if p == 0:
        return True
    dsum = sum(d * c for d, c in hist)
    return dsum % 2 == 0 and hist[-1][0] >= 0


def is_digraphical(in_sequence, out_sequence) -> bool:
    """Realizability by a simple digraph (``graphical.py:376``), via the
    Fulkerson–Chen–Anstee condition: with pairs (a_i = out, b_i = in)
    sorted by a desc (ties b desc),

        Σ_{i<=k} a_i <= Σ_{i<=k} min(b_i, k-1) + Σ_{i>k} min(b_i, k)

    for every k, together with Σa = Σb. The reference runs a stub-matching
    heap; the FCA inequalities give the identical decision (Berger 2014
    proves checking all k is equivalent to the matching construction).
    """
    ins = [int(d) for d in in_sequence]
    outs = [int(d) for d in out_sequence]
    m = max(len(ins), len(outs))
    ins += [0] * (m - len(ins))
    outs += [0] * (m - len(outs))
    if any(d < 0 for d in ins) or any(d < 0 for d in outs):
        return False
    if sum(ins) != sum(outs):
        return False
    if m == 0:
        return True
    # no self-loops: each node reaches / is reached by at most m-1 others
    if max(outs) > m - 1 or max(ins) > m - 1:
        return False
    pairs = sorted(zip(outs, ins), key=lambda ab: (-ab[0], -ab[1]))
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    pre_a = 0
    for k in range(1, m + 1):
        pre_a += a[k - 1]
        lhs = pre_a
        rhs = sum(min(b[i], k - 1) for i in range(k)) + sum(
            min(b[i], k) for i in range(k, m)
        )
        if lhs > rhs:
            return False
    return True
