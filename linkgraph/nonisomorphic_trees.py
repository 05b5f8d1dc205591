"""Enumeration of nonisomorphic free trees.

Reference: ``networkx/generators/nonisomorphic_trees.py`` —
``nonisomorphic_trees`` (one graph per isomorphism class, via the
Beyer-Hedetniemi rooted-level-sequence successor restricted by the
Wright-Richmond-Odlyzko-McKay free-tree canonicity test) and
``number_of_nonisomorphic_trees`` (OEIS A000055).

The enumeration itself is an O(1)-amortized integer-sequence successor —
pure driver math; each emitted tree is a distributed SparkGraph. For a
bulk workload, enumerate the level sequences (cheap) and parallelize the
per-tree analysis over a DataFrame of sequences instead.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import SparkSession

from linkgraph.graph import SparkGraph

__all__ = ["nonisomorphic_trees", "number_of_nonisomorphic_trees"]


@lru_cache(None)
def _rooted_count(n: int) -> int:
    """OEIS A000081 — unlabeled rooted trees."""
    if n < 2:
        return n
    total = 0
    for j in range(1, n):
        for d in range(1, n):
            if j % d == 0:
                total += d * _rooted_count(d) * _rooted_count(n - j)
    return total // (n - 1)


def _free_count(n: int) -> int:
    """OEIS A000055 via Otter's relation between free and rooted trees."""
    paired = sum(_rooted_count(k) * _rooted_count(n - k) for k in range(n + 1))
    if n % 2 == 0:
        paired -= _rooted_count(n // 2)
    return _rooted_count(n) - paired // 2


def number_of_nonisomorphic_trees(order: int) -> int:
    """``nonisomorphic_trees.py:81`` — count of isomorphism classes of
    free trees on ``order`` nodes."""
    if order < 0:
        raise ValueError("order must be non-negative")
    return _free_count(order)


def _succ_rooted(seq, p=None):
    """Beyer-Hedetniemi successor of a rooted-tree level sequence in
    reverse lexicographic order (None when exhausted)."""
    if p is None:
        p = len(seq) - 1
        while seq[p] == 1:
            p -= 1
    if p == 0:
        return None
    q = p - 1
    while seq[q] != seq[p] - 1:
        q -= 1
    out = list(seq)
    for i in range(p, len(out)):
        out[i] = out[i - p + q]
    return out


def _split(seq):
    """(left subtree of the root, remainder) as level sequences."""
    second_one = None
    seen_one = False
    for i, lvl in enumerate(seq):
        if lvl == 1:
            if seen_one:
                second_one = i
                break
            seen_one = True
    m = second_one if second_one is not None else len(seq)
    left = [seq[i] - 1 for i in range(1, m)]
    rest = [0] + [seq[i] for i in range(m, len(seq))]
    return left, rest


def _canonical_or_skip(seq):
    """WROM canonicity filter: return ``seq`` when it encodes the
    canonical rooted representation of its free tree, else jump to the
    next candidate."""
    left, rest = _split(seq)
    lh, rh = max(left), max(rest)
    ok = rh >= lh
    if ok and rh == lh:
        if len(left) > len(rest) or (len(left) == len(rest) and left > rest):
            ok = False
    if ok:
        return seq
    p = len(left)
    nxt = _succ_rooted(seq, p)
    if seq[p] > 2:
        new_left, _ = _split(nxt)
        suffix = list(range(1, max(new_left) + 2))
        nxt[-len(suffix):] = suffix
    return nxt


def _seq_edges(seq):
    """Edges of the tree a level sequence encodes (parent = nearest
    earlier node one level up)."""
    edges = []
    stack = []
    for i, lvl in enumerate(seq):
        while stack and seq[stack[-1]] >= lvl:
            stack.pop()
        if stack:
            edges.append((stack[-1], i))
        stack.append(i)
    return edges


def nonisomorphic_trees(spark: SparkSession, order: int):
    """``nonisomorphic_trees.py:18`` — yield one SparkGraph per
    isomorphism class of free trees on ``order`` nodes."""
    if order < 0:
        raise ValueError("order must be non-negative")
    if order == 0:
        return
    if order == 1:
        e = spark.createDataFrame([], "src long, dst long, weight double")
        v = spark.createDataFrame([(0,)], "id long")
        yield SparkGraph(e, v, directed=False, coalesce_edges=False)
        return
    seq = list(range(order // 2 + 1)) + list(range(1, (order + 1) // 2))
    while seq is not None:
        seq = _canonical_or_skip(seq)
        if seq is not None:
            edges = _seq_edges(seq)
            e = spark.createDataFrame(
                [(min(u, v), max(u, v), 1.0) for u, v in edges],
                "src long, dst long, weight double",
            )
            v_df = spark.createDataFrame([(i,) for i in range(order)], "id long")
            yield SparkGraph(e, v_df, directed=False, coalesce_edges=False)
            seq = _succ_rooted(seq)
