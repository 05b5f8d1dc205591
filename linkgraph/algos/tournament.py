"""Tournament recognition and scores.

Reference: ``networkx/algorithms/tournament.py:38`` ``is_tournament``,
``:84`` ``score_sequence``. A tournament has exactly one arc per unordered
node pair, no self-loops. The pairwise ``(v in G[u]) ^ (u in G[v])`` scan
becomes three aggregates: zero self-loops, zero reciprocal pairs (one
self-join probe), and distinct-arc count = C(n, 2).

``hamiltonian_path``/``is_reachable`` stay out of scope (sequential
insertion / recursive condensation walks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.exceptions import NotImplementedForDirected
from linkgraph.graph import SparkGraph

__all__ = ["is_tournament", "score_sequence"]


def _require_digraph(g: SparkGraph, name: str) -> None:
    if not g.directed:
        raise NotImplementedForDirected(f"{name}: not implemented for undirected type")


def is_tournament(g: SparkGraph) -> bool:
    """True iff exactly one directed edge joins each pair of distinct nodes
    (``tournament.py:38``)."""
    _require_digraph(g, "is_tournament")
    arcs = g.edges.select("src", "dst").distinct().persist()
    try:
        if arcs.filter(F.col("src") == F.col("dst")).limit(1).count():
            return False
        n = g.number_of_nodes()
        if arcs.count() != n * (n - 1) // 2:
            return False
        recip = arcs.join(
            arcs.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            ["src", "dst"],
            "left_semi",
        )
        return recip.limit(1).count() == 0
    finally:
        arcs.unpersist()


def score_sequence(g: SparkGraph) -> DataFrame:
    """(score): the out-degrees of the tournament, ascending
    (``tournament.py:84``)."""
    _require_digraph(g, "score_sequence")
    from linkgraph.algos.degrees import out_degrees

    return out_degrees(g).select(F.col("degree").alias("score")).orderBy("score")
