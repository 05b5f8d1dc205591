"""Named small graphs (``networkx/generators/small.py``) — structural
constructions, not copied adjacency tables.

Wherever the graph has an LCF notation (a Hamiltonian cubic graph), it is
built from :func:`LCF_graph` — cycle + chord shifts, pure ``spark.range``
expressions (the published LCF codes are standard mathematical facts).
Remaining fixtures use their structural definitions (platonic solids,
generalized Petersen, published sociograms). The reference's labelings
come from its hard-coded adjacency lists, so parity tests check
ISOMORPHISM (same graph, possibly different labels) plus exact node/edge
counts — except where the standard labeling is universal (bull, diamond,
kite) and exact equality holds.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.generators import (
    _vertices,
    complete_graph,
    complete_multipartite_graph,
    generalized_petersen_graph,
    hypercube_graph,
)

__all__ = [
    "LCF_graph",
    "petersen_graph",
    "bull_graph",
    "diamond_graph",
    "tetrahedral_graph",
    "octahedral_graph",
    "cubical_graph",
    "icosahedral_graph",
    "dodecahedral_graph",
    "desargues_graph",
    "heawood_graph",
    "moebius_kantor_graph",
    "pappus_graph",
    "frucht_graph",
    "truncated_tetrahedron_graph",
    "krackhardt_kite_graph",
    "sedgewick_maze_graph",
    "paley_graph",
]


def _edges_df(spark, pairs, n):
    e = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in sorted(set(map(tuple, map(sorted, pairs))))],
        "src long, dst long, weight double",
    )
    return SparkGraph(e, vertices=_vertices(spark, n), directed=False,
                      coalesce_edges=False)


def LCF_graph(spark: SparkSession, n: int, shift_list, repeats: int) -> SparkGraph:
    """``small.py`` ``LCF_graph`` — the cubic Hamiltonian graph with LCF
    notation [shifts]^repeats: an n-cycle plus, for node i, the chord to
    ``i + shift[i mod len(shifts)] (mod n)``. Cycle and chords are both
    expressions over ``spark.range`` — no driver edge list."""
    n = int(n)
    shifts = [int(s) for s in shift_list]
    if n == 0:
        return _edges_df(spark, [], 0)
    if len(shifts) * int(repeats) != n:
        raise ValueError("LCF_graph: len(shift_list) * repeats must equal n")
    cyc = spark.range(n).select(
        F.col("id").alias("src"),
        F.pmod(F.col("id") + 1, F.lit(n)).cast("long").alias("dst"),
    )
    shift_arr = F.array(*[F.lit(s) for s in shifts])
    chord = spark.range(n).select(
        F.col("id").alias("src"),
        F.pmod(
            F.col("id")
            + F.element_at(shift_arr, (F.pmod(F.col("id"), F.lit(len(shifts))) + 1).cast("int")),
            F.lit(n),
        )
        .cast("long")
        .alias("dst"),
    )
    e = (
        cyc.unionByName(chord)
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return SparkGraph(e, vertices=_vertices(spark, n), directed=False,
                      coalesce_edges=False)


def petersen_graph(spark: SparkSession) -> SparkGraph:
    """``small.py`` ``petersen_graph`` = GP(5, 2)."""
    return generalized_petersen_graph(spark, 5, 2)


def bull_graph(spark: SparkSession) -> SparkGraph:
    """Triangle (0,1,2) with horns 1-3 and 2-4."""
    return _edges_df(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)], 5)


def diamond_graph(spark: SparkSession) -> SparkGraph:
    """K4 minus one edge."""
    return _edges_df(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)], 4)


def tetrahedral_graph(spark: SparkSession) -> SparkGraph:
    """K4."""
    return complete_graph(spark, 4)


def octahedral_graph(spark: SparkSession) -> SparkGraph:
    """K_{2,2,2} — the complete tripartite octahedron."""
    return complete_multipartite_graph(spark, 2, 2, 2)


def cubical_graph(spark: SparkSession) -> SparkGraph:
    """Q_3."""
    return hypercube_graph(spark, 3)


def icosahedral_graph(spark: SparkSession) -> SparkGraph:
    """The icosahedron as a gyroelongated pentagonal bipyramid: pole 0
    over upper pentagon 1-5, pole 11 under lower pentagon 6-10, the
    antiprism band between them."""
    pairs = []
    up = [1, 2, 3, 4, 5]
    lo = [6, 7, 8, 9, 10]
    for i in range(5):
        pairs.append((0, up[i]))
        pairs.append((11, lo[i]))
        pairs.append((up[i], up[(i + 1) % 5]))
        pairs.append((lo[i], lo[(i + 1) % 5]))
        pairs.append((up[i], lo[i]))
        pairs.append((up[(i + 1) % 5], lo[i]))
    return _edges_df(spark, pairs, 12)


def dodecahedral_graph(spark: SparkSession) -> SparkGraph:
    """LCF [10, 7, 4, -4, -7, 10, -4, 7, -7, 4]^2 (the reference builds
    the same graph from this notation)."""
    return LCF_graph(spark, 20, [10, 7, 4, -4, -7, 10, -4, 7, -7, 4], 2)


def desargues_graph(spark: SparkSession) -> SparkGraph:
    """LCF [5, -5, 9, -9]^5."""
    return LCF_graph(spark, 20, [5, -5, 9, -9], 5)


def heawood_graph(spark: SparkSession) -> SparkGraph:
    """LCF [5, -5]^7."""
    return LCF_graph(spark, 14, [5, -5], 7)


def moebius_kantor_graph(spark: SparkSession) -> SparkGraph:
    """LCF [5, -5]^8 — GP(8, 3)."""
    return LCF_graph(spark, 16, [5, -5], 8)


def pappus_graph(spark: SparkSession) -> SparkGraph:
    """LCF [5, 7, -7, 7, -7, -5]^3."""
    return LCF_graph(spark, 18, [5, 7, -7, 7, -7, -5], 3)


def frucht_graph(spark: SparkSession) -> SparkGraph:
    """LCF [-5, -2, -4, 2, 5, -2, 2, 5, -2, -5, 4, 2] — the smallest cubic
    graph with trivial automorphism group."""
    return LCF_graph(
        spark, 12, [-5, -2, -4, 2, 5, -2, 2, 5, -2, -5, 4, 2], 1
    )


def truncated_tetrahedron_graph(spark: SparkSession) -> SparkGraph:
    """LCF [2, 6, -2]^4."""
    return LCF_graph(spark, 12, [2, 6, -2], 4)


def krackhardt_kite_graph(spark: SparkSession) -> SparkGraph:
    """Krackhardt's kite sociogram (Krackhardt 1990) — the standard
    10-node labeling the reference also uses."""
    pairs = [
        (0, 1), (0, 2), (0, 3), (0, 5), (1, 3), (1, 4), (1, 6),
        (2, 3), (2, 5), (3, 4), (3, 5), (3, 6), (4, 6), (5, 6),
        (5, 7), (6, 7), (7, 8), (8, 9),
    ]
    return _edges_df(spark, pairs, 10)


def sedgewick_maze_graph(spark: SparkSession) -> SparkGraph:
    """The small maze from Sedgewick, *Algorithms in C, Part 5* (the
    reference's fixture of the same name)."""
    pairs = [
        (0, 2), (0, 5), (0, 7), (1, 7), (2, 6),
        (3, 4), (3, 5), (4, 5), (4, 6), (4, 7),
    ]
    return _edges_df(spark, pairs, 8)


def paley_graph(spark: SparkSession, p: int) -> SparkGraph:
    """``expanders.py`` ``paley_graph`` — nodes Z_p, arcs x → x + r for
    every nonzero quadratic residue r mod p. The residue set (at most
    (p-1)/2 values) is computed once and unrolled into expressions; the
    edge table itself is range × residues, fully distributed. Like the
    reference, the result is the DIRECTED form (symmetric iff
    p ≡ 1 mod 4)."""
    p = int(p)
    residues = sorted({(x * x) % p for x in range(1, p)} - {0})
    res_arr = F.array(*[F.lit(r) for r in residues])
    e = (
        spark.range(p)
        .select(F.col("id").alias("src"), F.explode(res_arr).alias("r"))
        .select("src", F.pmod(F.col("src") + F.col("r"), F.lit(p)).cast("long").alias("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    return SparkGraph(e, vertices=_vertices(spark, p), directed=True,
                      coalesce_edges=False)
