"""Classic graph generators — the Spark twins of
``networkx/generators/classic.py`` and ``random_graphs.py``.

Every generator is pure DataFrame lineage over ``spark.range`` — no driver
edge list, so a billion-node path graph is as cheap to declare as a
ten-node one (rows materialize only when an action runs).

- deterministic families (``classic.py``: ``empty_graph:793``,
  ``path_graph:1030``, ``cycle_graph:693``, ``complete_graph:570``,
  ``star_graph:1091``) match the reference node/edge sets exactly
- ``gnp_random_graph`` (``random_graphs.py:437``) is seeded and
  deterministic but uses a HASH-based coin per pair (include (u,v) iff
  ``xxhash64(seed, u, v)`` maps below p) instead of the reference's
  sequential ``random.random()`` stream: the same distribution, evaluated
  embarrassingly parallel — a Mersenne-Twister call sequence cannot be
  replayed across partitions. Parity with nx is therefore statistical
  (edge-count CI, degree distribution), pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from linkgraph.graph import SparkGraph


def _vertices(spark: SparkSession, n: int):
    return spark.range(int(n)).select(F.col("id").cast("long"))


def empty_graph(spark: SparkSession, n: int = 0, *, directed: bool = False) -> SparkGraph:
    """``classic.py:793`` — n nodes, no edges."""
    e = spark.createDataFrame([], "src long, dst long, weight double")
    return SparkGraph(e, vertices=_vertices(spark, n), directed=directed,
                      coalesce_edges=False)


def path_graph(spark: SparkSession, n: int, *, directed: bool = False) -> SparkGraph:
    """``classic.py:1030`` — 0-1-2-...-(n-1)."""
    e = (
        spark.range(max(int(n) - 1, 0))
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    return SparkGraph(e, vertices=_vertices(spark, n), directed=directed,
                      coalesce_edges=False)


def cycle_graph(spark: SparkSession, n: int, *, directed: bool = False) -> SparkGraph:
    """``classic.py:693`` — the path plus the closing edge (n-1, 0)."""
    n = int(n)
    e = (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            F.pmod(F.col("id") + 1, F.lit(n)).cast("long").alias("dst"),
        )
        .withColumn("weight", F.lit(1.0))
    )
    # nx conventions: C1 = one node with a self-loop (pairwise cyclic);
    # undirected C2 collapses to the single edge 0-1
    if n == 2 and not directed:
        # undirected C2 collapses to a single edge 0-1
        e = e.filter(F.col("src") == 0)
    return SparkGraph(e, vertices=_vertices(spark, n), directed=directed,
                      coalesce_edges=False)


def complete_graph(spark: SparkSession, n: int, *, directed: bool = False) -> SparkGraph:
    """``classic.py:570`` — every distinct pair (both arcs when directed)."""
    a = spark.range(int(n)).select(F.col("id").alias("src"))
    b = spark.range(int(n)).select(F.col("id").alias("dst"))
    e = a.crossJoin(b)
    e = e.filter(
        F.col("src") != F.col("dst") if directed else F.col("src") < F.col("dst")
    ).withColumn("weight", F.lit(1.0))
    return SparkGraph(e, vertices=_vertices(spark, n), directed=directed,
                      coalesce_edges=False)


def star_graph(spark: SparkSession, n: int) -> SparkGraph:
    """``classic.py:1091`` — center 0 joined to nodes 1..n (n+1 nodes,
    matching the reference's convention)."""
    e = (
        spark.range(1, int(n) + 1)
        .select(F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    return SparkGraph(e, vertices=_vertices(spark, int(n) + 1), directed=False,
                      coalesce_edges=False)


def gnp_random_graph(
    spark: SparkSession, n: int, p: float, seed: int = 0, *, directed: bool = False
) -> SparkGraph:
    """``random_graphs.py:437`` G(n, p) — each pair independently present
    with probability p; hash-coin determinism (module docstring). The pair
    space is generated as a range cross-join and filtered BEFORE any wide
    operation, so the O(n²) candidate set is scanned, never shuffled."""
    n = int(n)
    a = spark.range(n).select(F.col("id").alias("src"))
    b = spark.range(n).select(F.col("id").alias("dst"))
    pairs = a.crossJoin(b).filter(
        F.col("src") != F.col("dst") if directed else F.col("src") < F.col("dst")
    )
    # uniform [0,1) coin from the pair hash: low 32 bits / 2^32
    coin = (
        F.pmod(F.xxhash64(F.lit(int(seed)), "src", "dst"), F.lit(2**32))
        / F.lit(float(2**32))
    )
    e = pairs.filter(coin < F.lit(float(p))).withColumn("weight", F.lit(1.0))
    return SparkGraph(e, vertices=_vertices(spark, n), directed=directed,
                      coalesce_edges=False)
