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


def grid_2d_graph(
    spark: SparkSession, m: int, n: int, *, periodic: bool = False
) -> SparkGraph:
    """``networkx/generators/lattice.py:46`` — the m×n lattice. The
    reference labels nodes (i, j); BIGINT ids encode ``id = i*n + j``.
    Pure range lineage: one ``spark.range(m*n)`` scan emits the right- and
    down-neighbor arcs, so a billion-cell lattice never touches the driver.
    ``periodic=True`` wraps both dimensions (torus)."""
    m, n = int(m), int(n)
    cells = spark.range(m * n).select(
        (F.col("id") / n).cast("long").alias("i"),
        F.pmod(F.col("id"), F.lit(n)).cast("long").alias("j"),
    )
    right = cells.filter(
        F.lit(periodic) | (F.col("j") < n - 1) if n > 1 else F.lit(False)
    ).select(
        (F.col("i") * n + F.col("j")).alias("src"),
        (F.col("i") * n + F.pmod(F.col("j") + 1, F.lit(n))).cast("long").alias("dst"),
    )
    down = cells.filter(
        F.lit(periodic) | (F.col("i") < m - 1) if m > 1 else F.lit(False)
    ).select(
        (F.col("i") * n + F.col("j")).alias("src"),
        (F.pmod(F.col("i") + 1, F.lit(m)) * n + F.col("j")).cast("long").alias("dst"),
    )
    # periodic wrap on a 1- or 2-long dimension creates duplicate/self
    # arcs: canonicalize + distinct here (summing weights would be wrong)
    e = (
        right.unionByName(down)
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return SparkGraph(
        e, vertices=_vertices(spark, m * n), directed=False, coalesce_edges=False
    )


def lollipop_graph(spark: SparkSession, m: int, n: int) -> SparkGraph:
    """``classic.py:688`` — K_m (nodes 0..m-1) plus an n-node path
    (m..m+n-1) bridged at (m-1, m)."""
    m, n = int(m), int(n)
    if m < 2:
        raise ValueError("invalid graph description, m should be >=2")
    a = spark.range(m).select(F.col("id").alias("src"))
    b = spark.range(m).select(F.col("id").alias("dst"))
    clique = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
    path = (
        spark.range(m - 1, m + n - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        if n > 0
        else spark.createDataFrame([], "src long, dst long")
    )
    e = clique.unionByName(path).withColumn("weight", F.lit(1.0))
    return SparkGraph(
        e, vertices=_vertices(spark, m + n), directed=False, coalesce_edges=False
    )


def barabasi_albert_graph(
    spark: SparkSession, n: int, m: int, seed: int = 0
) -> SparkGraph:
    """Preferential attachment (``random_graphs.py:661``) — the SURVEY's
    named hub-skew proxy — via the static sampling shortcut instead of the
    reference's sequential urn: node ``t`` draws its j-th target as
    ``⌊t·u²⌋`` with ``u = hash-uniform(seed, t, j)``. In the BA process the
    degree of node ``i`` at time ``t`` grows ~ ``m·√(t/i)``, so attaching
    to ``⌊t·u²⌋`` (density ∝ 1/√i) IS attachment proportional to expected
    degree — the standard parallel equivalent, embarrassingly parallel and
    deterministic per (seed, t, j), where the reference's Mersenne stream
    cannot be replayed across partitions. Duplicate (t, target) draws
    collapse (the reference also rejects repeats), so multiplicities m are
    approximate; every node t >= m keeps >= 1 arc to a lower id, so the
    graph stays connected. Parity with nx is statistical (power-law tail,
    hub skew), pinned in tests."""
    n, m = int(n), int(m)
    if m < 1 or m >= n:
        raise ValueError(
            f"Barabási–Albert network must have m >= 1 and m < n, m = {m}, n = {n}"
        )
    draws = (
        spark.range(m, n)
        .select(F.col("id").alias("t"))
        .crossJoin(spark.range(m).select(F.col("id").alias("j")))
    )
    u = (
        F.pmod(F.xxhash64(F.lit(int(seed)), "t", "j"), F.lit(2**32))
        / F.lit(float(2**32))
    )
    e = (
        draws.select(
            F.col("t").alias("src"),
            F.floor(F.col("t") * u * u).cast("long").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return SparkGraph(
        e, vertices=_vertices(spark, n), directed=False, coalesce_edges=False
    )


def watts_strogatz_graph(
    spark: SparkSession, n: int, k: int, p: float, seed: int = 0
) -> SparkGraph:
    """Small-world ring lattice with hash-driven rewiring
    (``networkx/generators/random_graphs.py:312`` semantics). Each node
    joins its ``k // 2`` nearest neighbors on each side; every lattice edge
    ``(u, u+j)`` rewires independently with probability ``p`` to a
    hash-uniform target (self-loops re-target to the ring neighbor;
    duplicate (u, w) draws collapse — the reference resamples sequentially,
    which cannot be replayed across partitions; the collapse loses O(p²·k)
    edges, the standard parallel trade also made by
    :func:`barabasi_albert_graph`). Deterministic per (seed, u, j):
    ``p = 0`` reproduces the reference's lattice exactly.
    """
    n, k = int(n), int(k)
    if k >= n:
        raise ValueError("k must be < n for a Watts–Strogatz graph")
    draws = (
        spark.range(n)
        .select(F.col("id").alias("u"))
        .crossJoin(
            spark.range(1, k // 2 + 1).select(F.col("id").alias("j"))
        )
    )
    h1 = F.pmod(F.xxhash64(F.lit(int(seed)), "u", "j"), F.lit(2**32)) / F.lit(
        float(2**32)
    )
    h2 = F.pmod(
        F.xxhash64(F.lit(int(seed) + 1), "u", "j"), F.lit(2**32)
    ) % F.lit(n)
    lattice_dst = (F.col("u") + F.col("j")) % F.lit(n)
    rewired = F.when(h1 < F.lit(float(p)), h2.cast("long")).otherwise(
        lattice_dst.cast("long")
    )
    e = (
        draws.select(
            F.col("u").alias("src"),
            F.when(rewired == F.col("u"), lattice_dst.cast("long"))
            .otherwise(rewired)
            .alias("dst"),
        )
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return SparkGraph(
        e, vertices=_vertices(spark, n), directed=False, coalesce_edges=False
    )


def house_graph(spark: SparkSession, *, with_x: bool = False) -> SparkGraph:
    """``networkx/generators/small.py`` ``house_graph`` — the 5-node house
    (square 0-1-3-2 plus roof apex 4); ``with_x=True`` adds the two square
    diagonals (``house_x_graph``). Fixed published fixture; tiny by
    definition, so a driver literal list is the right plan."""
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    if with_x:
        edges += [(0, 3), (1, 2)]
    e = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in sorted(edges)],
        "src long, dst long, weight double",
    )
    return SparkGraph(e, vertices=_vertices(spark, 5), directed=False,
                      coalesce_edges=False)


#: Zachary's karate club (W. W. Zachary, "An information flow model for
#: conflict and fission in small groups", J. Anthropol. Res. 33, 452-473,
#: 1977) — the published 78-edge dataset, node-for-node the reference's
#: ``networkx/generators/social.py:16`` fixture.
_KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
    (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21),
    (0, 31), (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21),
    (1, 30), (2, 3), (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28),
    (2, 32), (3, 7), (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10),
    (5, 16), (6, 16), (8, 30), (8, 32), (8, 33), (9, 33), (13, 33),
    (14, 32), (14, 33), (15, 32), (15, 33), (18, 32), (18, 33), (19, 33),
    (20, 32), (20, 33), (22, 32), (22, 33), (23, 25), (23, 27), (23, 29),
    (23, 32), (23, 33), (24, 25), (24, 27), (24, 31), (25, 31), (26, 29),
    (26, 33), (27, 33), (28, 31), (28, 33), (29, 32), (29, 33), (30, 32),
    (30, 33), (31, 32), (31, 33), (32, 33),
]

#: Mr. Hi's faction after the split (every other member sided with the
#: Officer) — the reference's ``club`` node attribute.
_KARATE_MR_HI = {0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 16, 17, 19, 21}


def karate_club_graph(spark: SparkSession) -> SparkGraph:
    """``networkx/generators/social.py:16`` — Zachary's karate club, the
    reference's canonical 34-node community fixture, with the ``club``
    vertex attribute column ('Mr. Hi' / 'Officer')."""
    e = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in _KARATE_EDGES],
        "src long, dst long, weight double",
    )
    v = spark.createDataFrame(
        [(i, "Mr. Hi" if i in _KARATE_MR_HI else "Officer") for i in range(34)],
        "id long, club string",
    )
    return SparkGraph(e, vertices=v, directed=False, coalesce_edges=False)


def powerlaw_cluster_graph(
    spark: SparkSession, n: int, m: int, p: float, seed: int = 0
) -> SparkGraph:
    """Holme–Kim powerlaw-with-clustering (``random_graphs.py:1008``):
    BA preferential attachment where each extra draw, with probability
    ``p``, closes a triangle with a neighbor of the previous draw's target
    instead of attaching preferentially.

    Distributed twin of the sequential urn, built on the same static-
    sampling shortcut as :func:`barabasi_albert_graph` (draw j of node t is
    ``⌊t·u²⌋``, density ∝ expected degree): because every BA target is a
    pure hash function of (seed, node, j), the triangle-closing neighbor
    needs NO join — draw j's triad partner is target(prev_target, j'') for
    a hash-chosen j'', computable in one expression. Each draw row is
    independent, so the whole graph is one ``spark.range`` scan; clustering
    rises with p exactly as in the reference (pinned statistically in
    tests). Seed nodes (< m) have no BA draws to close against, so their
    triad coins fall back to a preferential draw, like the reference's
    repeat-rejection fallback."""
    n, m = int(n), int(m)
    if m < 1 or m >= n:
        raise ValueError(f"NetworkXError must have m>1 and m<n, m={m},n={n}")
    if p > 1 or p < 0:
        raise ValueError(f"NetworkXError p must be in [0,1], p={p}")

    def _u(salt, *cols):
        return (
            F.pmod(F.xxhash64(F.lit(int(seed) + salt), *cols), F.lit(2**32))
            / F.lit(float(2**32))
        )

    draws = (
        spark.range(m, n)
        .select(F.col("id").alias("t"))
        .crossJoin(spark.range(m).select(F.col("id").alias("j")))
    )
    u = _u(0, "t", "j")
    pa_target = F.floor(F.col("t") * u * u).cast("long")
    # previous draw's PA target (j-1 for j>0; j=0 is always a pure PA draw)
    u_prev = _u(0, "t", (F.col("j") - 1).cast("long"))
    prev_target = F.floor(F.col("t") * u_prev * u_prev).cast("long")
    # triad partner: one of prev_target's own BA draws, j'' hash-uniform
    jj = F.pmod(F.xxhash64(F.lit(int(seed) + 1), "t", "j"), F.lit(m)).cast("long")
    u_nbr = _u(0, prev_target, jj)
    triad_target = F.floor(prev_target * u_nbr * u_nbr).cast("long")
    coin = _u(2, "t", "j")
    dst = F.when(
        (F.col("j") > 0) & (coin < F.lit(float(p))) & (prev_target >= F.lit(m)),
        triad_target,
    ).otherwise(pa_target)
    e = (
        draws.select(F.col("t").alias("src"), dst.alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return SparkGraph(
        e, vertices=_vertices(spark, n), directed=False, coalesce_edges=False
    )
