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

from linkgraph.exceptions import NetworkXError
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
    spark: SparkSession, n: int, m: int, seed: int = 0,
    initial_graph: "SparkGraph | None" = None,
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
    start = m
    seed_edges = None
    if initial_graph is not None:
        # the reference's initial_graph kwarg: growth starts from the given
        # graph's node count with its edges kept; it must have >= m nodes
        # (random_graphs.py ``barabasi_albert_graph`` contract). Same
        # statistical-parity caveat as the base generator.
        n0 = initial_graph.number_of_nodes()
        if n0 < m or n0 > n:
            raise ValueError(
                f"Barabási–Albert initial graph needs between m={m} and "
                f"n={n} nodes"
            )
        start = n0
        seed_edges = initial_graph.edges.select(
            "src", "dst", F.lit(1.0).alias("weight")
        )
    draws = (
        spark.range(start, n)
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
    if seed_edges is not None:
        e = seed_edges.unionByName(e)
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


def house_x_graph(spark: SparkSession) -> SparkGraph:
    """``small.py`` ``house_x_graph`` — the house with both square
    diagonals (alias for ``house_graph(with_x=True)``)."""
    return house_graph(spark, with_x=True)


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


# --------------------------------------------------------------------- #
# classic closed-form generators (round-4 second continuation)
# --------------------------------------------------------------------- #


def wheel_graph(spark: SparkSession, n: int) -> SparkGraph:
    """``classic.py`` ``wheel_graph`` — hub 0 + cycle on 1..n-1 (n nodes;
    the 2-node rim collapses to one edge, like the reference's C2)."""
    n = int(n)
    rim = n - 1
    spokes = (
        spark.range(1, n)
        .select(F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
    )
    if rim >= 3:
        ring = spark.range(1, n).select(
            F.col("id").alias("src"),
            (F.pmod(F.col("id"), F.lit(rim)) + 1).cast("long").alias("dst"),
        )
        e = spokes.unionByName(ring)
    elif rim == 2:
        e = spokes.unionByName(
            spark.createDataFrame([(1, 2)], "src long, dst long")
        )
    else:
        e = spokes
    return SparkGraph(e, vertices=_vertices(spark, n), directed=False,
                      coalesce_edges=True)


def ladder_graph(spark: SparkSession, n: int) -> SparkGraph:
    """``classic.py`` ``ladder_graph`` — two n-paths (0..n-1, n..2n-1)
    plus the n rungs."""
    n = int(n)
    rail = spark.range(max(n - 1, 0)).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    rail2 = rail.select(
        (F.col("src") + n).alias("src"), (F.col("dst") + n).alias("dst")
    )
    rungs = spark.range(n).select(
        F.col("id").alias("src"), (F.col("id") + n).alias("dst")
    )
    e = rail.unionByName(rail2).unionByName(rungs)
    return SparkGraph(e, vertices=_vertices(spark, 2 * n), directed=False,
                      coalesce_edges=False)


def circular_ladder_graph(spark: SparkSession, n: int) -> SparkGraph:
    """``classic.py`` ``circular_ladder_graph`` — the ladder plus the two
    closing rail edges."""
    n = int(n)
    g = ladder_graph(spark, n)
    if n < 3:
        return g
    closing = spark.createDataFrame(
        [(0, n - 1), (n, 2 * n - 1)], "src long, dst long"
    )
    return SparkGraph(
        g.edges.select("src", "dst").unionByName(closing),
        vertices=_vertices(spark, 2 * n),
        directed=False,
        coalesce_edges=False,
    )


def barbell_graph(spark: SparkSession, m1: int, m2: int) -> SparkGraph:
    """``classic.py`` ``barbell_graph`` — K_m1 + m2-path bridge + K_m1."""
    m1, m2 = int(m1), int(m2)
    if m1 < 2:
        raise ValueError("Invalid graph description, m1 should be >=2")
    if m2 < 0:
        raise ValueError("Invalid graph description, m2 should be >=0")
    a = spark.range(m1).select(F.col("id").alias("src"))
    b = spark.range(m1).select(F.col("id").alias("dst"))
    left = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
    right = left.select(
        (F.col("src") + m1 + m2).alias("src"), (F.col("dst") + m1 + m2).alias("dst")
    )
    # path m1-1, m1, ..., m1+m2 (connects the two bells through the bridge)
    bridge = spark.range(m1 - 1, m1 + m2).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    e = left.unionByName(right).unionByName(bridge)
    return SparkGraph(e, vertices=_vertices(spark, 2 * m1 + m2), directed=False,
                      coalesce_edges=True)


def full_rary_tree(spark: SparkSession, r: int, n: int) -> SparkGraph:
    """``classic.py`` ``full_rary_tree`` — node i>0 hangs off parent
    (i-1)//r; one range scan, zero joins."""
    r, n = int(r), int(n)
    e = spark.range(1, n).select(
        F.floor((F.col("id") - 1) / r).cast("long").alias("src"),
        F.col("id").alias("dst"),
    )
    return SparkGraph(e, vertices=_vertices(spark, n), directed=False,
                      coalesce_edges=False)


def balanced_tree(spark: SparkSession, r: int, h: int) -> SparkGraph:
    """``classic.py`` ``balanced_tree`` — the full r-ary tree with
    (r^{h+1}-1)/(r-1) nodes (h+1 for r=1)."""
    r, h = int(r), int(h)
    n = h + 1 if r == 1 else (r ** (h + 1) - 1) // (r - 1)
    return full_rary_tree(spark, r, n)


def binomial_tree(spark: SparkSession, n: int) -> SparkGraph:
    """``classic.py`` ``binomial_tree`` — B_n on 2^n nodes. The recursive
    two-copy construction collapses to the closed form
    ``parent(i) = i & (i-1)`` (clear the lowest set bit): one range scan,
    zero joins, any scale."""
    n = int(n)
    size = 2 ** n
    e = spark.range(1, size).select(
        F.col("id").bitwiseAND(F.col("id") - 1).cast("long").alias("src"),
        F.col("id").alias("dst"),
    )
    return SparkGraph(e, vertices=_vertices(spark, size), directed=False,
                      coalesce_edges=False)


def complete_multipartite_graph(spark: SparkSession, *sizes: int) -> SparkGraph:
    """``classic.py`` ``complete_multipartite_graph`` — consecutive blocks
    of the given sizes; u ~ v iff different blocks. Vertices carry the
    block index as the ``subset`` attribute column (the reference's
    ``subset`` node attribute)."""
    sizes = [int(s) for s in sizes]
    total = sum(sizes)
    bounds = []
    acc = 0
    for bi, s in enumerate(sizes):
        bounds.append((acc, acc + s, bi))
        acc += s
    block = F.lit(None).cast("long")
    expr = None
    for lo, hi, bi in bounds:
        cond = (F.col("id") >= lo) & (F.col("id") < hi)
        expr = F.when(cond, bi) if expr is None else expr.when(cond, bi)
    verts = spark.range(total).select(
        F.col("id"), expr.cast("long").alias("subset")
    )
    a = verts.select(F.col("id").alias("src"), F.col("subset").alias("bs"))
    b = verts.select(F.col("id").alias("dst"), F.col("subset").alias("bd"))
    e = (
        a.crossJoin(b)
        .filter((F.col("src") < F.col("dst")) & (F.col("bs") != F.col("bd")))
        .select("src", "dst")
    )
    return SparkGraph(e, vertices=verts, directed=False, coalesce_edges=False)


def turan_graph(spark: SparkSession, n: int, r: int) -> SparkGraph:
    """``classic.py`` ``turan_graph`` — the complete multipartite graph
    with n % r parts of size ceil(n/r) and the rest floor(n/r)."""
    n, r = int(n), int(r)
    if not 1 <= r <= n:
        raise ValueError("Must satisfy 1 <= r <= n")
    big = n % r
    # the reference puts the floor-sized parts first, ceil-sized last
    sizes = [n // r] * (r - big) + [n // r + 1] * big
    return complete_multipartite_graph(spark, *sizes)


def circulant_graph(spark: SparkSession, n: int, offsets) -> SparkGraph:
    """``classic.py`` ``circulant_graph`` — i ~ i±d (mod n) for each
    offset d; one range scan per offset."""
    n = int(n)
    parts = []
    for d in offsets:
        parts.append(
            spark.range(n).select(
                F.col("id").alias("src"),
                F.pmod(F.col("id") + int(d), F.lit(n)).cast("long").alias("dst"),
            )
        )
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    return SparkGraph(e, vertices=_vertices(spark, n), directed=False,
                      coalesce_edges=True)


def caveman_graph(spark: SparkSession, l: int, k: int) -> SparkGraph:
    """``community.py:24`` ``caveman_graph`` — l disjoint K_k cliques
    (clique i on i*k..(i+1)*k-1)."""
    l, k = int(l), int(k)
    ids = spark.range(l * k)
    a = ids.select(F.col("id").alias("src"))
    b = ids.select(F.col("id").alias("dst"))
    e = (
        a.crossJoin(b)
        .filter(
            (F.col("src") < F.col("dst"))
            & (F.floor(F.col("src") / k) == F.floor(F.col("dst") / k))
        )
    )
    return SparkGraph(e, vertices=_vertices(spark, l * k), directed=False,
                      coalesce_edges=False)


def connected_caveman_graph(spark: SparkSession, l: int, k: int) -> SparkGraph:
    """``community.py:71`` — each clique's (start, start+1) edge rewired to
    (start, start-1 mod lk), linking the caves into a ring."""
    l, k = int(l), int(k)
    if k < 2:
        raise ValueError(
            "The size of cliques in a connected caveman graph must be at least 2."
        )
    base = caveman_graph(spark, l, k)
    starts = spark.range(l).select((F.col("id") * k).alias("start"))
    removed = starts.select(
        F.col("start").alias("src"), (F.col("start") + 1).alias("dst")
    )
    added = starts.select(
        F.least(F.col("start"), F.pmod(F.col("start") - 1, F.lit(l * k))).alias("src"),
        F.greatest(
            F.col("start"), F.pmod(F.col("start") - 1, F.lit(l * k))
        ).alias("dst"),
    )
    e = (
        base.edges.select("src", "dst")
        .join(removed, ["src", "dst"], "left_anti")
        .unionByName(added.select(F.col("src").cast("long"), F.col("dst").cast("long")))
    )
    return SparkGraph(e, vertices=_vertices(spark, l * k), directed=False,
                      coalesce_edges=True)


def ring_of_cliques(spark: SparkSession, num_cliques: int, clique_size: int) -> SparkGraph:
    """``community.py:389`` — cliques plus the ring edge
    (i*k+1, (i+1)*k mod num*k) per clique i."""
    num, k = int(num_cliques), int(clique_size)
    if num < 2:
        raise ValueError("A ring of cliques must have at least two cliques")
    if k < 2:
        raise ValueError("The cliques must have at least two nodes")
    base = caveman_graph(spark, num, k)
    ring = spark.range(num).select(
        (F.col("id") * k + 1).cast("long").alias("src"),
        F.pmod((F.col("id") + 1) * k, F.lit(num * k)).cast("long").alias("dst"),
    )
    e = base.edges.select("src", "dst").unionByName(ring)
    return SparkGraph(e, vertices=_vertices(spark, num * k), directed=False,
                      coalesce_edges=True)


def windmill_graph(spark: SparkSession, n: int, k: int) -> SparkGraph:
    """``community.py:445`` — K_k plus n-1 copies of K_{k-1}, every copy
    node also joined to node 0."""
    n, k = int(n), int(k)
    if n < 2:
        raise ValueError("A windmill graph must have at least two cliques")
    if k < 2:
        raise ValueError("The cliques must have at least two nodes")
    total = k + (n - 1) * (k - 1)
    ids = spark.range(total)
    # blade index: 0 for the first K_k, then 1.. for each K_{k-1} copy
    blade = F.when(F.col("id") < k, F.lit(0)).otherwise(
        F.floor((F.col("id") - k) / (k - 1)) + 1
    )
    a = ids.select(F.col("id").alias("src"), blade.alias("ba"))
    b = ids.select(F.col("id").alias("dst"), blade.alias("bb"))
    intra = (
        a.crossJoin(b)
        .filter((F.col("src") < F.col("dst")) & (F.col("ba") == F.col("bb")))
        .select("src", "dst")
    )
    hub = spark.range(k, total).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    e = intra.unionByName(hub)
    return SparkGraph(e, vertices=_vertices(spark, total), directed=False,
                      coalesce_edges=True)


def mycielskian(g: SparkGraph, iterations: int = 1) -> SparkGraph:
    """``generators/mycielski.py`` ``mycielskian`` — the Mycielski
    construction: relabeled original u -> u, shadow u -> n+u, apex 2n;
    edges = original + {(n+u, v), (n+v, u) per edge} + {(n+u, 2n)}. Pure
    column arithmetic + one union per iteration."""
    if g.directed:
        raise ValueError("mycielskian is defined on undirected graphs")
    out = g
    for _ in range(int(iterations)):
        from linkgraph.graph import convert_node_labels_to_integers

        out, _ = convert_node_labels_to_integers(out)
        n = out.number_of_nodes()
        e = out.edges.select("src", "dst")
        shadow = e.select((F.col("src") + n).alias("src"), F.col("dst")).unionByName(
            e.select((F.col("dst") + n).alias("src"), F.col("src").alias("dst"))
        )
        apex = (
            out.spark.range(n, 2 * n)
            .select(F.col("id").alias("src"), F.lit(2 * n).cast("long").alias("dst"))
        )
        verts = out.spark.range(2 * n + 1).select("id")
        out = SparkGraph(
            e.unionByName(shadow).unionByName(apex),
            verts,
            directed=False,
            coalesce_edges=False,
        )
    return out


def mycielski_graph(spark: SparkSession, n: int) -> SparkGraph:
    """``mycielski.py`` ``mycielski_graph`` — M_1 = K_1, M_2 = K_2,
    M_n = mycielskian(M_{n-1})."""
    n = int(n)
    if n < 1:
        raise ValueError("must satisfy n >= 1")
    if n == 1:
        return empty_graph(spark, 1)
    g = path_graph(spark, 2)
    return mycielskian(g, n - 2)


def expected_degree_graph(
    spark: SparkSession, w, seed: int = 0, *, selfloops: bool = True
) -> SparkGraph:
    """Chung–Lu random graph (``random_graphs.py`` ``expected_degree_graph``):
    edge (i, j) appears with probability min(w_i w_j / Σw, 1), decided by a
    deterministic per-pair hash coin (same seed → same graph).

    Scale note: the candidate pair join is O(n²) rows here; the reference's
    sorted-skip trick is sequential. At web scale use per-node Poisson
    target sampling (multi-round) — this generator exists for fixtures, so
    the direct pair-coin form is the honest choice.
    """
    rows = [(i, float(x)) for i, x in enumerate(w)]
    wdf = spark.createDataFrame(rows, "id long, w double")
    s = sum(x for _, x in rows)
    if s == 0:
        return SparkGraph(
            spark.createDataFrame([], "src long, dst long"),
            wdf.select("id"),
            directed=False,
            coalesce_edges=False,
        )
    a = wdf.select(F.col("id").alias("src"), F.col("w").alias("wa"))
    b = wdf.select(F.col("id").alias("dst"), F.col("w").alias("wb"))
    cmp = F.col("src") <= F.col("dst") if selfloops else F.col("src") < F.col("dst")
    pairs = a.crossJoin(b).filter(cmp)
    p = F.least(F.col("wa") * F.col("wb") / F.lit(float(s)), F.lit(1.0))
    # self-loop probability halves, as in the reference's Chung-Lu form
    p = F.when(F.col("src") == F.col("dst"), p / 2.0).otherwise(p)
    coin = (
        F.pmod(F.xxhash64("src", "dst", F.lit(int(seed))), F.lit(1_000_000_007))
        / 1_000_000_007.0
    )
    e = pairs.filter(coin < p).select("src", "dst")
    return SparkGraph(e, wdf.select("id"), directed=False, coalesce_edges=False)


def stochastic_block_model(
    spark: SparkSession,
    sizes,
    p,
    seed: int = 0,
    *,
    directed: bool = False,
    selfloops: bool = False,
) -> SparkGraph:
    """``community.py`` ``stochastic_block_model`` — blocks of the given
    sizes, edge (u, v) with probability p[block(u)][block(v)], hash-coin
    deterministic per seed. Vertices carry the ``block`` column."""
    sizes = [int(s) for s in sizes]
    r = len(sizes)
    for row in p:
        if len(row) != r:
            raise ValueError("'sizes' and 'p' do not match.")
        for x in row:
            if not 0 <= x <= 1:
                raise ValueError("Entries of 'p' not in [0,1].")
    total = sum(sizes)
    bounds = []
    acc = 0
    for bi, s in enumerate(sizes):
        bounds.append((acc, acc + s, bi))
        acc += s
    expr = None
    for lo, hi, bi in bounds:
        cond = (F.col("id") >= lo) & (F.col("id") < hi)
        expr = F.when(cond, bi) if expr is None else expr.when(cond, bi)
    verts = spark.range(total).select(F.col("id"), expr.cast("long").alias("block"))
    prob_rows = [
        (bi, bj, float(p[bi][bj])) for bi in range(r) for bj in range(r)
    ]
    pdf = spark.createDataFrame(prob_rows, "bi long, bj long, pv double")
    a = verts.select(F.col("id").alias("src"), F.col("block").alias("bi"))
    b = verts.select(F.col("id").alias("dst"), F.col("block").alias("bj"))
    if directed:
        cmp = (
            F.lit(True) if selfloops else (F.col("src") != F.col("dst"))
        )
    else:
        cmp = (
            F.col("src") <= F.col("dst") if selfloops else F.col("src") < F.col("dst")
        )
    pairs = a.crossJoin(b).filter(cmp).join(F.broadcast(pdf), ["bi", "bj"])
    coin = (
        F.pmod(F.xxhash64("src", "dst", F.lit(int(seed))), F.lit(1_000_000_007))
        / 1_000_000_007.0
    )
    e = pairs.filter(coin < F.col("pv")).select("src", "dst")
    return SparkGraph(e, verts, directed=directed, coalesce_edges=False)


def planted_partition_graph(
    spark: SparkSession,
    l: int,
    k: int,
    p_in: float,
    p_out: float,
    seed: int = 0,
    *,
    directed: bool = False,
) -> SparkGraph:
    """``community.py`` ``planted_partition_graph`` — the SBM special case
    of l equal groups of size k with within/between probabilities."""
    l, k = int(l), int(k)
    probs = [[p_in if i == j else p_out for j in range(l)] for i in range(l)]
    return stochastic_block_model(
        spark, [k] * l, probs, seed=seed, directed=directed
    )


def gnm_random_graph(
    spark: SparkSession, n: int, m: int, seed: int = 0, *, directed: bool = False
) -> SparkGraph:
    """``random_graphs.py`` ``gnm_random_graph`` — exactly m edges sampled
    uniformly without replacement: rank all candidate pairs by a hash and
    keep the m smallest (one distributed top-m, deterministic per seed)."""
    n, m = int(n), int(m)
    a = spark.range(n).select(F.col("id").alias("src"))
    b = spark.range(n).select(F.col("id").alias("dst"))
    cmp = F.col("src") != F.col("dst") if directed else F.col("src") < F.col("dst")
    pairs = a.crossJoin(b).filter(cmp)
    e = (
        pairs.withColumn("h", F.xxhash64("src", "dst", F.lit(int(seed))))
        .orderBy("h")
        .limit(m)
        .select("src", "dst")
    )
    return SparkGraph(e, vertices=_vertices(spark, n), directed=directed,
                      coalesce_edges=False)


# --------------------------------------------------------------------- #
# round-4 continuation: classic tail
# --------------------------------------------------------------------- #


def null_graph(spark: SparkSession) -> SparkGraph:
    """``classic.py`` ``null_graph`` — 0 nodes."""
    return empty_graph(spark, 0)


def trivial_graph(spark: SparkSession) -> SparkGraph:
    """``classic.py`` ``trivial_graph`` — 1 node, 0 edges."""
    return empty_graph(spark, 1)


def tadpole_graph(spark: SparkSession, m: int, n: int) -> SparkGraph:
    """``classic.py`` ``tadpole_graph`` — an m-cycle (m >= 3) with an
    n-path tail attached at node 0."""
    m, n = int(m), int(n)
    if m < 3:
        raise ValueError("tadpole_graph: cycle size m must be >= 3")
    cyc = spark.range(m).select(
        F.col("id").alias("src"),
        F.pmod(F.col("id") + 1, F.lit(m)).cast("long").alias("dst"),
    )
    tail = spark.range(n).select(
        F.when(F.col("id") == 0, F.lit(0))
        .otherwise(F.col("id") + m - 1)
        .cast("long")
        .alias("src"),
        (F.col("id") + m).cast("long").alias("dst"),
    )
    e = cyc.unionByName(tail).withColumn("weight", F.lit(1.0))
    return SparkGraph(e, vertices=_vertices(spark, m + n), directed=False,
                      coalesce_edges=False)


def complete_bipartite_graph(spark: SparkSession, n1: int, n2: int) -> SparkGraph:
    """``classic.py`` ``complete_bipartite_graph`` — K_{n1,n2}; left part
    is 0..n1-1, right part n1..n1+n2-1 (the reference's labeling). One
    crossJoin, no driver list."""
    n1, n2 = int(n1), int(n2)
    a = spark.range(n1).select(F.col("id").alias("src"))
    b = spark.range(n2).select((F.col("id") + n1).alias("dst"))
    e = a.crossJoin(b).withColumn("weight", F.lit(1.0))
    return SparkGraph(e, vertices=_vertices(spark, n1 + n2), directed=False,
                      coalesce_edges=False)


def hypercube_graph(spark: SparkSession, n: int) -> SparkGraph:
    """``lattice.py`` ``hypercube_graph`` — Q_n on integer labels
    0..2^n - 1 (the reference uses bit-tuples; ``id``'s binary digits are
    that tuple). Edges = one bit flip: range × bit-positions explode,
    fully distributed."""
    n = int(n)
    size = 1 << n
    bits = F.array(*[F.lit(1 << b) for b in range(n)])
    e = (
        spark.range(size)
        .select(F.col("id").alias("src"), F.explode(bits).alias("bit"))
        .select("src", F.col("src").bitwiseXOR(F.col("bit")).alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    return SparkGraph(e, vertices=_vertices(spark, size), directed=False,
                      coalesce_edges=False)


def grid_graph(spark: SparkSession, dims: "list[int]") -> SparkGraph:
    """``lattice.py`` ``grid_graph`` — n-dimensional lattice. The
    reference's nodes are coordinate tuples; here ``id`` is the mixed-radix
    encoding (last dimension fastest), one arc set per dimension, all pure
    expressions over ``spark.range``."""
    dims = [int(d) for d in dims]
    total = 1
    for d in dims:
        total *= d
    strides = []
    s = 1
    for d in reversed(dims):
        strides.append(s)
        s *= d
    strides = list(reversed(strides))  # strides[i] for dims[i]
    base = spark.range(total)
    parts = []
    for i, d in enumerate(dims):
        st = strides[i]
        coord = F.floor(F.col("id") / F.lit(st)) % F.lit(d)
        parts.append(
            base.filter(coord < d - 1).select(
                F.col("id").alias("src"),
                (F.col("id") + st).alias("dst"),
            )
        )
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    e = e.withColumn("weight", F.lit(1.0))
    return SparkGraph(e, vertices=_vertices(spark, total), directed=False,
                      coalesce_edges=False)


def generalized_petersen_graph(spark: SparkSession, n: int, k: int) -> SparkGraph:
    """GP(n, k): outer n-cycle (0..n-1), spokes to inner nodes
    (n..2n-1), inner star polygon step k. ``petersen_graph`` = GP(5, 2)
    (isomorphic to the reference's fixture; labels differ, parity tests
    check isomorphism)."""
    n, k = int(n), int(k)
    r = spark.range(n)
    outer = r.select(
        F.col("id").alias("src"),
        F.pmod(F.col("id") + 1, F.lit(n)).cast("long").alias("dst"),
    )
    spoke = r.select(F.col("id").alias("src"), (F.col("id") + n).alias("dst"))
    inner = r.select(
        (F.col("id") + n).alias("src"),
        (F.pmod(F.col("id") + k, F.lit(n)) + n).cast("long").alias("dst"),
    )
    e = outer.unionByName(spoke).unionByName(inner).withColumn(
        "weight", F.lit(1.0)
    )
    return SparkGraph(e, vertices=_vertices(spark, 2 * n), directed=False,
                      coalesce_edges=False)


def kneser_graph(spark: SparkSession, n: int, k: int) -> SparkGraph:
    """``classic.py`` ``kneser_graph`` — k-subsets of [n], adjacent iff
    disjoint. Node id = bitmask of the subset (the reference uses
    frozensets; parity is by isomorphism). The subset table is built once
    (C(n, k) rows) and the disjointness join is ``src & dst == 0`` —
    distributed, never all-pairs python."""
    from itertools import combinations

    n, k = int(n), int(k)
    masks = [
        sum(1 << i for i in c) for c in combinations(range(n), k)
    ]
    mdf = spark.createDataFrame([(m,) for m in masks], "m long")
    e = (
        mdf.select(F.col("m").alias("src"))
        .crossJoin(mdf.select(F.col("m").alias("dst")))
        .filter(
            (F.col("src") < F.col("dst"))
            & (F.col("src").bitwiseAND(F.col("dst")) == 0)
        )
        .withColumn("weight", F.lit(1.0))
    )
    v = mdf.select(F.col("m").alias("id"))
    return SparkGraph(e, vertices=v, directed=False, coalesce_edges=False)


def _fixed_graph(spark, edges, n):
    e = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in sorted(edges)],
        "src long, dst long, weight double",
    )
    return SparkGraph(e, vertices=_vertices(spark, n), directed=False,
                      coalesce_edges=False)


def chvatal_graph(spark: SparkSession) -> SparkGraph:
    """``small.py`` ``chvatal_graph`` — Chvátal's 12-vertex 4-regular
    triangle-free graph (published fixed edge list)."""
    from linkgraph.small_graph_data import CHVATAL_EDGES

    return _fixed_graph(spark, CHVATAL_EDGES, 12)


def tutte_graph(spark: SparkSession) -> SparkGraph:
    """``small.py`` ``tutte_graph`` — Tutte's 46-vertex 3-regular
    non-Hamiltonian planar graph (published fixed edge list)."""
    from linkgraph.small_graph_data import TUTTE_EDGES

    return _fixed_graph(spark, TUTTE_EDGES, 46)


def truncated_cube_graph(spark: SparkSession) -> SparkGraph:
    """``small.py`` ``truncated_cube_graph`` (published fixed edge
    list)."""
    from linkgraph.small_graph_data import TRUNCATED_CUBE_EDGES

    return _fixed_graph(spark, TRUNCATED_CUBE_EDGES, 24)


def hoffman_singleton_graph(spark: SparkSession) -> SparkGraph:
    """``small.py`` ``hoffman_singleton_graph`` — the unique (50, 7, 0, 1)
    strongly regular Moore graph, built from the classical
    pentagon/pentagram construction: vertex j of pentagon P_h joins
    vertex (h·i + j) mod 5 of pentagram Q_i. Node id = 25·side + 5·block
    + position (pentagons first)."""
    edges = set()

    def pid(h, j):
        return 5 * h + j % 5

    def qid(i, j):
        return 25 + 5 * i + j % 5

    for h in range(5):
        for j in range(5):
            edges.add(tuple(sorted((pid(h, j), pid(h, j + 1)))))
    for i in range(5):
        for j in range(5):
            edges.add(tuple(sorted((qid(i, j), qid(i, j + 2)))))
    for h in range(5):
        for i in range(5):
            for j in range(5):
                edges.add(tuple(sorted((pid(h, j), qid(i, h * i + j)))))
    return _fixed_graph(spark, edges, 50)


def dorogovtsev_goltsev_mendes_graph(spark: SparkSession, n: int) -> SparkGraph:
    """``classic.py`` ``dorogovtsev_goltsev_mendes_graph`` — generation n
    of the DGM recursive construction: start from one edge; each step adds
    one new vertex per existing edge, joined to that edge's endpoints.
    Node/edge numbering matches the reference's insertion order."""
    # adjacency with insertion order preserved, so each generation visits
    # edges exactly as the reference's G.edges() view does
    adj: dict = {0: {1: None}, 1: {0: None}}

    def edge_iter():
        seen = set()
        for u in adj:
            for v in adj[u]:
                if v not in seen:
                    yield (u, v)
            seen.add(u)

    def add_edge(u, v):
        adj.setdefault(u, {})[v] = None
        adj.setdefault(v, {})[u] = None

    next_node = 2
    for _ in range(int(n)):
        for u, v in list(edge_iter()):
            add_edge(u, next_node)
            add_edge(v, next_node)
            next_node += 1
    edges = {(min(u, v), max(u, v)) for u, v in edge_iter()}
    return _fixed_graph(spark, edges, next_node)


def sudoku_graph(spark: SparkSession, n: int = 3) -> SparkGraph:
    """``sudoku.py`` ``sudoku_graph`` — the n²×n² Sudoku constraint graph
    (cells adjacent iff same row, column, or n×n box). Declared as three
    equi-joins of the cell table on its row/col/box keys — pure DataFrame
    lineage, no driver edge list (a 10⁶-rank board costs the same to
    declare)."""
    n = int(n)
    if n < 0:
        raise NetworkXError("The order must be greater than or equal to zero.")
    n2 = n * n
    cells = spark.range(n2 * n2).select(
        F.col("id"),
        (F.col("id") / n2).cast("long").alias("row"),
        (F.col("id") % n2).alias("col"),
    ).withColumn(
        "box",
        (F.col("row") / n).cast("long") * n + (F.col("col") / n).cast("long"),
    )
    pairs = None
    for key in ("row", "col", "box"):
        a = cells.select(F.col("id").alias("src"), F.col(key).alias("k"))
        b = cells.select(F.col("id").alias("dst"), F.col(key).alias("k"))
        p = a.join(b, "k").filter(F.col("src") < F.col("dst")).select("src", "dst")
        pairs = p if pairs is None else pairs.unionByName(p)
    e = pairs.distinct().withColumn("weight", F.lit(1.0))
    return SparkGraph(e, vertices=_vertices(spark, n2 * n2), directed=False,
                      coalesce_edges=False)


def triangular_lattice_graph(
    spark: SparkSession, m: int, n: int
) -> SparkGraph:
    """``lattice.py`` ``triangular_lattice_graph`` (non-periodic) — m rows
    and n columns of triangles; (i, j) grid nodes relabeled to dense ids
    in sorted (i, j) order (= the reference after sorted integer
    relabeling). Returns vertices with (i, j) coordinate columns."""
    m, n = int(m), int(n)
    N = (n + 1) // 2
    nodes = {(i, j) for i in range(N + 1) for j in range(m + 1)}
    edges = set()
    for j in range(m + 1):
        for i in range(N):
            edges.add(((i, j), (i + 1, j)))
    for j in range(m):
        for i in range(N + 1):
            edges.add(((i, j), (i, j + 1)))
    for j in range(1, m, 2):
        for i in range(N):
            edges.add(((i, j), (i + 1, j + 1)))
    for j in range(0, m, 2):
        for i in range(N):
            edges.add(((i + 1, j), (i, j + 1)))
    if n % 2:
        drop = {(N, j) for j in range(1, m + 1, 2)}
        nodes -= drop
        edges = {e for e in edges if e[0] not in drop and e[1] not in drop}
    return _coord_graph(spark, nodes, edges)


def hexagonal_lattice_graph(
    spark: SparkSession, m: int, n: int
) -> SparkGraph:
    """``lattice.py`` ``hexagonal_lattice_graph`` (non-periodic) — m rows,
    n columns of hexagons; same dense sorted-(i, j) relabeling as the
    triangular form."""
    m, n = int(m), int(n)
    M = 2 * m
    nodes = {(i, j) for i in range(n + 1) for j in range(M + 2)}
    edges = set()
    for i in range(n + 1):
        for j in range(M + 1):
            edges.add(((i, j), (i, j + 1)))
    for i in range(n):
        for j in range(M + 2):
            if i % 2 == j % 2:
                edges.add(((i, j), (i + 1, j)))
    drop = {(0, M + 1), (n, (M + 1) * (n % 2))}
    nodes -= drop
    edges = {e for e in edges if e[0] not in drop and e[1] not in drop}
    return _coord_graph(spark, nodes, edges)


def _coord_graph(spark, nodes, edges):
    order = {c: k for k, c in enumerate(sorted(nodes))}
    vs = spark.createDataFrame(
        [(order[c], c[0], c[1]) for c in sorted(nodes)],
        "id long, i long, j long",
    )
    e = spark.createDataFrame(
        sorted(
            (min(order[a], order[b]), max(order[a], order[b]), 1.0)
            for a, b in edges
        ),
        "src long, dst long, weight double",
    )
    return SparkGraph(e, vertices=vs, directed=False, coalesce_edges=False)


def hkn_harary_graph(spark: SparkSession, k: int, n: int) -> SparkGraph:
    """``harary_graph.py`` ``hkn_harary_graph`` — the Harary graph H_{k,n}:
    minimum edges for node connectivity k on n nodes (circulant-based,
    the published case analysis on k/n parity)."""
    k, n = int(k), int(n)
    if k < 1:
        raise NetworkXError("The node connectivity must be >= 1!")
    if n < k + 1:
        raise NetworkXError("The number of nodes must be >= k+1 !")
    edges = set()

    def add(u, v):
        edges.add((min(u % n, v % n), max(u % n, v % n)))

    if k == 1:
        return path_graph(spark, n)
    offset = k // 2
    for d in range(1, offset + 1):
        for i in range(n):
            add(i, i + d)
    half = n // 2
    if (k % 2 == 0) or (n % 2 == 0):
        if k % 2 == 1:  # odd k needs the half-diagonals (n even here)
            for i in range(half):
                add(i, i + half)
    else:
        for i in range(half + 1):
            add(i, i + half)
    return _fixed_graph(spark, edges, n)


def hnm_harary_graph(spark: SparkSession, n: int, m: int) -> SparkGraph:
    """``harary_graph.py`` ``hnm_harary_graph`` — the Harary graph H_{n,m}:
    maximum node connectivity with n nodes and m edges (the circulant
    H_{k,n} plus the leftover chords, per the published construction)."""
    n, m = int(n), int(m)
    if n < 1:
        raise NetworkXError("The number of nodes must be >= 1!")
    if m < n - 1:
        raise NetworkXError("The number of edges must be >= n - 1 !")
    if m > n * (n - 1) // 2:
        raise NetworkXError("The number of edges must be <= n(n-1)/2")
    edges = set()

    def add(u, v):
        u, v = u % n, v % n
        if u != v:
            edges.add((min(u, v), max(u, v)))

    d = 2 * m // n  # floor of the average degree
    offset = d // 2
    for dd in range(1, offset + 1):
        for i in range(n):
            add(i, i + dd)
    half = n // 2
    if (n % 2 == 0) or (d % 2 == 0):
        if d % 2 == 1:  # odd d needs the half-diagonals (n even here)
            for i in range(half):
                add(i, i + half)
        r = 2 * m % n
        for i in range(r // 2):
            add(i, i + offset + 1)
    else:
        for i in range(m - n * offset):
            add(i, i + half)
    return _fixed_graph(spark, edges, n)


_TRIAD_PATTERNS = {
    "003": [], "012": [(0, 1)], "102": [(0, 1), (1, 0)],
    "021D": [(1, 0), (1, 2)], "021U": [(0, 1), (2, 1)],
    "021C": [(0, 1), (1, 2)], "111D": [(0, 2), (1, 2), (2, 0)],
    "111U": [(0, 2), (2, 0), (2, 1)], "030T": [(0, 1), (0, 2), (2, 1)],
    "030C": [(0, 2), (1, 0), (2, 1)],
    "201": [(0, 1), (0, 2), (1, 0), (2, 0)],
    "120D": [(0, 2), (1, 0), (1, 2), (2, 0)],
    "120U": [(0, 1), (0, 2), (2, 0), (2, 1)],
    "120C": [(0, 1), (0, 2), (1, 2), (2, 0)],
    "210": [(0, 1), (0, 2), (1, 2), (2, 0), (2, 1)],
    "300": [(0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1)],
}


def triad_graph(spark: SparkSession, triad_name: str) -> SparkGraph:
    """``triads.py`` ``triad_graph`` — the 3-node digraph of the named
    triad class (MAN census taxonomy; nodes a/b/c → 0/1/2)."""
    name = str(triad_name)
    if name not in _TRIAD_PATTERNS:
        raise ValueError(
            f"unknown triad name {name!r}; must be one of "
            f"{sorted(_TRIAD_PATTERNS)}"
        )
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in _TRIAD_PATTERNS[name]] or [],
        "src long, dst long, weight double",
    )
    return SparkGraph(e, vertices=_vertices(spark, 3), directed=True,
                      coalesce_edges=False)


def florentine_families_graph(spark: SparkSession) -> SparkGraph:
    """``social.py`` ``florentine_families_graph`` — Padgett's marriage
    network; vertices carry the family ``name`` column (ids alphabetical)."""
    from linkgraph.social_data import FLORENTINE_EDGES, FLORENTINE_FAMILIES

    vs = spark.createDataFrame(
        list(enumerate(FLORENTINE_FAMILIES)), "id long, name string"
    )
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in FLORENTINE_EDGES],
        "src long, dst long, weight double",
    )
    return SparkGraph(e, vertices=vs, directed=False, coalesce_edges=False)


def davis_southern_women_graph(spark: SparkSession) -> SparkGraph:
    """``social.py`` ``davis_southern_women_graph`` — the 1941 bipartite
    club-attendance data; vertices carry ``name`` and ``bipartite``
    (0 = woman, 1 = event) columns."""
    from linkgraph.social_data import DAVIS_EDGES, DAVIS_EVENTS, DAVIS_WOMEN

    rows = [(i, n, 0) for i, n in enumerate(DAVIS_WOMEN)] + [
        (len(DAVIS_WOMEN) + i, n, 1) for i, n in enumerate(DAVIS_EVENTS)
    ]
    vs = spark.createDataFrame(rows, "id long, name string, bipartite int")
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in DAVIS_EDGES],
        "src long, dst long, weight double",
    )
    return SparkGraph(e, vertices=vs, directed=False, coalesce_edges=False)


def les_miserables_graph(spark: SparkSession) -> SparkGraph:
    """``social.py`` ``les_miserables_graph`` — Knuth's character
    co-appearance network (Stanford GraphBase); edge ``weight`` is the
    co-appearance count, vertices carry the character ``name``."""
    from linkgraph.social_data import (
        LES_MISERABLES_CHARACTERS,
        LES_MISERABLES_EDGES,
    )

    vs = spark.createDataFrame(
        list(enumerate(LES_MISERABLES_CHARACTERS)), "id long, name string"
    )
    e = spark.createDataFrame(
        [(u, v, float(w)) for u, v, w in LES_MISERABLES_EDGES],
        "src long, dst long, weight double",
    )
    return SparkGraph(e, vertices=vs, directed=False, coalesce_edges=False)
