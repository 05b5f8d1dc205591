"""Approximation / heuristic algorithms.

Reference: ``networkx/algorithms/approximation/`` —
``distance_measures.py:13`` ``diameter`` (2-sweep), ``maxcut.py:13``
``randomized_partitioning`` / ``:60`` ``one_exchange``,
``traveling_salesman.py:316`` ``greedy_tsp``.

Split per the engine's standard rule:

- ``diameter`` is two frontier-BFS passes — fully distributed (the same
  superstep kernel as every BFS-family operator), no driver collection.
- ``randomized_partitioning`` is one hash-coin column expression plus one
  aggregate — embarrassingly parallel.
- ``one_exchange`` (sequential local search: each accepted flip changes
  the gain of every neighbor) and ``greedy_tsp`` (a sequential nearest-
  neighbor walk) have no join form; driver-gated under size guards,
  exactly the cost class the reference pays.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph

__all__ = [
    "christofides",
    "diameter",
    "diameter_2sweep",
    "randomized_partitioning",
    "one_exchange",
    "greedy_tsp",
    "treewidth_min_degree",
]


def diameter_2sweep(g: SparkGraph, *, start=None) -> int:
    """Lower bound on the diameter by the 2-sweep heuristic
    (``approximation/distance_measures.py:13``): BFS from a start node,
    then BFS from the farthest node found; the second eccentricity is the
    bound (exact on trees, and in practice on most real graphs — the
    reference makes the same claim). Directed graphs run the reference's
    double sweep (forward + backward eccentricities).

    Deterministic where the reference draws a random start: ``start=None``
    uses the minimum node id. Raises on an empty or non-(strongly-)
    connected graph, like the reference's ``ValueError``. Two (four when
    directed) distributed BFS passes — no driver collection; this IS the
    scale path for "how wide is the 100 TB crawl graph".
    """
    from linkgraph.algos.setops import shortest_path_lengths

    n = g.number_of_nodes()
    if n == 0:
        raise NetworkXError("Expected non-empty NetworkX graph!")
    if start is None:
        start = g.vertices.agg(F.min("id")).first()[0]

    def _sweep(graph: SparkGraph, source) -> tuple[int, int]:
        d = shortest_path_lengths(graph, [int(source)])
        if d.count() < graph.number_of_nodes():
            raise NetworkXError("DiGraph not strongly connected."
                                if graph.directed else "Graph not connected.")
        far = d.orderBy(F.desc("distance"), "id").first()
        return int(far["id"]), int(far["distance"])

    if not g.directed:
        v, _ = _sweep(g, start)
        _, ecc = _sweep(g, v)
        return ecc
    # directed 2-dsweep: forward sweep picks a, backward eccentricity of a
    rev = g.reverse() if hasattr(g, "reverse") else SparkGraph(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        vertices=g.vertices.select("id"),
        directed=True,
        coalesce_edges=False,
    )
    a, _ = _sweep(g, start)
    _, ecc_b = _sweep(rev, a)
    b, _ = _sweep(rev, start)
    _, ecc_f = _sweep(g, b)
    return max(ecc_b, ecc_f)


def randomized_partitioning(
    g: SparkGraph, *, seed: int = 0, p: float = 0.5, weight=None
) -> tuple[float, DataFrame]:
    """(cut_size, (id, side)): each node joins side 1 independently with
    probability p via the hash coin (``maxcut.py:13``). One column
    expression + one aggregate — the distributed twin of the reference's
    per-node ``random() < p``; expected cut = 2p(1−p)·total weight."""
    from linkgraph.graph import resolve_weight_column

    coin = (
        F.pmod(F.xxhash64(F.lit(int(seed)), F.col("id")), F.lit(2**32))
        / F.lit(float(2**32))
    )
    sides = g.vertices.select(
        "id", (coin < F.lit(float(p))).cast("int").alias("side")
    ).localCheckpoint(eager=True)
    base = g.edges
    wcol = resolve_weight_column(base, weight)
    cut = (
        base.select("src", "dst", wcol.alias("w"))
        .join(sides.withColumnRenamed("id", "src").withColumnRenamed("side", "s1"), "src")
        .join(sides.withColumnRenamed("id", "dst").withColumnRenamed("side", "s2"), "dst")
        .filter(F.col("s1") != F.col("s2"))
        .agg(F.sum("w"))
        .first()[0]
    )
    return float(cut or 0.0), sides


def one_exchange(
    g: SparkGraph,
    *,
    seed: int = 0,
    weight=None,
    max_driver_edges: int = 5_000_000,
) -> tuple[float, DataFrame]:
    """(cut_size, (id, side)): 1-exchange local-search maxcut
    (``maxcut.py:60``) — start from the hash-coin partition and flip any
    node whose flip increases the cut until none does. Each accepted flip
    re-prices every neighbor, a sequential dependence with no join form —
    driver-gated; the local-optimum INVARIANT (no single flip improves) is
    what tests pin, the reference's own guarantee."""
    from linkgraph.graph import resolve_weight_column

    base = g.edges
    wcol = resolve_weight_column(base, weight)
    arcs = base.select("src", "dst", wcol.alias("w")).filter(
        F.col("src") != F.col("dst")
    )
    m = arcs.count()
    if m > max_driver_edges:
        raise NetworkXError(
            f"one_exchange local search is sequential; {m} edges > "
            f"max_driver_edges={max_driver_edges}. Use "
            "randomized_partitioning (distributed) at scale."
        )
    adj: dict[int, dict[int, float]] = {}
    for r in arcs.collect():
        u, v, w = int(r["src"]), int(r["dst"]), float(r["w"])
        adj.setdefault(u, {})[v] = adj.setdefault(u, {}).get(v, 0.0) + w
        adj.setdefault(v, {})[u] = adj.setdefault(v, {}).get(u, 0.0) + w
    ids = sorted(int(r["id"]) for r in g.vertices.select("id").collect())
    rng_side = {
        i: int(
            (hash((seed, i)) & 0xFFFFFFFF) / 2**32 < 0.5
        )
        for i in ids
    }
    improved = True
    while improved:
        improved = False
        for u in ids:
            gain = 0.0
            for v, w in adj.get(u, {}).items():
                gain += w if rng_side[v] == rng_side[u] else -w
            if gain > 0:
                rng_side[u] = 1 - rng_side[u]
                improved = True
    cut = sum(
        w
        for u, nbrs in adj.items()
        for v, w in nbrs.items()
        if u < v and rng_side[u] != rng_side[v]
    )
    sides = g.spark.createDataFrame(
        [(i, rng_side[i]) for i in ids], "id bigint, side int"
    )
    return float(cut), sides


def greedy_tsp(
    g: SparkGraph,
    *,
    weight=None,
    source=None,
    max_driver_edges: int = 5_000_000,
) -> DataFrame:
    """(order, id): nearest-neighbor TSP cycle over a COMPLETE weighted
    graph (``traveling_salesman.py:316`` ``greedy_tsp``): from the source,
    repeatedly hop to the cheapest unvisited node, then return. The walk
    is sequential by definition — driver-gated; identical cycle to the
    reference when edge weights are pairwise distinct (ties: ascending
    node id, the engine's determinism rule). Raises on incomplete
    graphs, like the reference."""
    from linkgraph.graph import resolve_weight_column

    base = g.symmetric_edges() if not g.directed else g.edges
    arcs = base.select(
        "src", "dst", resolve_weight_column(base, weight).alias("w")
    ).filter(F.col("src") != F.col("dst"))
    m = arcs.count()
    if m > max_driver_edges:
        raise NetworkXError(
            f"greedy_tsp walk is sequential; {m} arcs > "
            f"max_driver_edges={max_driver_edges}."
        )
    adj: dict[int, dict[int, float]] = {}
    for r in arcs.collect():
        adj.setdefault(int(r["src"]), {})[int(r["dst"])] = float(r["w"])
    ids = sorted(int(r["id"]) for r in g.vertices.select("id").collect())
    n = len(ids)
    if any(len(adj.get(u, {})) < n - 1 for u in ids):
        raise NetworkXError("G must be a complete graph.")
    cur = int(source) if source is not None else ids[0]
    if cur not in set(ids):
        raise NetworkXError(f"source {cur} not in G")
    cycle = [cur]
    unvisited = set(ids) - {cur}
    while unvisited:
        nxt = min(unvisited, key=lambda v: (adj[cur][v], v))
        cycle.append(nxt)
        unvisited.remove(nxt)
        cur = nxt
    cycle.append(cycle[0])
    return g.spark.createDataFrame(
        [(i, v) for i, v in enumerate(cycle)], "order int, id bigint"
    )


#: nx-style name: ``nx.algorithms.approximation.diameter`` — the engine's
#: deterministic 2-sweep (the reference's seeded random start replaced by
#: the minimum-id determinism rule).
diameter = diameter_2sweep


def christofides(
    g: SparkGraph,
    *,
    weight=None,
    max_driver_edges: int = 5_000_000,
) -> DataFrame:
    """(order, id): Christofides 1.5-approximate TSP cycle over a COMPLETE
    weighted graph satisfying the triangle inequality
    (``traveling_salesman.py:150`` ``christofides``).

    A composition of the engine's existing kernels, exactly the
    reference's pipeline: distributed Borůvka MST → min-weight perfect
    matching on the odd-degree MST vertices (the blossom kernel,
    matching_weight.py) → Euler circuit of the MST+matching multigraph →
    shortcut repeated visits. The MST runs distributed; matching and the
    walk are driver-gated like their standalone APIs (the cycle tour
    itself is an O(n) object). The 1.5·OPT guarantee is pinned in tests
    against brute-force optima; the exact tour may differ from the
    reference's where MST/matching tie-breaks differ — both sides carry
    the same approximation contract."""
    from linkgraph.algos.mst import minimum_spanning_edges
    from linkgraph.algos.matching_weight import min_weight_matching
    from linkgraph.graph import resolve_weight_column

    base = g.symmetric_edges() if not g.directed else g.edges
    arcs = base.select(
        "src", "dst", resolve_weight_column(base, weight).alias("w")
    ).filter(F.col("src") != F.col("dst"))
    m = arcs.count()
    if m > max_driver_edges:
        raise NetworkXError(
            f"christofides matching step is driver-gated; {m} arcs > "
            f"max_driver_edges={max_driver_edges}."
        )
    ids = sorted(int(r["id"]) for r in g.vertices.select("id").collect())
    n = len(ids)
    wmap: dict[tuple[int, int], float] = {}
    for r in arcs.collect():
        wmap[(int(r["src"]), int(r["dst"]))] = float(r["w"])
    if any(
        (u, v) not in wmap
        for i, u in enumerate(ids)
        for v in ids[i + 1 :]
    ):
        raise NetworkXError("G must be a complete graph.")
    if n in (0, 1):
        raise NetworkXError("G must have at least two nodes")

    # 1. distributed MST
    tree = [
        (int(r["src"]), int(r["dst"]))
        for r in minimum_spanning_edges(g, weight=weight)
        .select("src", "dst")
        .collect()
    ]
    # 2. odd-degree vertices of the tree
    deg: dict[int, int] = {}
    for u, v in tree:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    odd = sorted(u for u in ids if deg.get(u, 0) % 2 == 1)
    # 3. min-weight perfect matching on the induced complete subgraph
    match: list[tuple[int, int]] = []
    if odd:
        odd_set = set(odd)
        sub_edges = g.spark.createDataFrame(
            [
                (u, v, wmap[(u, v)])
                for i, u in enumerate(odd)
                for v in odd[i + 1 :]
            ],
            "src long, dst long, weight double",
        )
        sub = SparkGraph(
            sub_edges,
            vertices=g.spark.createDataFrame([(u,) for u in odd], "id long"),
            directed=False,
            coalesce_edges=False,
        )
        match = [
            (int(r["src"]), int(r["dst"]))
            for r in min_weight_matching(sub).collect()
        ]
        if 2 * len(match) != len(odd_set):
            raise NetworkXError("internal: matching is not perfect")
    # 4. Euler circuit of the MST + matching MULTIGRAPH (driver Hierholzer
    #    over n-1 + |odd|/2 edges — the tour is an O(n) object by contract)
    multi: dict[int, list[int]] = {u: [] for u in ids}
    for u, v in tree + match:
        multi[u].append(v)
        multi[v].append(u)
    for u in multi:
        multi[u].sort(reverse=True)  # pop() walks ascending neighbors
    used: dict[tuple[int, int], int] = {}
    for u, v in tree + match:
        k = (min(u, v), max(u, v))
        used[k] = used.get(k, 0) + 1
    start = ids[0]
    stack = [start]
    circuit = []
    while stack:
        u = stack[-1]
        while multi[u]:
            v = multi[u][-1]
            k = (min(u, v), max(u, v))
            if used.get(k, 0) > 0:
                break
            multi[u].pop()
        if multi[u]:
            v = multi[u].pop()
            k = (min(u, v), max(u, v))
            used[k] -= 1
            stack.append(v)
        else:
            circuit.append(stack.pop())
    # 5. shortcut repeated visits
    seen = set()
    tour = []
    for u in circuit:
        if u not in seen:
            seen.add(u)
            tour.append(u)
    tour.append(tour[0])
    return g.spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(tour)], "order int, id bigint"
    )


def treewidth_min_degree(
    g: SparkGraph, *, max_driver_edges: int = 5_000_000
) -> tuple[int, DataFrame, DataFrame]:
    """(width, bags, tree): an upper-bound tree decomposition by the
    min-degree elimination heuristic
    (``approximation/treewidth.py`` ``treewidth_min_degree``).

    Elimination ordering is sequential by definition (each elimination
    rewires the remaining graph), so the kernel is driver-gated like the
    reference's own in-memory loop; ties break by ascending node id (the
    engine's determinism rule, where the reference's heap order is an
    implementation accident). Returns the relational form of the
    reference's frozenset-node decomposition graph: ``bags`` is
    ``(bag BIGINT, id BIGINT)`` membership rows, ``tree`` is
    ``(src BIGINT, dst BIGINT)`` over bag numbers, and
    ``width = max |bag| − 1``. The decomposition contract (every edge
    inside some bag; the bags containing any node form a subtree) is
    pinned in tests, plus exact widths on the closed-form families
    (trees → 1, cycles → 2, K_n → n−1)."""
    arcs = (
        g.symmetric_edges().select("src", "dst").distinct()
        if not g.directed
        else g.edges.select("src", "dst")
    )
    m = arcs.count()
    if m > max_driver_edges:
        raise NetworkXError(
            f"treewidth elimination is sequential; {m} arcs > "
            f"max_driver_edges={max_driver_edges}."
        )
    adj: dict[int, set] = {}
    for r in arcs.collect():
        u, v = int(r["src"]), int(r["dst"])
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    ids = sorted(int(r["id"]) for r in g.vertices.select("id").collect())
    for u in ids:
        adj.setdefault(u, set())

    # eliminate min-degree first; record each node's bag = {v} ∪ N(v)
    order: list[tuple[int, frozenset]] = []
    alive = set(ids)
    while alive:
        v = min(alive, key=lambda x: (len(adj[x]), x))
        nbrs = set(adj[v])
        order.append((v, frozenset(nbrs | {v})))
        for a in nbrs:
            for b in nbrs:
                if a < b:
                    adj[a].add(b)
                    adj[b].add(a)
        for a in nbrs:
            adj[a].discard(v)
        del adj[v]
        alive.remove(v)

    # stitch the decomposition: connect each bag to the bag of the
    # eliminated node's first later-eliminated neighbor (standard
    # elimination-tree construction; single node -> a lone bag)
    pos = {v: i for i, (v, _) in enumerate(order)}
    bag_rows = []
    tree_rows = []
    for i, (v, bag) in enumerate(order):
        for u in sorted(bag):
            bag_rows.append((i, u))
        later = [u for u in bag if u != v]
        if later:
            parent = min(later, key=lambda u: pos[u])
            tree_rows.append((i, pos[parent]))
    width = max((len(b) for _, b in order), default=1) - 1
    spark = g.spark
    bags = spark.createDataFrame(bag_rows or [(0, 0)], "bag long, id long")
    if not bag_rows:
        bags = bags.limit(0)
    tree = spark.createDataFrame(tree_rows or [(0, 0)], "src long, dst long")
    if not tree_rows:
        tree = tree.limit(0)
    return int(width), bags, tree
