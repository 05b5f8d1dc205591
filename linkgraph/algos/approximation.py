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
    "ramsey_R2",
    "clique_removal",
    "max_clique",
    "large_clique_size",
    "maximum_independent_set",
    "min_weighted_vertex_cover",
    "min_weighted_dominating_set",
    "min_maximal_matching",
    "min_edge_dominating_set",
    "local_node_connectivity",
    "metric_closure",
    "simulated_annealing_tsp",
    "threshold_accepting_tsp",
    "traveling_salesman_problem",
    "treewidth_min_fill_in",
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


# ---------------------------------------------------------------------- #
# approximation tail (``approximation/{clique,ramsey,vertex_cover,
# dominating_set,matching,connectivity,steinertree,traveling_salesman,
# treewidth}.py``)
# ---------------------------------------------------------------------- #


def _collect_simple_adj(g: SparkGraph, max_driver_edges: int = 1_000_000):
    if g.edges.count() > max_driver_edges:
        raise NetworkXError("approximation kernel exceeds driver guard")
    nodes = sorted(r["id"] for r in g.vertices.select("id").collect())
    adj = {v: set() for v in nodes}
    for r in g.symmetric_edges().select("src", "dst").collect():
        if r["src"] != r["dst"]:
            adj[r["src"]].add(r["dst"])
    return nodes, adj


def ramsey_R2(g: SparkGraph):
    """``approximation/ramsey.py`` ``ramsey_R2`` — (max clique found,
    max independent set found) by the Ramsey-witness recursion. Driver
    recursion like the reference (each step splits on one node)."""
    _, adj = _collect_simple_adj(g)

    def rec(nodes):
        if not nodes:
            return set(), set()
        node = min(nodes)
        nbrs = (adj[node] & nodes) - {node}
        non = nodes - adj[node] - {node}
        c1, i1 = rec(nbrs)
        c2, i2 = rec(non)
        c1.add(node)
        i2.add(node)
        return max(c1, c2, key=len), max(i1, i2, key=len)

    import sys as _sys

    nodes, _ = _collect_simple_adj(g)
    old = _sys.getrecursionlimit()
    _sys.setrecursionlimit(max(old, len(nodes) + 100))
    try:
        return rec(set(nodes))
    finally:
        _sys.setrecursionlimit(old)


def clique_removal(g: SparkGraph):
    """``approximation/clique.py`` ``clique_removal`` — Boppana-
    Halldórsson: repeatedly take a Ramsey pair and delete the clique.
    Returns (an O(n/log²n)-approx max independent set, clique cover)."""
    nodes, adj = _collect_simple_adj(g)
    live = set(nodes)

    def rec(scope):
        if not scope:
            return set(), set()
        node = min(scope)
        nbrs = (adj[node] & scope) - {node}
        non = scope - adj[node] - {node}
        c1, i1 = rec(nbrs)
        c2, i2 = rec(non)
        c1.add(node)
        i2.add(node)
        return max(c1, c2, key=len), max(i1, i2, key=len)

    import sys as _sys

    old = _sys.getrecursionlimit()
    _sys.setrecursionlimit(max(old, len(nodes) + 100))
    try:
        c_i, i_i = rec(live)
        cliques = [c_i]
        isets = [i_i]
        while live:
            live -= c_i
            c_i, i_i = rec(live)
            if c_i:
                cliques.append(c_i)
            if i_i:
                isets.append(i_i)
            if not c_i and not i_i:
                break
        return max(isets, key=len), cliques
    finally:
        _sys.setrecursionlimit(old)


def max_clique(g: SparkGraph):
    """``approximation/clique.py`` ``max_clique`` — the Boppana-
    Halldórsson approximation: clique_removal on the complement's
    independent set = a large clique of G."""
    nodes, adj = _collect_simple_adj(g)
    node_set = set(nodes)
    comp_adj = {v: (node_set - adj[v] - {v}) for v in nodes}
    import sys as _sys

    def rec(scope):
        if not scope:
            return set(), set()
        node = min(scope)
        nbrs = (comp_adj[node] & scope) - {node}
        non = scope - comp_adj[node] - {node}
        c1, i1 = rec(nbrs)
        c2, i2 = rec(non)
        c1.add(node)
        i2.add(node)
        return max(c1, c2, key=len), max(i1, i2, key=len)

    old = _sys.getrecursionlimit()
    _sys.setrecursionlimit(max(old, len(nodes) + 100))
    try:
        live = set(nodes)
        best = set()
        while live:
            c_i, i_i = rec(live)
            if i_i and len(i_i) > len(best):
                best = i_i  # independent in complement = clique in G
            if not c_i:
                break
            live -= c_i
        return best
    finally:
        _sys.setrecursionlimit(old)


def large_clique_size(g: SparkGraph) -> int:
    """``approximation/clique.py`` ``large_clique_size`` — the greedy
    degree-descending clique growth; same driver shape."""
    nodes, adj = _collect_simple_adj(g)
    if not nodes:
        return 0
    best = 0
    order = sorted(nodes, key=lambda v: (-len(adj[v]), v))
    seed_node = order[0]
    clique = {seed_node}
    cand = set(adj[seed_node])
    while cand:
        v = max(cand, key=lambda x: (len(adj[x] & cand), -x))
        clique.add(v)
        cand &= adj[v]
    return len(clique)


def maximum_independent_set(g: SparkGraph):
    """``approximation/clique.py`` ``maximum_independent_set`` — the
    independent-set half of :func:`clique_removal`."""
    iset, _ = clique_removal(g)
    return iset


def min_weighted_vertex_cover(g: SparkGraph, weight=None):
    """``approximation/vertex_cover.py`` ``min_weighted_vertex_cover`` —
    the Bar-Yehuda & Even local-ratio 2-approximation. The edge scan is
    order-dependent (residual costs mutate) — driver loop over the
    collected edges in canonical order; weights from a vertex column."""
    nodes, adj = _collect_simple_adj(g)
    cost = {v: 1.0 for v in nodes}
    if weight is not None:
        for r in g.vertices.select("id", weight).collect():
            cost[r["id"]] = float(r[weight])
    cover = set()
    for u in nodes:
        for v in sorted(adj[u]):
            if u >= v:
                continue
            if u in cover or v in cover:
                continue
            if cost[u] <= cost[v]:
                cover.add(u)
                cost[v] -= cost[u]
            else:
                cover.add(v)
                cost[u] -= cost[v]
    return cover


def min_weighted_dominating_set(g: SparkGraph, weight=None):
    """``approximation/dominating_set.py`` ``min_weighted_dominating_set``
    — the greedy (ln Δ)-approximation: repeatedly take the node with the
    cheapest cost per newly-covered vertex."""
    if g.directed:
        raise NetworkXError("min_weighted_dominating_set: undirected only")
    nodes, adj = _collect_simple_adj(g)
    if not nodes:
        return set()
    cost = {v: 1.0 for v in nodes}
    if weight is not None:
        for r in g.vertices.select("id", weight).collect():
            cost[r["id"]] = float(r[weight])
    dom = set()
    uncovered = set(nodes)
    hoods = {v: {v} | adj[v] for v in nodes}
    while uncovered:
        v = min(
            hoods,
            key=lambda x: (
                cost[x] / max(len(hoods[x] - (set(nodes) - uncovered)), 1)
                if hoods[x] & uncovered
                else float("inf"),
                x,
            ),
        )
        dom.add(v)
        uncovered -= hoods[v]
        del hoods[v]
    return dom


def min_maximal_matching(g: SparkGraph) -> DataFrame:
    """``approximation/matching.py`` ``min_maximal_matching`` — any
    maximal matching 2-approximates the minimum one; the engine's
    distributed Israeli-Itai kernel IS that."""
    from linkgraph.algos.selection import maximal_matching

    return maximal_matching(g)


def min_edge_dominating_set(g: SparkGraph) -> DataFrame:
    """``approximation/dominating_set.py`` ``min_edge_dominating_set`` —
    a maximal matching edge-dominates within factor 2."""
    from linkgraph.algos.selection import maximal_matching

    return maximal_matching(g)


def local_node_connectivity(g: SparkGraph, source, target, cutoff=None) -> int:
    """``approximation/connectivity.py`` ``local_node_connectivity``
    (White-Newman) — count vertex-disjoint paths found by repeated
    shortest-path probes that exclude previously-used interior nodes.
    Sequential probe loop; each probe is a BFS on the collected
    adjacency."""
    from collections import deque

    source, target = int(source), int(target)
    if source == target:
        raise NetworkXError("source and target have to be different nodes.")
    nodes, adj = _collect_simple_adj(g)
    possible = min(len(adj.get(source, ())), len(adj.get(target, ())))
    if not possible:
        return 0
    if cutoff is None:
        cutoff = float("inf")
    exclude = set()
    K = 0
    while K < min(possible, cutoff):
        prev = {source: None}
        q = deque([source])
        found = False
        while q and not found:
            x = q.popleft()
            for y in sorted(adj[x]):
                if y in prev or (y in exclude and y != target):
                    continue
                prev[y] = x
                if y == target:
                    found = True
                    break
                q.append(y)
        if not found:
            break
        path = [target]
        while prev[path[-1]] is not None:
            path.append(prev[path[-1]])
        exclude.update(p for p in path if p not in (source, target))
        K += 1
    return K


def metric_closure(g: SparkGraph, weight=None) -> SparkGraph:
    """``approximation/steinertree.py`` ``metric_closure`` — the complete
    graph over G's nodes weighted by shortest-path distance, computed
    with the DISTRIBUTED batched APSP kernel (one join, no driver
    loops). Raises on disconnected input like the reference."""
    from linkgraph.algos.sssp import all_pairs_bellman_ford_path_lengths

    n = g.number_of_nodes()
    d = all_pairs_bellman_ford_path_lengths(
        g, weight=weight if weight is not None else F.lit(1.0)
    )
    reach = d.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    bad = reach.filter(F.col("c") < n).limit(1).count()
    if bad:
        raise NetworkXError("G is not a connected graph.")
    e = (
        d.filter(F.col("source") < F.col("id"))
        .select(
            F.col("source").alias("src"),
            F.col("id").alias("dst"),
            F.col("distance").alias("weight"),
        )
    )
    return SparkGraph(e, g.vertices.select("id"), directed=False,
                      coalesce_edges=False)


def _cycle_cost(order, wmap):
    return sum(wmap[(order[i], order[i + 1])] for i in range(len(order) - 1))


def _collect_complete_weights(g, weight):
    from linkgraph.graph import resolve_weight_column

    base = g.symmetric_edges() if not g.directed else g.edges
    wmap = {}
    for r in base.select(
        "src", "dst", resolve_weight_column(base, weight).alias("w")
    ).collect():
        wmap[(r["src"], r["dst"])] = float(r["w"])
        if not g.directed:
            wmap[(r["dst"], r["src"])] = float(r["w"])
    nodes = sorted(r["id"] for r in g.vertices.select("id").collect())
    for u in nodes:
        for v in nodes:
            if u != v and (u, v) not in wmap:
                raise NetworkXError("G must be a complete graph.")
    return nodes, wmap


def simulated_annealing_tsp(
    g: SparkGraph, init_cycle, weight=None, source=None, temp: float = 100,
    move: str = "1-1", max_iterations: int = 10, N_inner: int = 100,
    alpha: float = 0.01, seed: int = 0,
):
    """``traveling_salesman.py`` ``simulated_annealing_tsp`` — local
    search over complete-graph cycles with geometric cooling; seeded
    driver recurrence like every local-search variant. ``init_cycle`` is
    a node list or ``"greedy"``."""
    import math as _m
    import random as _rnd

    nodes, wmap = _collect_complete_weights(g, weight)
    rng = _rnd.Random(int(seed))
    if init_cycle == "greedy":
        rows = greedy_tsp(g, weight=weight, source=source).orderBy("order").collect()
        cycle = [r["id"] for r in rows]
        if len(nodes) == 2:
            return cycle
    else:
        cycle = [int(x) for x in init_cycle]
        if source is None:
            source = cycle[0]
        elif source != cycle[0]:
            raise NetworkXError("source must be first node in init_cycle")
        if cycle[0] != cycle[-1]:
            raise NetworkXError("init_cycle must be a cycle. (return to start)")
        if len(cycle) - 1 != len(nodes):
            raise NetworkXError(
                "init_cycle should be a cycle over all nodes in G."
            )
        if len(nodes) == 2:
            return cycle

    def do_move(cyc):
        c = list(cyc)
        if move == "1-1":
            i, j = rng.sample(range(1, len(c) - 1), 2)
            c[i], c[j] = c[j], c[i]
        else:  # "1-0"
            i, j = rng.sample(range(1, len(c) - 1), 2)
            node = c.pop(i)
            c.insert(j, node)
        return c

    cost = _cycle_cost(cycle, wmap)
    best_cycle, best_cost = list(cycle), cost
    count = 0
    t = float(temp)
    while count <= int(max_iterations) and t > 0:
        count += 1
        for _ in range(int(N_inner)):
            cand = do_move(cycle)
            cand_cost = _cycle_cost(cand, wmap)
            delta = cand_cost - cost
            if delta <= 0 or _m.exp(-delta / t) >= rng.random():
                cycle, cost = cand, cand_cost
                if cost < best_cost:
                    count = 0
                    best_cycle, best_cost = list(cycle), cost
        t -= t * float(alpha)
    return best_cycle


def threshold_accepting_tsp(
    g: SparkGraph, init_cycle, weight=None, source=None,
    threshold: float = 1, move: str = "1-1", max_iterations: int = 10,
    N_inner: int = 100, alpha: float = 0.1, seed: int = 0,
):
    """``traveling_salesman.py`` ``threshold_accepting_tsp`` — accept
    any move within the shrinking threshold (Dueck-Scheuer); same driver
    shape as the annealing variant."""
    import random as _rnd

    nodes, wmap = _collect_complete_weights(g, weight)
    rng = _rnd.Random(int(seed))
    if init_cycle == "greedy":
        rows = greedy_tsp(g, weight=weight, source=source).orderBy("order").collect()
        cycle = [r["id"] for r in rows]
        if len(nodes) == 2:
            return cycle
    else:
        cycle = [int(x) for x in init_cycle]
        if cycle[0] != cycle[-1]:
            raise NetworkXError("init_cycle must be a cycle. (return to start)")
        if len(nodes) == 2:
            return cycle

    def do_move(cyc):
        c = list(cyc)
        i, j = rng.sample(range(1, len(c) - 1), 2)
        if move == "1-1":
            c[i], c[j] = c[j], c[i]
        else:
            node = c.pop(i)
            c.insert(j, node)
        return c

    cost = _cycle_cost(cycle, wmap)
    best_cycle, best_cost = list(cycle), cost
    count = 0
    th = float(threshold) * cost / 100.0
    while count <= int(max_iterations):
        count += 1
        accepted = False
        for _ in range(int(N_inner)):
            cand = do_move(cycle)
            cand_cost = _cycle_cost(cand, wmap)
            if cand_cost - cost <= th:
                if cand_cost < cost:
                    accepted = True
                cycle, cost = cand, cand_cost
                if cost < best_cost:
                    count = 0
                    best_cycle, best_cost = list(cycle), cost
        if not accepted:
            break
        th *= 1.0 - float(alpha)
    return best_cycle


def traveling_salesman_problem(
    g: SparkGraph, weight=None, nodes=None, cycle: bool = True, method=None,
    **kwargs,
):
    """``traveling_salesman.py`` ``traveling_salesman_problem`` — build
    the metric closure over the requested nodes (DISTRIBUTED APSP), run
    the chosen heuristic (christofides default; asadpour ATSP is out of
    scope — its held-karp relaxation needs an LP solver), and expand the
    tour back through shortest paths. Returns the node list."""
    from linkgraph.algos.sssp import all_pairs_bellman_ford_path_lengths

    if g.directed:
        raise NetworkXError(
            "traveling_salesman_problem: directed (asadpour) variant needs "
            "an LP solver and is out of scope; undirected only"
        )
    all_nodes = sorted(r["id"] for r in g.vertices.select("id").collect())
    sel = sorted(int(x) for x in nodes) if nodes is not None else all_nodes
    d = all_pairs_bellman_ford_path_lengths(
        g, weight=weight if weight is not None else F.lit(1.0)
    ).persist()
    dmap = {}
    for r in d.collect():
        dmap[(r["source"], r["id"])] = float(r["distance"])
    spark = g.spark
    comp_edges = [
        (u, v, dmap[(u, v)])
        for i, u in enumerate(sel)
        for v in sel[i + 1:]
        if (u, v) in dmap
    ]
    if len(comp_edges) < len(sel) * (len(sel) - 1) // 2:
        raise NetworkXError("G is not a connected graph.")
    gg = SparkGraph(
        spark.createDataFrame(comp_edges, "src long, dst long, weight double"),
        spark.createDataFrame([(x,) for x in sel], "id long"),
        directed=False,
        coalesce_edges=False,
    )
    if method is None:
        rows = christofides(gg, weight="weight", **kwargs).orderBy("order").collect()
        tour = [r["id"] for r in rows]
    else:
        tour = method(gg, weight="weight", **kwargs)
        if hasattr(tour, "collect"):
            tour = [r["id"] for r in tour.orderBy("order").collect()]
    if not cycle:
        # drop the heaviest hop
        import itertools as _it

        pairs = list(zip(tour, tour[1:]))
        u, v = max(pairs, key=lambda p: dmap[(p[0], p[1])])
        pos = pairs.index((u, v)) + 1
        tour = tour[pos:-1] + tour[:pos]
    # expand through shortest paths on the ORIGINAL graph
    from linkgraph.algos.paths import shortest_path

    best_path = []
    hops = list(zip(tour, tour[1:]))
    for u, v in hops:
        seg = shortest_path(g, u, v, weight=weight)
        best_path.extend(seg[:-1])
    if hops:
        best_path.append(hops[-1][1])
    return best_path


def treewidth_min_fill_in(g: SparkGraph):
    """``approximation/treewidth.py`` ``treewidth_min_fill_in`` — the
    elimination-order heuristic choosing the node whose elimination adds
    the fewest fill edges (driver-gated like ``treewidth_min_degree``).
    Returns (width, bags DataFrame (bag, members))."""
    nodes, adj = _collect_simple_adj(g)
    work = {v: set(s) for v, s in adj.items()}
    bags = []
    width = 0
    live = set(nodes)

    def fill_in(v):
        nbrs = sorted(work[v])
        cnt = 0
        for i, a in enumerate(nbrs):
            for b in nbrs[i + 1:]:
                if b not in work[a]:
                    cnt += 1
        return cnt

    while live:
        v = min(live, key=lambda x: (fill_in(x), x))
        bag = {v} | work[v]
        bags.append(sorted(bag))
        width = max(width, len(bag) - 1)
        nbrs = sorted(work[v])
        for i, a in enumerate(nbrs):
            for b in nbrs[i + 1:]:
                work[a].add(b)
                work[b].add(a)
        for a in nbrs:
            work[a].discard(v)
        del work[v]
        live.discard(v)
    rows = [(i, members) for i, members in enumerate(bags)]
    bags_df = g.spark.createDataFrame(
        rows or [], "bag long, members array<long>"
    )
    return width, bags_df


def asadpour_atsp(g: SparkGraph, weight=None, seed=None, source=None):
    """``traveling_salesman.py`` ``asadpour_atsp`` — the O(log n/log log
    n) ATSP approximation. Its Held-Karp relaxation requires an LP
    solver (the reference itself imports scipy.optimize); neither ships
    in this engine's environment, so the name raises with rationale —
    use :func:`greedy_tsp` on the directed metric closure instead."""
    raise NotImplementedError(
        "asadpour_atsp needs an LP solver for the Held-Karp relaxation "
        "(the reference uses scipy.optimize.linprog, absent here); use "
        "greedy_tsp over metric_closure for directed tours"
    )
