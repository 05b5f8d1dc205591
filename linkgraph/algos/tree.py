"""Tree/forest recognition — ``networkx/algorithms/tree/recognition.py``
(``is_forest:150``, ``is_tree:197``, ``is_branching:107``,
``is_arborescence:63``; NetworkX follows "convention A": directed
forests/trees constrain only the UNDERLYING undirected structure, while
branchings/arborescences add the in-degree ≤ 1 constraint).

The reference loops over components and compares ``len(c) - 1 ==
c.number_of_edges()`` per component. A connected component on ``n_i``
nodes always has ≥ ``n_i - 1`` edges, so the per-component equalities hold
iff the single global equality ``m == n - c`` does — one components run
plus two counts, no per-component driver loop. Reciprocal directed arcs
count as two edges (an undirected 2-cycle), exactly like the reference's
``number_of_edges`` on a DiGraph component.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph import SparkGraph
from linkgraph.algos.components import connected_components
from linkgraph.exceptions import NetworkXError, NotImplementedForDirected


def _counts(g: SparkGraph) -> tuple[int, int, int]:
    """(n, m, c) with m deduped per (src, dst) — simple-graph semantics."""
    n = g.number_of_nodes()
    if n == 0:
        raise NetworkXError(
            "G has no nodes; tree recognition is undefined for the null graph"
        )
    m = g.edges.select("src", "dst").distinct().count()
    comp = connected_components(g)
    c = comp.agg(F.countDistinct("component")).first()[0]
    return n, m, int(c)


def is_forest(g: SparkGraph) -> bool:
    """True iff the (underlying) undirected graph has no cycles
    (``recognition.py:150``); self-loops and reciprocal arcs are cycles."""
    n, m, c = _counts(g)
    return m == n - c


def is_tree(g: SparkGraph) -> bool:
    """True iff connected (weakly, when directed) with ``m == n - 1``
    (``recognition.py:197``)."""
    n, m, c = _counts(g)
    return c == 1 and m == n - 1


def _max_in_degree_le1(g: SparkGraph) -> bool:
    over = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .groupBy("dst")
        .agg(F.count(F.lit(1)).alias("ind"))
        .filter(F.col("ind") > 1)
    )
    return over.limit(1).count() == 0


def is_branching(g: SparkGraph) -> bool:
    """Directed forest with max in-degree ≤ 1 (``recognition.py:107``)."""
    if not g.directed:
        raise NotImplementedForDirected(
            "is_branching: not implemented for undirected type"
        )
    return is_forest(g) and _max_in_degree_le1(g)


def is_arborescence(g: SparkGraph) -> bool:
    """Directed tree with max in-degree ≤ 1 (``recognition.py:63``)."""
    if not g.directed:
        raise NotImplementedForDirected(
            "is_arborescence: not implemented for undirected type"
        )
    return is_tree(g) and _max_in_degree_le1(g)


def centroid(g) -> "list[int]":
    """``tree/decomposition.py``-adjacent ``nx.tree.centroid`` — the
    tree's centroid node(s): remove it and every component has ≤ n/2
    nodes. Computed by the walk-toward-the-heavy-subtree descent over
    collected adjacency (a point query; subtree sizes via one DFS)."""
    from pyspark.sql import functions as F

    from linkgraph.exceptions import NetworkXError

    if not is_tree(g):
        raise NetworkXError("provided graph is not a tree")
    adj = {}
    base = g.symmetric_edges() if not g.directed else (
        g.edges.select("src", "dst").unionByName(
            g.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
    )
    for r in base.select("src", "dst").collect():
        adj.setdefault(r["src"], set()).add(r["dst"])
    nodes = sorted(r["id"] for r in g.vertices.select("id").collect())
    for v in nodes:
        adj.setdefault(v, set())
    n = len(nodes)
    if n == 1:
        return [nodes[0]]
    root = nodes[0]
    # subtree sizes by iterative post-order
    parent = {root: None}
    order = [root]
    stack = [root]
    while stack:
        x = stack.pop()
        for y in sorted(adj[x]):
            if y != parent[x]:
                parent[y] = x
                order.append(y)
                stack.append(y)
    sizes = {v: 1 for v in nodes}
    for x in reversed(order):
        if parent[x] is not None:
            sizes[parent[x]] += sizes[x]
    prev = None
    cur = root

    def heavy(prev_, cur_):
        cands = [x for x in adj[cur_] if x != prev_]
        return max(cands, key=lambda x: sizes[x], default=None)

    hc = heavy(prev, cur)
    while max(n - sizes[cur], sizes.get(hc, 0)) > n / 2:
        prev, cur = cur, hc
        hc = heavy(prev, cur)
    return [cur] + [
        x for x in adj[cur] if x != prev and sizes[x] == n / 2
    ]
