"""Graph products — ``networkx/algorithms/operators/product.py``
(``tensor_product:240``, ``cartesian_product:288``, ``strong_product:388``,
``lexicographic_product:339``).

The reference yields tuple-labeled nodes ``(u1, u2)``; this engine's node
ids are BIGINT, so the product node is ENCODED ``id = u1 * stride + u2``
with ``stride = max(H id) + 1`` — a bijection the caller can invert (or
join against the returned ``node_map``). Every product is a composition
of joins/cross-joins on the two edge tables:

- tensor:        ((u1,v1) ∈ G) AND ((u2,v2) ∈ H) — one equi-free join of
                 the two edge sets (a cross join of edges, O(mG·mH) by
                 definition)
- cartesian:     (u1=v1 AND (u2,v2) ∈ H) UNION ((u1,v1) ∈ G AND u2=v2)
- strong:        cartesian UNION tensor
- lexicographic: ((u1,v1) ∈ G, any u2,v2) UNION (u1=v1 AND (u2,v2) ∈ H)

Undirected inputs are symmetrized before composing (the reference walks
both directions of ``G.adj``), and the result collapses back to canonical
storage at SparkGraph construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph


def _stride(h: SparkGraph) -> int:
    m = h.vertices.agg(F.max("id")).first()[0]
    return int(m) + 1 if m is not None else 1


def _pairs(g: SparkGraph, a: str, b: str) -> DataFrame:
    e = g.symmetric_edges() if not g.directed else g.edges
    return e.select(F.col("src").alias(a), F.col("dst").alias(b))


def _product_vertices(g: SparkGraph, h: SparkGraph, stride: int) -> DataFrame:
    return (
        g.vertices.select(F.col("id").alias("u1"))
        .crossJoin(h.vertices.select(F.col("id").alias("u2")))
        .select((F.col("u1") * stride + F.col("u2")).alias("id"))
    )


def _build(g, h, enc_edges: DataFrame, stride: int) -> SparkGraph:
    directed = g.directed or h.directed
    v = _product_vertices(g, h, stride)
    return SparkGraph(
        enc_edges.withColumn("weight", F.lit(1.0)),
        vertices=v,
        directed=directed,
        coalesce_edges=True,
    )


def tensor_product(g: SparkGraph, h: SparkGraph) -> SparkGraph:
    """``product.py:240`` — adjacency in BOTH coordinates."""
    k = _stride(h)
    ge = _pairs(g, "u1", "v1")
    he = _pairs(h, "u2", "v2")
    e = ge.crossJoin(he).select(
        (F.col("u1") * k + F.col("u2")).alias("src"),
        (F.col("v1") * k + F.col("v2")).alias("dst"),
    )
    return _build(g, h, e, k)


def cartesian_product(g: SparkGraph, h: SparkGraph) -> SparkGraph:
    """``product.py:288`` — step in exactly one coordinate."""
    k = _stride(h)
    left = (
        _pairs(g, "u1", "v1")
        .crossJoin(h.vertices.select(F.col("id").alias("u2")))
        .select(
            (F.col("u1") * k + F.col("u2")).alias("src"),
            (F.col("v1") * k + F.col("u2")).alias("dst"),
        )
    )
    right = (
        _pairs(h, "u2", "v2")
        .crossJoin(g.vertices.select(F.col("id").alias("u1")))
        .select(
            (F.col("u1") * k + F.col("u2")).alias("src"),
            (F.col("u1") * k + F.col("v2")).alias("dst"),
        )
    )
    return _build(g, h, left.unionByName(right), k)


def strong_product(g: SparkGraph, h: SparkGraph) -> SparkGraph:
    """``product.py:388`` — cartesian ∪ tensor."""
    k = _stride(h)
    cart = cartesian_product(g, h)
    tens = tensor_product(g, h)
    e = cart.edges.select("src", "dst").unionByName(
        tens.edges.select("src", "dst")
    )
    return _build(g, h, e, k)


def lexicographic_product(g: SparkGraph, h: SparkGraph) -> SparkGraph:
    """``product.py:339`` — a G-step beats any H-coordinate; ties in the
    first coordinate follow H."""
    k = _stride(h)
    hv = h.vertices
    left = (
        _pairs(g, "u1", "v1")
        .crossJoin(hv.select(F.col("id").alias("u2")))
        .crossJoin(hv.select(F.col("id").alias("v2")))
        .select(
            (F.col("u1") * k + F.col("u2")).alias("src"),
            (F.col("v1") * k + F.col("v2")).alias("dst"),
        )
    )
    right = (
        _pairs(h, "u2", "v2")
        .crossJoin(g.vertices.select(F.col("id").alias("u1")))
        .select(
            (F.col("u1") * k + F.col("u2")).alias("src"),
            (F.col("u1") * k + F.col("v2")).alias("dst"),
        )
    )
    return _build(g, h, left.unionByName(right), k)


def rooted_product(g: SparkGraph, h: SparkGraph, root: int) -> SparkGraph:
    """``product.py:449`` — |G| copies of H glued at ``root``: edges
    ``(g, h1)-(g, h2)`` for every H edge, plus ``(g1, root)-(g2, root)``
    for every G edge. Same BIGINT encoding ``id = u1*stride + u2``."""
    k = _stride(h)
    copies = (
        _pairs(h, "u2", "v2")
        .crossJoin(g.vertices.select(F.col("id").alias("u1")))
        .select(
            (F.col("u1") * k + F.col("u2")).alias("src"),
            (F.col("u1") * k + F.col("v2")).alias("dst"),
        )
    )
    spine = _pairs(g, "u1", "v1").select(
        (F.col("u1") * k + F.lit(int(root))).alias("src"),
        (F.col("v1") * k + F.lit(int(root))).alias("dst"),
    )
    return _build(g, h, copies.unionByName(spine), k)


def corona_product(g: SparkGraph, h: SparkGraph) -> SparkGraph:
    """``product.py:496`` corona G∘H — G itself plus one copy of H per
    G-node, every copy node joined to its G node. Node encoding keeps the
    two spaces disjoint: G node ``u`` → ``u*(kh+1)``; copy node ``(u, w)``
    → ``u*(kh+1) + w + 1`` (``kh`` = H's id stride)."""
    kh = _stride(h)
    stride = kh + 1
    g_nodes = g.vertices.select((F.col("id") * stride).alias("id"))
    copy_nodes = (
        g.vertices.select(F.col("id").alias("u"))
        .crossJoin(h.vertices.select(F.col("id").alias("w")))
        .select((F.col("u") * stride + F.col("w") + 1).alias("id"))
    )
    g_edges = _pairs(g, "u1", "v1").select(
        (F.col("u1") * stride).alias("src"), (F.col("v1") * stride).alias("dst")
    )
    copy_edges = (
        _pairs(h, "w1", "w2")
        .crossJoin(g.vertices.select(F.col("id").alias("u")))
        .select(
            (F.col("u") * stride + F.col("w1") + 1).alias("src"),
            (F.col("u") * stride + F.col("w2") + 1).alias("dst"),
        )
    )
    spokes = (
        g.vertices.select(F.col("id").alias("u"))
        .crossJoin(h.vertices.select(F.col("id").alias("w")))
        .select(
            (F.col("u") * stride).alias("src"),
            (F.col("u") * stride + F.col("w") + 1).alias("dst"),
        )
    )
    directed = g.directed or h.directed
    e = g_edges.unionByName(copy_edges).unionByName(spokes)
    v = g_nodes.unionByName(copy_nodes)
    return SparkGraph(
        e.withColumn("weight", F.lit(1.0)), vertices=v,
        directed=directed, coalesce_edges=True,
    )


def modular_product(g: SparkGraph, h: SparkGraph) -> SparkGraph:
    """``product.py:544`` — (u1,u2)~(v1,v2) iff u1≠v1, u2≠v2 and EITHER
    both coordinate pairs are adjacent OR both are non-adjacent. The
    non-adjacent side is a cross join filtered by anti-joins — O(n²·n²)
    candidates by definition (the reference raises on directed input;
    so does this)."""
    if g.directed or h.directed:
        raise ValueError(
            "modular_product: not implemented for directed graphs"
        )
    k = _stride(h)
    ge = _pairs(g, "u1", "v1")
    he = _pairs(h, "u2", "v2")
    both_adj = ge.crossJoin(he)
    gp = (
        g.vertices.select(F.col("id").alias("u1"))
        .crossJoin(g.vertices.select(F.col("id").alias("v1")))
        .filter(F.col("u1") != F.col("v1"))
        .join(ge, ["u1", "v1"], "left_anti")
    )
    hp = (
        h.vertices.select(F.col("id").alias("u2"))
        .crossJoin(h.vertices.select(F.col("id").alias("v2")))
        .filter(F.col("u2") != F.col("v2"))
        .join(he, ["u2", "v2"], "left_anti")
    )
    both_non = gp.crossJoin(hp)
    e = (
        both_adj.unionByName(both_non)
        .filter((F.col("u1") != F.col("v1")) & (F.col("u2") != F.col("v2")))
        .select(
            (F.col("u1") * k + F.col("u2")).alias("src"),
            (F.col("v1") * k + F.col("v2")).alias("dst"),
        )
    )
    return _build(g, h, e, k)


def power(g: SparkGraph, k: int) -> SparkGraph:
    """``networkx/algorithms/operators/product.py:590`` ``power(G, k)`` —
    edges between every pair at distance <= k. One bounded multi-source
    BFS (``max_depth=k``) over the existing traversal machinery; raises on
    directed input and k <= 0 like the reference."""
    if g.directed:
        raise ValueError("power: not implemented for directed graphs")
    if k <= 0:
        raise ValueError("k must be a positive integer")
    from linkgraph.algos.distance import all_pairs_shortest_path_lengths

    sp = all_pairs_shortest_path_lengths(g, max_depth=k)
    e = (
        sp.filter((F.col("distance") >= 1) & (F.col("source") < F.col("id")))
        .select(
            F.col("source").alias("src"), F.col("id").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    return SparkGraph(
        e, g.vertices.select("id"), directed=False, coalesce_edges=False
    )
