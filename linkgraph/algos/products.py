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
