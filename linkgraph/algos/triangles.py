"""Per-vertex triangle counting and clustering coefficients.

Semantics match ``networkx/algorithms/cluster.py``:

- ``triangles`` (``cluster.py:22``, core loop ``:76-95``): number of
  triangles through each node of an undirected simple graph; each triangle
  credited to all three corners; self-loops ignored (``cluster.py:61``);
  parallel edges collapse (simple-graph view).
- ``clustering`` (``cluster.py:385-411``): ``c_v = 2 T(v) / (d_v (d_v - 1))``
  with d the number of distinct neighbors excluding self; 0 when ``d < 2``.
- ``transitivity`` (``cluster.py:500``): ``3 * triangles / wedges``.
- ``average_clustering`` (``cluster.py:325``): mean of ``c_v`` over all
  nodes (zeros included by default).

Distributed plan (the reference's neighbor-set intersection
``cluster.py:88-94`` becomes a self-join):

1. Canonicalize to a simple undirected edge set, drop self-loops.
2. **Degree-orient** each edge from the lower (degree, id) endpoint to the
   higher — the classic skew-killer: every out-neighborhood has size
   O(sqrt(m)), so the wedge self-join on hub vertices cannot explode even on
   power-law graphs.
3. Wedges: self-join oriented edges on their center; close each wedge with a
   semi-join against the canonical edge set. Each triangle is found exactly
   once (at its unique minimum-rank corner).
4. Per-node counts: explode the three corners, groupBy-count (map-side
   partial agg), right-join vertices to keep zeros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph
from linkgraph.exceptions import NotImplementedForDirected


def _simple_edges(g: SparkGraph) -> DataFrame:
    """Canonical (u < v) simple undirected edge set, self-loops removed.

    Raises on directed input like the reference's
    ``@not_implemented_for("directed")`` on ``triangles``/``clustering``
    (``networkx/algorithms/cluster.py:20,383``) — the directed clustering
    formula (``cluster.py:413-470``) is a different quantity, so silently
    canonicalizing would return wrong-by-construction numbers. Use
    ``g.undirected_view()`` explicitly to opt into the undirected
    projection.
    """
    if g.directed:
        raise NotImplementedForDirected(
            "triangles/clustering: not implemented for directed type; "
            "use g.undirected_view() for the underlying undirected graph"
        )
    return (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )


def _triangle_corners(g: SparkGraph) -> DataFrame:
    """DataFrame (a, b, c): each triangle once, corners in orientation order."""
    e = _simple_edges(g).persist()

    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    # Orient u -> v when (deg_u, u) < (deg_v, v): acyclic total order.
    with_deg = (
        e.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
    )
    oriented = with_deg.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
        .alias("o")
    ).select(F.col("o.s").alias("s"), F.col("o.d").alias("d"))
    oriented = oriented.persist()

    w1 = oriented.select(F.col("s").alias("ctr"), F.col("d").alias("x"))
    w2 = oriented.select(F.col("s").alias("ctr"), F.col("d").alias("y"))
    wedges = w1.join(w2, "ctr").filter(F.col("x") < F.col("y"))

    closed = wedges.join(
        e,
        (F.least("x", "y") == F.col("u")) & (F.greatest("x", "y") == F.col("v")),
        "left_semi",
    )
    return closed.select(
        F.col("ctr").alias("a"), F.col("x").alias("b"), F.col("y").alias("c")
    )


def all_triangles(g: SparkGraph) -> DataFrame:
    """Enumerate each triangle once (``cluster.py:260`` ``all_triangles``),
    corners sorted ascending."""
    t = _triangle_corners(g)
    arr = F.array_sort(F.array("a", "b", "c"))
    return t.select(
        arr[0].alias("n1"), arr[1].alias("n2"), arr[2].alias("n3")
    )


def triangles(g: SparkGraph) -> DataFrame:
    """DataFrame (id, triangles) — per-vertex counts, exact
    (``cluster.py:22``)."""
    corners = _triangle_corners(g)
    counts = (
        corners.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return g.vertices.select("id").join(counts, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def triangle_count(g: SparkGraph) -> int:
    """Total number of distinct triangles: sum(per-vertex)/3
    (``cluster.py:52-57``)."""
    return _triangle_corners(g).count()


def _tri_deg(g: SparkGraph) -> DataFrame:
    """(id, triangles, deg) with deg = distinct non-self neighbors."""
    e = _simple_edges(g)
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return triangles(g).join(deg, "id", "left").select(
        "id", "triangles", F.coalesce("deg", F.lit(0)).alias("deg")
    )


def clustering(g: SparkGraph, nodes=None, weight=None) -> DataFrame:
    """DataFrame (id, clustering) — local clustering coefficient
    (``cluster.py:385-411``).

    ``weight=`` is the reference's weighted (geometric-mean) form
    (``cluster.py:430`` ``_weighted_triangles_and_degree_iter``):
    c_u = 2/(d(d−1)) · Σ_triangles (ŵ_uv · ŵ_uw · ŵ_vw)^{1/3} with each
    weight normalized by the graph's maximum — computed here by joining
    the three corner-pair weights onto the same degree-oriented triangle
    enumeration (three broadcast-size joins on the canonical edge key,
    no new wedge pass)."""
    if nodes is not None:
        keep = g.spark.createDataFrame(
            [(int(x),) for x in nodes], "id long"
        )
        return clustering(g, weight=weight).join(keep, "id", "left_semi")
    if weight is None:
        td = _tri_deg(g)
        return td.select(
            "id",
            F.when(
                F.col("deg") < 2, F.lit(0.0)
            ).otherwise(
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1))
            ).alias("clustering"),
        )
    from linkgraph.graph import resolve_weight_column

    base = _simple_edges(g)  # validates undirectedness
    raw = g.edges.filter(F.col("src") != F.col("dst"))
    ew = (
        raw.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            resolve_weight_column(raw, weight).alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.max("w").alias("w"))
    )
    mx = ew.agg(F.max("w")).first()[0]
    if mx is None or mx == 0:
        mx = 1.0
    nw = ew.select("u", "v", (F.col("w") / F.lit(float(mx))).alias("w")).persist()

    def _wjoin(df, x, y, name):
        side = nw.select(
            F.col("u").alias("_u"), F.col("v").alias("_v"), F.col("w").alias(name)
        )
        return df.join(
            side,
            (F.least(x, y) == F.col("_u")) & (F.greatest(x, y) == F.col("_v")),
        ).drop("_u", "_v")

    t = _wjoin(_triangle_corners(g), F.col("a"), F.col("b"), "w_ab")
    t = _wjoin(t, F.col("a"), F.col("c"), "w_ac")
    t = _wjoin(t, F.col("b"), F.col("c"), "w_bc")
    term = F.cbrt(F.col("w_ab") * F.col("w_ac") * F.col("w_bc"))
    per = (
        t.select(F.explode(F.array("a", "b", "c")).alias("id"), term.alias("t"))
        .groupBy("id")
        .agg(F.sum("t").alias("wt"))
    )
    deg = (
        base.select(F.col("u").alias("id"))
        .unionAll(base.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    out = (
        g.vertices.select("id")
        .join(per, "id", "left")
        .join(deg, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("deg", F.lit(0)) < 2, F.lit(0.0)
            )
            .otherwise(
                2.0
                * F.coalesce("wt", F.lit(0.0))
                / (F.col("deg") * (F.col("deg") - 1))
            )
            .alias("clustering"),
        )
    )
    return out


def average_clustering(
    g: SparkGraph, nodes=None, weight=None, count_zeros: bool = True
) -> float:
    """``cluster.py:325`` (``weight=`` averages the weighted form;
    ``nodes=`` averages over that subset like the reference)."""
    c = clustering(g, nodes=nodes, weight=weight)
    if not count_zeros:
        c = c.filter(F.col("clustering") > 0)
    return c.agg(F.avg("clustering")).first()[0] or 0.0


def transitivity(g: SparkGraph) -> float:
    """``cluster.py:500``: 3*triangles / wedges (0 when no wedges)."""
    td = _tri_deg(g)
    row = td.agg(
        F.sum("triangles").alias("t"),
        F.sum(F.col("deg") * (F.col("deg") - 1)).alias("w"),
    ).first()
    t, w = row["t"] or 0, row["w"] or 0
    return 0.0 if w == 0 else 2.0 * t / w


def square_clustering(g: SparkGraph) -> DataFrame:
    """DataFrame (id, square_clustering) — C4 coefficient
    (``cluster.py:590``, Lind et al. 2005 / Zhang et al. 2008 form).

    Relational reformulation of the reference's per-node set loops: with
    P(v,a) = |N(v) ∩ N(a)| (the wedge pair-count table — one self-join on
    the wedge center; cost O(Σ deg²), the same neighbor-of-neighbor volume
    the reference scans — unlike triangles this cannot be degree-oriented
    down to O(m^1.5) because BOTH wedge orientations are needed),

    - squares(v)        = Σ_a P(v,a)·(P(v,a)−1) / 2
    - triangles_term(v) = Σ_{a∈N(v)} P(v,a)      (= 2·T(v))
    - uw_degrees(v)     = (k_v−1) · Σ_{u∈N(v)} k_u,  uw_count = k_v(k_v−1)
    - C4(v) = squares / (uw_degrees − uw_count − triangles_term − squares),
      0 when k_v ≤ 1 or the denominator is ≤ 0 — exactly the reference's
      accumulator algebra, so values match to the double.
    """
    e = _simple_edges(g)
    sym = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    deg = sym.groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("k"))
    # wedge pair counts P(v, a), v != a
    pairs = (
        sym.alias("x")
        .join(sym.alias("y"), F.col("x.u") == F.col("y.u"))
        .filter(F.col("x.v") != F.col("y.v"))
        .groupBy(F.col("x.v").alias("id"), F.col("y.v").alias("a"))
        .agg(F.count(F.lit(1)).alias("p2"))
    ).persist()
    sq = pairs.groupBy("id").agg(
        (F.sum(F.col("p2") * (F.col("p2") - 1)) / 2).alias("squares")
    )
    tri = (
        pairs.join(
            sym.select(F.col("u").alias("id"), F.col("v").alias("a")), ["id", "a"]
        )
        .groupBy("id")
        .agg(F.sum("p2").alias("tterm"))
    )
    sumdeg = (
        sym.join(deg.select(F.col("id").alias("v"), F.col("k").alias("ku")), "v")
        .groupBy(F.col("u").alias("id"))
        .agg(F.sum("ku").alias("sumk"))
    )
    out = (
        g.vertices.select("id")
        .join(deg, "id", "left")
        .join(sq, "id", "left")
        .join(tri, "id", "left")
        .join(sumdeg, "id", "left")
        .select(
            "id",
            F.coalesce("k", F.lit(0)).alias("k"),
            F.coalesce("squares", F.lit(0.0)).alias("squares"),
            F.coalesce("tterm", F.lit(0)).alias("tterm"),
            F.coalesce("sumk", F.lit(0)).alias("sumk"),
        )
        .select(
            "id",
            F.when(F.col("k") <= 1, F.lit(0.0))
            .otherwise(
                F.when(
                    (F.col("k") - 1) * F.col("sumk")
                    - F.col("k") * (F.col("k") - 1)
                    - F.col("tterm")
                    - F.col("squares")
                    > 0,
                    F.col("squares")
                    / (
                        (F.col("k") - 1) * F.col("sumk")
                        - F.col("k") * (F.col("k") - 1)
                        - F.col("tterm")
                        - F.col("squares")
                    ),
                ).otherwise(F.lit(0.0))
            )
            .alias("square_clustering"),
        )
    )
    out = out.localCheckpoint(eager=True)
    sym.unpersist()
    pairs.unpersist()
    return out
