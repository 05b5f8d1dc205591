"""Degree assortativity — Pearson correlation over edge-endpoint degrees.

Semantics match ``networkx/algorithms/assortativity/correlation.py:19``
(``degree_assortativity_coefficient``): the Pearson correlation of the
(source-degree, target-degree) joint distribution over edges. For an
undirected graph every edge contributes both orientations (the mixing
matrix is symmetrized, ``assortativity/mixing.py``); directed graphs use
(out-degree of src, in-degree of dst) by default (x="out", y="in").

One plan: arcs ⋈ deg(src) ⋈ deg(dst) → ``corr()`` aggregate — a single
shuffle pipeline with a scalar result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph import SparkGraph


def degree_assortativity_coefficient(g: SparkGraph, weight=None) -> float:
    """``assortativity/correlation.py:21``: Pearson correlation of the
    degree pairs across every arc. ``weight=`` is the reference's
    weighted form — degrees become STRENGTHS (weighted degree sums)
    while each arc still counts once in the joint distribution
    (``pairs.py:118`` ``node_degree_xy``: unit mass per yielded pair);
    the coefficient is then the plain Pearson over the arc-pair strength
    values."""
    if weight is not None:
        from linkgraph.graph import resolve_weight_column

        base = g.edges if g.directed else g.symmetric_edges()
        arcs = base.select(
            "src", "dst", resolve_weight_column(base, weight).alias("w")
        )
        sx = arcs.groupBy(F.col("src").alias("id")).agg(
            F.sum("w").alias("dx")
        )
        if g.directed:
            sy = arcs.groupBy(F.col("dst").alias("id")).agg(
                F.sum("w").alias("dy")
            )
        else:
            sy = sx.select("id", F.col("dx").alias("dy"))
        joined = (
            arcs.select("src", "dst")
            .join(sx.withColumnRenamed("id", "src"), "src")
            .join(sy.withColumnRenamed("id", "dst"), "dst")
        )
        r = joined.agg(
            F.corr(F.col("dx").cast("double"), F.col("dy").cast("double"))
        ).first()[0]
        return float("nan") if r is None else float(r)
    if g.directed:
        arcs = g.edges.select("src", "dst")
        dx = (
            arcs.groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("dx"))
        )
        dy = (
            arcs.groupBy(F.col("dst").alias("id"))
            .agg(F.count(F.lit(1)).alias("dy"))
        )
        joined = (
            arcs.join(dx.withColumnRenamed("id", "src"), "src")
            .join(dy.withColumnRenamed("id", "dst"), "dst")
        )
    else:
        sym = g.symmetric_edges().select("src", "dst")
        deg = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        joined = (
            sym.join(
                deg.select(F.col("id").alias("src"), F.col("deg").alias("dx")),
                "src",
            ).join(
                deg.select(F.col("id").alias("dst"), F.col("deg").alias("dy")),
                "dst",
            )
        )
    return joined.agg(F.corr(F.col("dx").cast("double"), F.col("dy").cast("double"))).first()[0]


def _attr_arcs(g: SparkGraph, attribute: str, nodes=None):
    """(xa, xb): attribute values at the two ends of every arc (both
    orientations for undirected — the symmetrized mixing matrix).
    ``nodes`` keeps only arcs whose SOURCE endpoint is in the set, the
    reference's ``node_attribute_xy`` restriction."""
    vals = g.node_data(attribute).withColumnRenamed(attribute, "_x")
    arcs = g.symmetric_edges().select("src", "dst")
    if nodes is not None:
        keep = g.spark.createDataFrame(
            [(int(x),) for x in nodes], "src long"
        )
        arcs = arcs.join(keep, "src", "left_semi")
    return (
        arcs.join(vals.select(F.col("id").alias("src"), F.col("_x").alias("xa")), "src")
        .join(vals.select(F.col("id").alias("dst"), F.col("_x").alias("xb")), "dst")
        .select("xa", "xb")
    )


def attribute_assortativity_coefficient(
    g: SparkGraph, attribute: str, nodes=None
) -> float:
    """Categorical assortativity over a node attribute column
    (``correlation.py:192``): r = (tr e − Σ(e·e)) / (1 − Σ(e·e)) for the
    edge-wise joint distribution e of attribute pairs.

    Matrix-free identity: Σ over all entries of e·e equals
    Σ_z rowsum(z)·colsum(z) — so the whole coefficient is three
    aggregations over the attribute-pair arc table, no matrices.
    """
    pairs = _attr_arcs(g, attribute, nodes).persist()
    total = pairs.count()
    if total == 0:
        pairs.unpersist()
        return float("nan")
    tr = pairs.filter(F.col("xa") == F.col("xb")).count() / total
    rows = pairs.groupBy(F.col("xa").alias("z")).agg(
        (F.count(F.lit(1)) / total).alias("rs")
    )
    cols = pairs.groupBy(F.col("xb").alias("z")).agg(
        (F.count(F.lit(1)) / total).alias("cs")
    )
    s = (
        rows.join(cols, "z")
        .agg(F.sum(F.col("rs") * F.col("cs")))
        .first()[0]
        or 0.0
    )
    pairs.unpersist()
    if s == 1.0:
        return float("nan")
    return (tr - s) / (1.0 - s)


def numeric_assortativity_coefficient(g: SparkGraph, attribute: str) -> float:
    """Numeric assortativity over a node attribute column
    (``correlation.py:136``) — the Pearson correlation of the attribute
    values across edges, identical to the reference's mixing-matrix form;
    one ``corr`` aggregate over the arc table."""
    pairs = _attr_arcs(g, attribute).select(
        F.col("xa").cast("double"), F.col("xb").cast("double")
    )
    r = pairs.agg(F.corr("xa", "xb")).first()[0]
    return float("nan") if r is None else float(r)


def attribute_mixing(
    g: SparkGraph, attribute: str, *, nodes=None, normalized: bool = False
):
    """(x, y, n|p): the attribute mixing matrix in long form —
    ``networkx/algorithms/assortativity/mixing.py:63``
    ``attribute_mixing_dict`` (counts; ``normalized=True`` → joint
    probability). Like the reference's ``node_attribute_xy`` iteration,
    undirected non-loop edges contribute in BOTH orientations and
    self-loops once; directed arcs once. One arc⋈attr join + hash
    aggregation; zero-count cells are absent (relational long form instead
    of the dict-of-dicts)."""
    pairs = _attr_arcs(g, attribute, nodes)
    counts = pairs.groupBy(
        F.col("xa").alias("x"), F.col("xb").alias("y")
    ).agg(F.count(F.lit(1)).alias("n"))
    if not normalized:
        return counts
    from pyspark.sql import Window

    total = F.sum("n").over(Window.partitionBy())
    return counts.select("x", "y", (F.col("n") / total).alias("p"))


def degree_mixing(
    g: SparkGraph,
    *,
    x: str = "out",
    y: str = "in",
    weight: str | None = None,
    normalized: bool = False,
):
    """(x, y, n|p): the degree mixing matrix in long form —
    ``mixing.py:147`` ``degree_mixing_dict`` / ``pairs.py:69``
    ``node_degree_xy``. For each arc, the (x-)degree of the source pairs
    with the (y-)degree of the target (undirected graphs use total degree
    on both ends and count each edge in both orientations, like the
    reference's generator)."""
    from linkgraph.algos.degrees import degrees, in_degrees, out_degrees

    if g.directed:
        table = {"out": out_degrees, "in": in_degrees}
        dx = table[x](g, weight is not None, weight=weight)
        dy = table[y](g, weight is not None, weight=weight)
        arcs = g.edges.select("src", "dst")
    else:
        # symmetric arcs: non-loop edges in both orientations, self-loops
        # once — exactly the reference generator's per-edge yields
        dx = dy = degrees(g, weight is not None, weight=weight)
        arcs = g.symmetric_edges().select("src", "dst")
    pairs = arcs.join(
        dx.select(F.col("id").alias("src"), F.col("degree").alias("dx")), "src"
    ).join(dy.select(F.col("id").alias("dst"), F.col("degree").alias("dy")), "dst")
    counts = pairs.groupBy(
        F.col("dx").alias("x"), F.col("dy").alias("y")
    ).agg(F.count(F.lit(1)).alias("n"))
    if not normalized:
        return counts
    from pyspark.sql import Window

    total = F.sum("n").over(Window.partitionBy())
    return counts.select("x", "y", (F.col("n") / total).alias("p"))


def degree_pearson_correlation_coefficient(g: SparkGraph, weight=None) -> float:
    """Alias of :func:`degree_assortativity_coefficient` — the reference
    computes the identical Pearson r via scipy (``correlation.py:211``)."""
    return degree_assortativity_coefficient(g, weight=weight)


def node_degree_xy(
    g: SparkGraph, x: str = "out", y: str = "in", weight=None
) -> DataFrame:
    """(x, y) degree pairs, one row per arc
    (``assortativity/pairs.py:118`` ``node_degree_xy``): the long form
    behind the degree mixing matrix (undirected arcs in both
    orientations, like the reference generator; ``weight=`` makes the
    values strengths, the arc count stays 1 per arc)."""
    from linkgraph.algos.degrees import degrees, in_degrees, out_degrees

    weighted = weight is not None
    if g.directed:
        table = {"out": out_degrees, "in": in_degrees}
        dx = table[x](g, weighted, weight=weight)
        dy = table[y](g, weighted, weight=weight)
        arcs = g.edges.select("src", "dst")
    else:
        dx = dy = degrees(g, weighted, weight=weight)
        arcs = g.symmetric_edges().select("src", "dst")
    return (
        arcs.join(
            dx.select(F.col("id").alias("src"), F.col("degree").alias("x")), "src"
        )
        .join(dy.select(F.col("id").alias("dst"), F.col("degree").alias("y")), "dst")
        .select("x", "y")
    )


def node_attribute_xy(g: SparkGraph, attribute: str) -> DataFrame:
    """(x, y) attribute pairs per arc (``pairs.py:13``)."""
    return _attr_arcs(g, attribute).select(
        F.col("xa").alias("x"), F.col("xb").alias("y")
    )


def degree_mixing_dict(g: SparkGraph, weight=None) -> dict:
    """{x: {y: count}} (``mixing.py:110`` ``degree_mixing_dict``,
    normalized=False) — driver dict over the distributed long form
    (``weight=`` keys by strengths, which may be floats)."""
    conv = int if weight is None else float
    out: dict = {}
    for r in degree_mixing(g, weight=weight).collect():
        out.setdefault(conv(r["x"]), {})[conv(r["y"])] = int(r["n"])
    return out


def attribute_mixing_dict(
    g: SparkGraph, attribute: str, nodes=None, normalized: bool = False
) -> dict:
    """{x: {y: count-or-probability}} (``mixing.py:13``
    ``attribute_mixing_dict``; ``nodes``/``normalized`` per the
    reference)."""
    out: dict = {}
    key = "p" if normalized else "n"
    for r in attribute_mixing(
        g, attribute, nodes=nodes, normalized=normalized
    ).collect():
        out.setdefault(r["x"], {})[r["y"]] = (
            float(r[key]) if normalized else int(r[key])
        )
    return out


def mixing_dict(xy: DataFrame, *, normalized: bool = False) -> dict:
    """{x: {y: count-or-probability}} from a two-column pair DataFrame
    (``mixing.py:223`` ``mixing_dict``)."""
    a, b = xy.columns[0], xy.columns[1]
    rows = (
        xy.groupBy(F.col(a).alias("x"), F.col(b).alias("y"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    tot = float(sum(r["n"] for r in rows)) or 1.0
    out: dict = {}
    for r in rows:
        out.setdefault(r["x"], {})[r["y"]] = (
            r["n"] / tot if normalized else int(r["n"])
        )
    return out


def degree_mixing_matrix(
    g: SparkGraph, *, weight=None, normalized: bool = True
):
    """(matrix, mapping) — dense degree mixing matrix
    (``mixing.py:147``); mapping = degree value → row index
    (``weight=`` keys by strengths)."""
    import numpy as np

    conv = int if weight is None else float
    rows = degree_mixing(g, weight=weight).collect()
    vals = sorted({conv(r["x"]) for r in rows} | {conv(r["y"]) for r in rows})
    idx = {v: i for i, v in enumerate(vals)}
    M = np.zeros((len(vals), len(vals)))
    for r in rows:
        M[idx[conv(r["x"])], idx[conv(r["y"])]] = r["n"]
    if normalized and M.sum() > 0:
        M = M / M.sum()
    return M, idx


def attribute_mixing_matrix(
    g: SparkGraph, attribute: str, *, nodes=None, mapping=None,
    normalized: bool = True,
):
    """(matrix, mapping) — dense attribute mixing matrix
    (``mixing.py:61``; ``mapping`` pins value → index like the
    reference, ``nodes`` restricts the arc sweep)."""
    import numpy as np

    rows = attribute_mixing(g, attribute, nodes=nodes).collect()
    if mapping is not None:
        idx = dict(mapping)
    else:
        vals = sorted({r["x"] for r in rows} | {r["y"] for r in rows})
        idx = {v: i for i, v in enumerate(vals)}
    k = max(idx.values()) + 1 if idx else 0
    M = np.zeros((k, k))
    for r in rows:
        M[idx[r["x"]], idx[r["y"]]] = r["n"]
    if normalized and M.sum() > 0:
        M = M / M.sum()
    return M, idx
