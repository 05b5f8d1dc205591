"""Cut and expansion measures for node-set partitions.

Reference semantics (networkx 3.6.1, ``networkx/algorithms/cuts.py``):

- ``cut_size(G, S, T=None, weight=None)`` (``cuts.py:12``): total weight of
  edges between ``S`` and ``T`` (complement of ``S`` when omitted). Directed
  graphs count both directions (S→T plus T→S); multigraph edges count with
  multiplicity.
- ``volume(G, S, weight=None)`` (``cuts.py:68``): sum of (out-)degrees over
  ``S`` — i.e. the total weight of arcs leaving members of ``S``; undirected
  self-loops contribute twice, like the reference's ``G.degree``.
- ``normalized_cut_size`` (``cuts.py:104``): ``cut * (1/vol(S) + 1/vol(T))``.
- ``conductance`` (``cuts.py:149``): ``cut / min(vol(S), vol(T))``.
- ``edge_expansion`` (``cuts.py:188``): ``cut / min(|S|, |T|)``.
- ``mixing_expansion`` (``cuts.py:222``): ``cut / (2 m)``.
- ``node_expansion`` (``cuts.py:252``): ``|N(S)| / |S|`` where ``N(S)`` is
  the union of the members' neighborhoods (members themselves included when
  they neighbor another member — the reference does not subtract ``S``).
- ``boundary_expansion`` (``cuts.py:278``): ``|∂S| / |S|`` with ``∂S`` the
  node boundary (strictly outside ``S``).

Every measure is one or two hash-aggregations over a semi-join of the arc
table against the (typically tiny, broadcast) node sets — no shuffle wider
than the groupBy, and the arc scan is shared: ``_cut_and_volumes`` computes
the cut weight and both volumes in a single pass so the ratio measures do
not rescan the edges per term. At 100 TB the node-set side is the natural
broadcast build side; the edge table is only ever scanned, never shuffled.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph

__all__ = [
    "cut_size",
    "volume",
    "normalized_cut_size",
    "conductance",
    "edge_expansion",
    "mixing_expansion",
    "node_expansion",
    "boundary_expansion",
]


def _ids(df: DataFrame) -> DataFrame:
    return df.select(F.col(df.columns[0]).cast("long").alias("id")).distinct()


def _w(weight: Optional[str]):
    return F.lit(1.0) if weight is None else F.coalesce(
        F.col(weight).cast("double"), F.lit(1.0)
    )


def _arcs(g: SparkGraph, weight: Optional[str]) -> DataFrame:
    """Directed arc table (src, dst, w): each undirected edge appears in
    both orientations so "arcs leaving u" is exactly the reference's degree
    contribution (self-loops appear twice, matching ``G.degree``)."""
    if g.directed:
        return g.edges.select("src", "dst", _w(weight).alias("w"))
    # symmetric_edges emits self-loops once; the reference's degree counts
    # them twice, so append the loop rows a second time
    base = g.symmetric_edges().unionAll(g.edges.filter(F.col("src") == F.col("dst")))
    return base.select("src", "dst", _w(weight).alias("w"))


def _cut_and_volumes(
    g: SparkGraph, S: DataFrame, T: Optional[DataFrame], weight: Optional[str]
):
    """One arc-table pass → (cut_weight, vol(S), vol(T)).

    Tags every arc with src/dst membership via two broadcast semi-joins,
    then takes three conditional sums in a single aggregation. ``T=None``
    means the complement of ``S``. Undirected cut edges are halved (each
    crossing edge appears in both orientations of the symmetric arc table);
    directed cuts keep both directions, like the reference.
    """
    s = _ids(S)
    arcs = _arcs(g, weight)
    tagged = arcs.join(
        F.broadcast(s.withColumnRenamed("id", "src").withColumn("_in_s", F.lit(True))),
        "src",
        "left",
    ).join(
        F.broadcast(
            s.withColumnRenamed("id", "dst").withColumn("_in_s_dst", F.lit(True))
        ),
        "dst",
        "left",
    )
    if T is None:
        in_t_src = F.col("_in_s").isNull()
        in_t_dst = F.col("_in_s_dst").isNull()
    else:
        t = _ids(T)
        tagged = tagged.join(
            F.broadcast(
                t.withColumnRenamed("id", "src").withColumn("_in_t", F.lit(True))
            ),
            "src",
            "left",
        ).join(
            F.broadcast(
                t.withColumnRenamed("id", "dst").withColumn("_in_t_dst", F.lit(True))
            ),
            "dst",
            "left",
        )
        in_t_src = F.col("_in_t").isNotNull()
        in_t_dst = F.col("_in_t_dst").isNotNull()
    crossing = (F.col("_in_s").isNotNull() & in_t_dst) | (
        in_t_src & F.col("_in_s_dst").isNotNull()
    )
    row = tagged.agg(
        F.sum(F.when(crossing, F.col("w")).otherwise(F.lit(0.0))).alias("cut"),
        F.sum(
            F.when(F.col("_in_s").isNotNull(), F.col("w")).otherwise(F.lit(0.0))
        ).alias("vol_s"),
        F.sum(F.when(in_t_src, F.col("w")).otherwise(F.lit(0.0))).alias("vol_t"),
    ).first()
    cut = float(row["cut"] or 0.0)
    if not g.directed:
        cut /= 2.0
    return cut, float(row["vol_s"] or 0.0), float(row["vol_t"] or 0.0)


def cut_size(
    g: SparkGraph,
    S: DataFrame,
    T: Optional[DataFrame] = None,
    *,
    weight: Optional[str] = None,
) -> float:
    """Total weight of edges between ``S`` and ``T`` (``cuts.py:12``)."""
    return _cut_and_volumes(g, S, T, weight)[0]


def volume(g: SparkGraph, S: DataFrame, *, weight: Optional[str] = None) -> float:
    """Sum of (out-)degrees over ``S`` (``cuts.py:68``)."""
    s = _ids(S)
    row = (
        _arcs(g, weight)
        .join(F.broadcast(s.withColumnRenamed("id", "src")), "src", "left_semi")
        .agg(F.sum("w").alias("v"))
        .first()
    )
    return float(row["v"] or 0.0)


def normalized_cut_size(
    g: SparkGraph,
    S: DataFrame,
    T: Optional[DataFrame] = None,
    *,
    weight: Optional[str] = None,
) -> float:
    """``cut * (1/vol(S) + 1/vol(T))`` (``cuts.py:104``)."""
    cut, vol_s, vol_t = _cut_and_volumes(g, S, T, weight)
    return cut * (1.0 / vol_s + 1.0 / vol_t)


def conductance(
    g: SparkGraph,
    S: DataFrame,
    T: Optional[DataFrame] = None,
    *,
    weight: Optional[str] = None,
) -> float:
    """``cut / min(vol(S), vol(T))`` (``cuts.py:149``)."""
    cut, vol_s, vol_t = _cut_and_volumes(g, S, T, weight)
    return cut / min(vol_s, vol_t)


def edge_expansion(
    g: SparkGraph,
    S: DataFrame,
    T: Optional[DataFrame] = None,
    *,
    weight: Optional[str] = None,
) -> float:
    """``cut / min(|S|, |T|)`` (``cuts.py:188``)."""
    cut = cut_size(g, S, T, weight=weight)
    n_s = _ids(S).count()
    n_t = (
        _ids(T).count()
        if T is not None
        else g.number_of_nodes() - n_s
    )
    return cut / min(n_s, n_t)


def mixing_expansion(
    g: SparkGraph,
    S: DataFrame,
    T: Optional[DataFrame] = None,
    *,
    weight: Optional[str] = None,
) -> float:
    """``cut / (2 m)`` (``cuts.py:222``)."""
    return cut_size(g, S, T, weight=weight) / (2.0 * g.number_of_edges())


def node_expansion(g: SparkGraph, S: DataFrame) -> float:
    """``|N(S)| / |S|`` — neighborhood union NOT excluding ``S`` itself
    (``cuts.py:252``)."""
    s = _ids(S)
    arcs = g.edges if g.directed else g.symmetric_edges()
    nbrs = (
        arcs.join(F.broadcast(s.withColumnRenamed("id", "src")), "src", "left_semi")
        .select(F.col("dst").alias("id"))
        .distinct()
        .count()
    )
    return nbrs / s.count()


def boundary_expansion(g: SparkGraph, S: DataFrame) -> float:
    """``|node_boundary(S)| / |S|`` (``cuts.py:278``)."""
    from linkgraph.algos.neighborhood import node_boundary

    return node_boundary(g, S).count() / _ids(S).count()
