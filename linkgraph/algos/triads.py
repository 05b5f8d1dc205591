"""Triadic census for directed graphs (Davis–Leinhardt M-A-N types).

Reference: ``networkx/algorithms/triads.py:126`` ``triadic_census`` — the
count of every 3-node induced subgraph class (003, 012, 102, 021D, 021U,
021C, 111D, 111U, 030T, 030C, 201, 120D, 120U, 120C, 210, 300) over all
C(n,3) triples.

Distributed plan — no triple is ever enumerated unless at least two of its
dyads are connected:

1. **Dyads**: one aggregation over the arc table → per adjacent pair
   (a < b) whether each direction is present (mutual vs asymmetric).
2. **Connected triples** (≥2 connected dyads): the wedge self-join of the
   dyad graph, deduplicated on the sorted triple; each triple's 6 possible
   arcs become one bit each, and a 64-row broadcast lookup (derived at
   call time by brute-force isomorphism over the 6 node permutations — no
   hard-coded census table) maps the bit code to its class.
3. **One-dyad triples** (types 012/102) in closed form per dyad: the third
   node must avoid both endpoints' neighborhoods —
   n − 2 − (d_a − 1) − (d_b − 1) + |N(a) ∩ N(b)|.
4. **003** is the arithmetic remainder of C(n,3).

The wedge join is the only super-linear step (O(Σ deg²), the same
neighbor-of-neighbor volume the reference's per-node loop scans).
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph

__all__ = ["triadic_census"]

# canonical representatives of the 16 triad classes on nodes (0, 1, 2),
# standard Davis-Leinhardt diagrams (arc sets)
_REPRESENTATIVES = {
    "003": (),
    "012": ((0, 1),),
    "102": ((0, 1), (1, 0)),
    "021D": ((1, 0), (1, 2)),
    "021U": ((0, 1), (2, 1)),
    "021C": ((0, 1), (1, 2)),
    "111D": ((0, 1), (1, 0), (2, 1)),
    "111U": ((0, 1), (1, 0), (1, 2)),
    "030T": ((0, 1), (2, 1), (0, 2)),
    "030C": ((0, 1), (1, 2), (2, 0)),
    "201": ((0, 1), (1, 0), (1, 2), (2, 1)),
    "120D": ((1, 0), (1, 2), (0, 2), (2, 0)),
    "120U": ((0, 1), (2, 1), (0, 2), (2, 0)),
    "120C": ((0, 1), (1, 2), (0, 2), (2, 0)),
    "210": ((0, 1), (1, 0), (1, 2), (2, 1), (0, 2)),
    "300": ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)),
}

# bit index for arc (i, j) among the 6 ordered pairs of (0, 1, 2)
_BIT = {(0, 1): 1, (1, 0): 2, (0, 2): 4, (2, 0): 8, (1, 2): 16, (2, 1): 32}


def _code(arcs) -> int:
    return sum(_BIT[a] for a in arcs)


def _code_to_name() -> dict:
    """Map every 64 arc configuration to its class name by brute-force
    isomorphism against the canonical representatives."""
    rep_codes = {}
    for name, arcs in _REPRESENTATIVES.items():
        arcset = set(arcs)
        for perm in permutations(range(3)):
            c = _code((perm[i], perm[j]) for i, j in arcset)
            rep_codes[c] = name
    assert len(rep_codes) == 64
    return rep_codes


def triadic_census(g: SparkGraph) -> DataFrame:
    """(triad_type STRING, count LONG): all 16 class counts
    (``triads.py:126``); requires a directed graph like the reference."""
    if not g.directed:
        raise ValueError("triadic_census: not defined for undirected graphs")
    arcs = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    n = g.number_of_nodes()

    dyads = (
        arcs.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            (F.col("src") < F.col("dst")).alias("fwd"),
        )
        .groupBy("a", "b")
        .agg(
            F.max(F.when(F.col("fwd"), 1).otherwise(0)).alias("f"),
            F.max(F.when(~F.col("fwd"), 1).otherwise(0)).alias("r"),
        )
        .persist()
    )

    # ---- triples with >=2 connected dyads --------------------------- #
    und = dyads.select("a", "b")
    sym = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    triples = (
        sym.alias("x")
        .join(sym.alias("y"), F.col("x.a") == F.col("y.a"))
        .filter(F.col("x.b") < F.col("y.b"))
        .select(
            F.array_sort(F.array("x.a", "x.b", "y.b")).alias("t")
        )
        .select(F.col("t")[0].alias("u"), F.col("t")[1].alias("v"), F.col("t")[2].alias("w"))
        .distinct()
    )
    dy = dyads.select("a", "b", "f", "r")

    def _join_state(df, x, y, fbit, rbit):
        d = dy.select(
            F.col("a").alias(x), F.col("b").alias(y),
            (F.col("f") * fbit + F.col("r") * rbit).alias(f"c_{x}{y}"),
        )
        return df.join(d, [x, y], "left")

    coded = _join_state(triples, "u", "v", 1, 2)
    coded = _join_state(coded, "u", "w", 4, 8)
    coded = _join_state(coded, "v", "w", 16, 32)
    coded = coded.select(
        (
            F.coalesce("c_uv", F.lit(0))
            + F.coalesce("c_uw", F.lit(0))
            + F.coalesce("c_vw", F.lit(0))
        ).alias("code")
    )
    lookup = g.spark.createDataFrame(
        [(c, nm) for c, nm in _code_to_name().items()], "code int, triad_type string"
    )
    multi = (
        coded.join(F.broadcast(lookup), "code")
        .groupBy("triad_type")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    multi_counts = {r["triad_type"]: r["count"] for r in multi.collect()}

    # ---- single-dyad triples (012 / 102), closed form per dyad ------ #
    deg_any = (
        sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    )
    cn = (
        sym.alias("p")
        .join(sym.alias("q"), F.col("p.b") == F.col("q.b"))
        .filter(F.col("p.a") < F.col("q.a"))
        .groupBy(F.col("p.a").alias("a"), F.col("q.a").alias("b"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    per_dyad = (
        dyads.join(deg_any.withColumnRenamed("id", "a").withColumnRenamed("d", "da"), "a")
        .join(deg_any.withColumnRenamed("id", "b").withColumnRenamed("d", "db"), "b")
        .join(cn, ["a", "b"], "left")
        .select(
            (F.col("f") * F.col("r")).alias("mutual"),
            (
                F.lit(n - 2)
                - (F.col("da") - 1)
                - (F.col("db") - 1)
                + F.coalesce("cn", F.lit(0))
            ).alias("third"),
        )
    )
    row = per_dyad.agg(
        F.sum(F.when(F.col("mutual") == 1, F.col("third")).otherwise(0)).alias("m102"),
        F.sum(F.when(F.col("mutual") == 0, F.col("third")).otherwise(0)).alias("m012"),
    ).first()
    arcs.unpersist()
    dyads.unpersist()

    counts = {k: 0 for k in _REPRESENTATIVES}
    counts.update(multi_counts)
    counts["102"] += int(row["m102"] or 0)
    counts["012"] += int(row["m012"] or 0)
    total = n * (n - 1) * (n - 2) // 6
    counts["003"] = total - sum(v for k, v in counts.items() if k != "003")
    return g.spark.createDataFrame(
        sorted(counts.items()), "triad_type string, count long"
    )


def triads_by_type(g: SparkGraph) -> DataFrame:
    """(u, v, w, triad_type): the triad class of every CONNECTED triple
    (>= 2 connected dyads) — the per-triple long form of
    ``networkx/algorithms/triads.py`` ``triads_by_type``.

    The reference materializes ALL C(n, 3) triad subgraphs — Θ(n³) output
    dominated by the disconnected classes. The relational form enumerates
    only triples joined through a shared node (the same two-dyad join the
    census uses); the omitted 003/012/102 populations are exactly the
    census counts minus these rows (``triadic_census``), so nothing is
    lost at 1/n² of the output."""
    if not g.directed:
        raise ValueError("triads_by_type: not defined for undirected graphs")
    arcs = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    dyads = (
        arcs.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            (F.col("src") < F.col("dst")).alias("fwd"),
        )
        .groupBy("a", "b")
        .agg(
            F.max(F.when(F.col("fwd"), 1).otherwise(0)).alias("f"),
            F.max(F.when(~F.col("fwd"), 1).otherwise(0)).alias("r"),
        )
        .persist()
    )
    und = dyads.select("a", "b")
    sym = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    triples = (
        sym.alias("x")
        .join(sym.alias("y"), F.col("x.a") == F.col("y.a"))
        .filter(F.col("x.b") < F.col("y.b"))
        .select(F.array_sort(F.array("x.a", "x.b", "y.b")).alias("t"))
        .select(
            F.col("t")[0].alias("u"), F.col("t")[1].alias("v"), F.col("t")[2].alias("w")
        )
        .distinct()
    )
    dy = dyads.select("a", "b", "f", "r")

    def _join_state(df, x, y, fbit, rbit):
        d = dy.select(
            F.col("a").alias(x), F.col("b").alias(y),
            (F.col("f") * fbit + F.col("r") * rbit).alias(f"c_{x}{y}"),
        )
        return df.join(d, [x, y], "left")

    coded = _join_state(triples, "u", "v", 1, 2)
    coded = _join_state(coded, "u", "w", 4, 8)
    coded = _join_state(coded, "v", "w", 16, 32)
    coded = coded.select(
        "u", "v", "w",
        (
            F.coalesce("c_uv", F.lit(0))
            + F.coalesce("c_uw", F.lit(0))
            + F.coalesce("c_vw", F.lit(0))
        ).alias("code"),
    )
    lookup = g.spark.createDataFrame(
        [(c, nm) for c, nm in _code_to_name().items()], "code int, triad_type string"
    )
    return coded.join(F.broadcast(lookup), "code").select(
        "u", "v", "w", "triad_type"
    )


def is_triad(g: SparkGraph) -> bool:
    """True iff g is a directed graph on exactly three nodes with no
    self-loops (``triads.py`` ``is_triad``)."""
    if not g.directed:
        return False
    if g.number_of_nodes() != 3:
        return False
    return g.selfloop_edges().limit(1).count() == 0


def triad_type(g: SparkGraph) -> str:
    """The Davis–Leinhardt class name of a 3-node digraph
    (``triads.py`` ``triad_type``)."""
    if not is_triad(g):
        raise ValueError("triad_type: G is not a triad (directed, 3 nodes)")
    ids = sorted(r["id"] for r in g.vertices.select("id").collect())
    pos = {v: i for i, v in enumerate(ids)}
    arcs = [
        (pos[r["src"]], pos[r["dst"]])
        for r in g.edges.select("src", "dst").distinct().collect()
        if r["src"] != r["dst"]
    ]
    return _code_to_name()[_code(arcs)]


def all_triads(g: SparkGraph) -> DataFrame:
    """(u, v, w, arcs ARRAY<STRUCT<src, dst>>): every C(n, 3) node triple
    with its induced arc list (``triads.py`` ``all_triads`` — the
    reference yields one subgraph view per triple; the relational twin
    carries the same information as one row per triple).

    Output is Θ(n³) BY DEFINITION — the caller owns that choice, exactly
    as consuming the reference's generator would. The induced arcs come
    from three membership joins, never a per-triple loop."""
    if not g.directed:
        raise ValueError("all_triads: not defined for undirected graphs")
    ids = g.vertices.select("id")
    t = (
        ids.select(F.col("id").alias("u"))
        .join(ids.select(F.col("id").alias("v")), F.col("u") < F.col("v"))
        .join(ids.select(F.col("id").alias("w")), F.col("v") < F.col("w"))
        .withColumn("tid", F.monotonically_increasing_id())
    )
    member = t.select(
        "tid", F.explode(F.array("u", "v", "w")).alias("node")
    )
    arcs = g.edges.filter(F.col("src") != F.col("dst")).select(
        "src", "dst"
    ).distinct()
    induced = (
        member.withColumnRenamed("node", "src")
        .join(arcs, "src")
        .join(
            member.select("tid", F.col("node").alias("dst")),
            ["tid", "dst"],
            "left_semi",
        )
        .groupBy("tid")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("src"), F.col("dst")))
            ).alias("arcs")
        )
    )
    return t.join(induced, "tid", "left").select(
        "u", "v", "w",
        F.coalesce(
            "arcs", F.array().cast("array<struct<src:bigint,dst:bigint>>")
        ).alias("arcs"),
    )
