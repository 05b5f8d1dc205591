"""Derived graphs over the driver's TPC-H-ish parquet tables.

These builders exist so every graph operator has a DuckDB-checkable oracle
(SURVEY.md §5c): the same edge derivation is written once here as DataFrame
lineage and once as ANSI SQL in ``__spark_entry__.oracle_sql``. The driver
runs both at sf=0.01 and compares row-count + schema + value-hash.

Derivations (all deterministic):

- **copurchase**: undirected part-copurchase graph — parts appearing in the
  same order are linked (canonical ``src < dst``, distinct). The classic
  market-basket projection; dense enough to have triangles.
- **supplier_part**: directed bipartite supplier→part graph from distinct
  ``(l_suppkey, l_partkey)`` pairs; supplier ids are offset into a disjoint
  range so the two key spaces cannot collide.
- **customer_chain**: within each nation, consecutive customers (by
  ``c_custkey``) are linked — 25 path graphs whose connected components are
  exactly the nations, giving connected-components a closed-form oracle
  (``component = min(c_custkey) per nation``) while still requiring
  O(log n) min-label rounds on 60-node chains.
- **event_transitions**: directed event-type transition graph — for each
  user, consecutive events (by ``ts, event_id``) yield an arc
  ``prev_type → type``. Has genuinely reciprocal arcs, so it exercises
  ``reciprocity``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, Window

from linkgraph.graph import SparkGraph

SUPPLIER_OFFSET = 1_000_000


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct canonical (src < dst) part pairs sharing an order."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def copurchase_graph(spark: SparkSession, sf_dir: str) -> SparkGraph:
    return SparkGraph(
        copurchase_edges(spark, sf_dir), directed=False, coalesce_edges=False
    )


def supplier_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed supplier→part arcs; suppliers offset to a disjoint id range."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_suppkey") + F.lit(SUPPLIER_OFFSET)).alias("src"),
            F.col("l_partkey").alias("dst"),
        )
        .distinct()
    )


def supplier_part_graph(spark: SparkSession, sf_dir: str) -> SparkGraph:
    return SparkGraph(
        supplier_part_edges(spark, sf_dir), directed=True, coalesce_edges=False
    )


def customer_chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer chains: c_custkey → next c_custkey in the nation."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return (
        c.withColumn("nxt", F.lead("c_custkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("c_custkey").alias("src"), F.col("nxt").alias("dst"))
    )


def customer_chain_graph(spark: SparkSession, sf_dir: str) -> SparkGraph:
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    return SparkGraph(
        customer_chain_edges(spark, sf_dir),
        vertices=c,
        directed=False,
        coalesce_edges=False,
    )


def customer_ring_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation directed customer RINGS: the chain arcs plus one closing
    arc max(c_custkey) → min(c_custkey) per nation. Each nation becomes one
    directed cycle, so its customers form exactly one SCC whose minimum id
    is ``min(c_custkey)`` — the closed-form the DuckDB oracle checks."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    chain = (
        c.withColumn("nxt", F.lead("c_custkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("c_custkey").alias("src"), F.col("nxt").alias("dst"))
    )
    closing = c.groupBy("c_nationkey").agg(
        F.max("c_custkey").alias("src"), F.min("c_custkey").alias("dst")
    ).select("src", "dst")
    return chain.unionByName(closing)


def customer_ring_graph(spark: SparkSession, sf_dir: str) -> SparkGraph:
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    return SparkGraph(
        customer_ring_edges(spark, sf_dir),
        vertices=c,
        directed=True,
        coalesce_edges=False,
    )


def customer_chain_weighted_graph(spark: SparkSession, sf_dir: str) -> SparkGraph:
    """The undirected per-nation chains with edge weight = the custkey gap
    ``dst - src``. Weighted distance from the nation's minimum customer then
    telescopes to ``c_custkey - min(c_custkey)`` — the closed-form oracle
    for the Bellman-Ford relaxation loop."""
    e = customer_chain_edges(spark, sf_dir).select(
        "src", "dst", (F.col("dst") - F.col("src")).cast("double").alias("weight")
    )
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    return SparkGraph(e, vertices=c, directed=False, coalesce_edges=False)


def event_transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed (prev event_type, event_type) arcs, distinct, no self-loops.

    Node identity stays the event-type string here; callers needing BIGINT
    ids hash them (the id never appears in scalar outputs like reciprocity).
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("event_type")))
        .select(F.col("prev").alias("src_type"), F.col("event_type").alias("dst_type"))
        .distinct()
    )


NATION_OFFSET = 1_000_000
REGION_OFFSET = 2_000_000


def hierarchy_dag_graph(spark: SparkSession, sf_dir: str) -> SparkGraph:
    """Three-layer region → nation → customer DAG (keys offset into
    disjoint ranges). Kahn layers are the hierarchy levels — regions have
    zero in-degree (generation 0), nations depend only on regions (1),
    customers only on nations (2) — the closed form the DuckDB oracle
    checks. Three peel rounds regardless of scale, so the driver query
    stays O(1) supersteps while the nx parity tests cover arbitrary-depth
    DAGs."""
    r = _t(spark, sf_dir, "region").select(
        (F.col("r_regionkey") + REGION_OFFSET).cast("long").alias("id")
    )
    n = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + NATION_OFFSET).cast("long").alias("id"),
        (F.col("n_regionkey") + REGION_OFFSET).cast("long").alias("region"),
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        (F.col("c_nationkey") + NATION_OFFSET).cast("long").alias("nation"),
    )
    e = (
        n.select(F.col("region").alias("src"), F.col("id").alias("dst"))
        .unionByName(c.select(F.col("nation").alias("src"), F.col("id").alias("dst")))
    )
    v = r.unionByName(n.select("id")).unionByName(c.select("id"))
    return SparkGraph(e, vertices=v, directed=True, coalesce_edges=False)


def customer_chain_digraph(spark: SparkSession, sf_dir: str) -> SparkGraph:
    """The per-nation customer chains as a DIRECTED graph (src → next) —
    25 disjoint directed paths, an acyclic input for transitive closure
    whose closure has the closed form {(u, v): same nation, u < v}."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    return SparkGraph(
        customer_chain_edges(spark, sf_dir),
        vertices=c,
        directed=True,
        coalesce_edges=False,
    )


def mixed_ring_chain_graph(spark: SparkSession, sf_dir: str) -> SparkGraph:
    """Directed per-nation customer paths, CLOSED into rings only for
    even-numbered nations: even nations contribute k cyclic arcs (one SCC
    per nation), odd nations k−1 acyclic chain arcs. Flow hierarchy has
    the closed form Σ_odd (k−1) / (Σ_odd (k−1) + Σ_even k) — the DuckDB
    oracle for ``flow_hierarchy``."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    chain = (
        c.withColumn("nxt", F.lead("c_custkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("c_custkey").alias("src"), F.col("nxt").alias("dst"))
    )
    closing = (
        c.filter(F.col("c_nationkey") % 2 == 0)
        .groupBy("c_nationkey")
        .agg(F.max("c_custkey").alias("src"), F.min("c_custkey").alias("dst"))
        .select("src", "dst")
    )
    v = c.select(F.col("c_custkey").alias("id"))
    return SparkGraph(
        chain.unionByName(closing), vertices=v, directed=True, coalesce_edges=False
    )
