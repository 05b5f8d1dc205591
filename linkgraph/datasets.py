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
