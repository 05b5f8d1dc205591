"""SparkMultiGraph — parallel-edge (multigraph) storage.

The reference's ``MultiGraph``/``MultiDiGraph``
(``networkx/classes/multigraph.py:36``, ``multidigraph.py:35``) keep a
third dict level keyed by an edge *key*. Per SURVEY §1.6 the distributed
mapping is "no dedup + an explicit ``key`` column": every parallel edge is
its own row, identified by ``(src, dst, key)``.

- Construction never coalesces rows. A missing ``key`` column is assigned
  0..k-1 per (src, dst) pair (``MultiGraph.new_edge_key``,
  ``multigraph.py:373``: smallest unused integer), ordered by weight then
  attribute columns — deterministic under distribution, unlike the
  reference's insertion order which has no distributed analog.
- Degrees / size / density count every parallel edge — the base
  aggregations already count rows, so no overrides are needed beyond NOT
  merging at build time.
- ``to_simple()`` collapses parallel edges by summing weights — exactly
  the reference's multigraph→weighted-graph convention
  (``networkx/convert_matrix.py:649-656``).
- ``number_of_edges_between()`` is the reference's
  ``MultiGraph.number_of_edges(u, v)`` returning the multiplicity table.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import SparkGraph


class SparkMultiGraph(SparkGraph):
    """A graph DataFrame pair where parallel (src, dst) rows are distinct
    edges, keyed by the ``key`` column."""

    def __init__(
        self,
        edges: DataFrame,
        vertices: Optional[DataFrame] = None,
        *,
        directed: bool = False,
        num_partitions: Optional[int] = None,
    ):
        super().__init__(
            edges,
            vertices,
            directed=directed,
            coalesce_edges=False,
            num_partitions=num_partitions,
        )
        if "key" not in self.edges.columns:
            order = [F.col("weight")] + [
                F.col(c) for c in self.edge_attr_names
            ]
            w = Window.partitionBy("src", "dst").orderBy(*order)
            self.edges = self.edges.withColumn(
                "key", (F.row_number().over(w) - 1).cast("long")
            )
        else:
            self.edges = self.edges.withColumn("key", F.col("key").cast("long"))

    def is_multigraph(self) -> bool:
        return True

    @property
    def edge_attr_names(self) -> "list[str]":
        return [
            c
            for c in self.edges.columns
            if c not in ("src", "dst", "weight", "key")
        ]

    def number_of_edges_between(self, pairs: Optional[DataFrame] = None) -> DataFrame:
        """(src, dst, multiplicity) — ``MultiGraph.number_of_edges(u, v)``
        (``multigraph.py:1002``) for every stored pair, or the given ones."""
        m = self.edges.groupBy("src", "dst").agg(
            F.count(F.lit(1)).alias("multiplicity")
        )
        if pairs is not None:
            p = self._canon_pairs(pairs)
            m = m.join(p, ["src", "dst"], "left_semi")
        return m

    def to_simple(self) -> SparkGraph:
        """Collapse parallel edges into a weighted simple graph (weights
        sum, attrs keep max — ``convert_matrix.py:649-656``)."""
        e = self.edges.drop("key")
        return SparkGraph(
            e,
            self._vertices,
            directed=self.directed,
            coalesce_edges=True,
            num_partitions=self.num_partitions,
        )

    def remove_edges_by_key(self, triples: DataFrame) -> "SparkMultiGraph":
        """Drop specific parallel edges by (src, dst, key)
        (``MultiGraph.remove_edge`` with an explicit key,
        ``multigraph.py:536``)."""
        t = triples.select(
            F.col(triples.columns[0]).cast("long").alias("src"),
            F.col(triples.columns[1]).cast("long").alias("dst"),
            F.col(triples.columns[2]).cast("long").alias("key"),
        )
        if not self.directed:
            t = t.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "key",
            )
        e = self.edges.join(t, ["src", "dst", "key"], "left_anti")
        out = SparkMultiGraph(
            e, self._vertices, directed=self.directed,
            num_partitions=self.num_partitions,
        )
        return out

    def copy(self) -> "SparkMultiGraph":
        return SparkMultiGraph(
            self.edges,
            self._vertices,
            directed=self.directed,
            num_partitions=self.num_partitions,
        )
