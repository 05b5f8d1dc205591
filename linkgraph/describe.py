"""Graph summary — the relational form of ``nx.describe``
(``networkx/classes/function.py:1450``).

The reference prints a key/value block (nodes, edges, directed, average/
min/max degree, connected components, tree-ness); here the same quantities
come back as a ONE-ROW DataFrame so the summary composes with the rest of
the engine (and with ``df.describe()``-style tooling). Bipartite detection
is a full 2-coloring fixpoint and the reference computes it eagerly; at
scale that is an O(rounds) BFS, so it is gated behind
``include_bipartite=True`` rather than always-on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import SparkGraph


def describe(
    g: SparkGraph,
    *,
    include_components: bool = True,
    include_bipartite: bool = False,
) -> DataFrame:
    """One-row DataFrame with the reference's description fields
    (``function.py:1519`` ``_create_describe_info_dict``):

    ``n_nodes, n_edges, directed, avg_degree, min_degree, max_degree,
    n_selfloops, density[, n_components, is_tree][, is_bipartite]``.

    Degree stats are one aggregation over the degree table; components add
    one connected-components run (``is_tree`` is the forest criterion
    ``m == n - c`` of an acyclic graph, evaluated on the undirected view
    like the reference's ``nx.is_forest``-based check).
    """
    from linkgraph.algos.degrees import degrees

    spark = g.spark
    n = g.number_of_nodes()
    m = g.number_of_edges()
    loops = g.number_of_selfloops()
    deg_row = (
        degrees(g)
        .agg(
            F.avg("degree").alias("avg"),
            F.min("degree").alias("mn"),
            F.max("degree").alias("mx"),
        )
        .first()
    )
    if g.directed:
        density = 0.0 if n <= 1 else m / (n * (n - 1))
    else:
        density = 0.0 if n <= 1 else 2.0 * m / (n * (n - 1))

    fields = {
        "n_nodes": int(n),
        "n_edges": int(m),
        "directed": bool(g.directed),
        "avg_degree": float(deg_row["avg"] or 0.0),
        "min_degree": int(deg_row["mn"] if deg_row["mn"] is not None else 0),
        "max_degree": int(deg_row["mx"] if deg_row["mx"] is not None else 0),
        "n_selfloops": int(loops),
        "density": float(density),
    }
    schema = (
        "n_nodes long, n_edges long, directed boolean, avg_degree double, "
        "min_degree long, max_degree long, n_selfloops long, density double"
    )
    if include_components:
        from linkgraph.algos.components import connected_components

        c = (
            connected_components(g.undirected_view() if g.directed else g)
            .agg(F.countDistinct("component"))
            .first()[0]
        )
        simple_m = g.undirected_view().number_of_edges() if g.directed else m
        fields["n_components"] = int(c)
        # forest criterion on the (simple, loop-free) undirected view
        fields["is_tree"] = bool(
            n > 0 and loops == 0 and simple_m == n - c and c == 1
        )
        schema += ", n_components long, is_tree boolean"
    if include_bipartite:
        fields["is_bipartite"] = _is_bipartite(g)
        schema += ", is_bipartite boolean"
    return spark.createDataFrame([tuple(fields.values())], schema)


def _is_bipartite(g: SparkGraph, *, max_rounds: int = 10_000) -> bool:
    """Distributed 2-coloring: color = parity of BFS distance per
    component; bipartite iff no edge joins same-parity endpoints
    (``networkx/algorithms/bipartite/basic.py:123`` walks a BFS coloring
    the same way). One multi-source BFS (component minima as sources) +
    one edge join."""
    from linkgraph.algos.components import connected_components
    from linkgraph.algos.setops import shortest_path_lengths

    und = g.undirected_view() if g.directed else g
    if und.edges.filter(F.col("src") == F.col("dst")).limit(1).count():
        return False  # self-loop: odd cycle of length 1
    comp = connected_components(und)
    sources = comp.groupBy("component").agg(F.min("id").alias("id")).select("id")
    parity = shortest_path_lengths(und, sources, max_depth=max_rounds).select(
        "id", (F.col("distance") % 2).alias("par")
    )
    bad = (
        und.edges.filter(F.col("src") != F.col("dst"))
        .join(parity.select(F.col("id").alias("src"), F.col("par").alias("ps")), "src")
        .join(parity.select(F.col("id").alias("dst"), F.col("par").alias("pd")), "dst")
        .filter(F.col("ps") == F.col("pd"))
        .limit(1)
        .count()
    )
    return bad == 0
