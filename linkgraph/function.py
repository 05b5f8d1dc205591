"""The reference's functional utility surface (``networkx/classes/function.py``).

Thin functional forms over :class:`~linkgraph.graph.SparkGraph` methods and
one-join utilities. One semantic difference runs through all of them:
SparkGraph is immutable (DataFrames are), so every "mutating" helper
(``add_star``/``add_path``/``add_cycle``/``set_node_attributes``/...)
RETURNS the new graph instead of editing in place — the engine-wide
convention (``graph.py`` ``add_edges``). ``freeze``/``is_frozen`` are
therefore trivially satisfiable and kept for API parity.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import Column, DataFrame, functions as F

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph

__all__ = [
    "nodes", "edges", "degree", "neighbors", "all_neighbors",
    "non_neighbors", "common_neighbors",
    "number_of_nodes", "number_of_edges", "density", "is_directed",
    "is_empty", "create_empty_copy",
    "add_star", "add_path", "add_cycle",
    "subgraph", "induced_subgraph", "edge_subgraph", "restricted_view",
    "subgraph_view", "to_directed", "to_undirected", "reverse_view",
    "nodes_with_selfloops", "selfloop_edges", "number_of_selfloops",
    "is_weighted", "is_negatively_weighted",
    "is_isolate", "isolates", "number_of_isolates",
    "get_node_attributes", "set_node_attributes",
    "get_edge_attributes", "set_edge_attributes",
    "remove_node_attributes", "remove_edge_attributes",
    "freeze", "is_frozen", "equivalence_classes",
]


# ------------------------------------------------------------------ #
# views / counts
# ------------------------------------------------------------------ #

def nodes(g: SparkGraph) -> DataFrame:
    """``function.py:nodes`` — the vertex DataFrame."""
    return g.vertices


def edges(g: SparkGraph, nbunch=None) -> DataFrame:
    """``function.py:edges`` — edge rows; with ``nbunch``, only edges
    incident to those nodes (the reference's EdgeView(nbunch))."""
    e = g.edges
    if nbunch is None:
        return e
    ids = _nbunch_df(g, nbunch)
    src_hit = e.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
    dst_hit = e.join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
    return src_hit.unionByName(dst_hit).distinct()


def _nbunch_df(g: SparkGraph, nbunch) -> DataFrame:
    if isinstance(nbunch, DataFrame):
        return nbunch.select(F.col(nbunch.columns[0]).cast("long").alias("id"))
    if isinstance(nbunch, (int,)):
        nbunch = [nbunch]
    return g.spark.createDataFrame([(int(n),) for n in nbunch], "id long")


def degree(g: SparkGraph, nbunch=None, weight: Optional[str] = None) -> DataFrame:
    """``function.py:degree`` — (id, degree), optionally weighted and/or
    restricted to ``nbunch``."""
    from linkgraph.algos.degrees import degrees

    d = degrees(g, weight=weight)
    if nbunch is not None:
        d = d.join(_nbunch_df(g, nbunch), "id", "left_semi")
    return d


def neighbors(g: SparkGraph, n) -> DataFrame:
    """Successors (directed) / neighbors (undirected) of ``n`` as a
    one-column DataFrame, ascending."""
    base = g.edges if g.directed else g.symmetric_edges()
    return (
        base.filter(F.col("src") == int(n))
        .select(F.col("dst").alias("id"))
        .distinct()
        .orderBy("id")
    )


def all_neighbors(g: SparkGraph, n) -> DataFrame:
    """``function.py:all_neighbors`` — predecessors AND successors."""
    base = g.symmetric_edges() if not g.directed else g.edges.unionByName(
        g.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight",
            *[c for c in g.edges.columns if c not in ("src", "dst", "weight")],
        )
    )
    return (
        base.filter(F.col("src") == int(n))
        .select(F.col("dst").alias("id"))
        .distinct()
        .orderBy("id")
    )


def non_neighbors(g: SparkGraph, n) -> DataFrame:
    """``function.py:non_neighbors`` — nodes outside ``G.adj[n]`` (for
    directed graphs the reference's adj is the SUCCESSOR view)."""
    nbrs = neighbors(g, n)
    return (
        g.vertices.select("id")
        .join(nbrs, "id", "left_anti")
        .filter(F.col("id") != int(n))
        .orderBy("id")
    )


def common_neighbors(g: SparkGraph, u, v) -> DataFrame:
    """``function.py:common_neighbors``."""
    return all_neighbors(g, u).join(all_neighbors(g, v), "id", "left_semi")


def non_edges(g: SparkGraph) -> DataFrame:
    """``function.py:non_edges`` — the node pairs NOT joined by an edge, as
    DataFrame ``(src, dst)``: ordered pairs for directed graphs, unordered
    (src < dst) for undirected. The anti-join form of
    :func:`linkgraph.algos.setops.complement`; output is O(n²) minus m by
    definition — the caller owns that size choice, same as the reference's
    generator fully consumed."""
    ids = g.vertices.select("id")
    pairs = ids.select(F.col("id").alias("src")).crossJoin(
        ids.select(F.col("id").alias("dst"))
    )
    if g.directed:
        pairs = pairs.filter(F.col("src") != F.col("dst"))
        present = g.edges.select("src", "dst").distinct()
    else:
        pairs = pairs.filter(F.col("src") < F.col("dst"))
        present = (
            g.edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
    return pairs.join(present, ["src", "dst"], "left_anti")


def number_of_nodes(g: SparkGraph) -> int:
    return g.number_of_nodes()


def number_of_edges(g: SparkGraph) -> int:
    return g.number_of_edges()


def density(g: SparkGraph) -> float:
    return g.density()


def is_directed(g: SparkGraph) -> bool:
    return g.directed


def is_empty(g: SparkGraph) -> bool:
    """``function.py:is_empty`` — no edges (nodes may exist)."""
    return g.edges.limit(1).count() == 0


def create_empty_copy(g: SparkGraph, with_data: bool = True) -> SparkGraph:
    """``function.py:create_empty_copy`` — same nodes, zero edges."""
    verts = g.vertices if with_data else g.vertices.select("id")
    empty = g.spark.createDataFrame([], "src long, dst long, weight double")
    return SparkGraph(empty, verts, directed=g.directed, coalesce_edges=False)


# ------------------------------------------------------------------ #
# constructive helpers (return NEW graphs — DataFrames are immutable)
# ------------------------------------------------------------------ #

def _extend(g: SparkGraph, pairs: "list[tuple[int, int]]") -> SparkGraph:
    if not pairs:
        return g
    extra = g.spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in pairs],
        "src long, dst long, weight double",
    )
    return g.add_edges(extra)


def add_star(g: SparkGraph, nodes_iter: Iterable[int]) -> SparkGraph:
    """``function.py:add_star`` — first node is the hub."""
    ns = [int(n) for n in nodes_iter]
    return _extend(g, [(ns[0], n) for n in ns[1:]])


def add_path(g: SparkGraph, nodes_iter: Iterable[int]) -> SparkGraph:
    """``function.py:add_path``."""
    ns = [int(n) for n in nodes_iter]
    return _extend(g, list(zip(ns, ns[1:])))


def add_cycle(g: SparkGraph, nodes_iter: Iterable[int]) -> SparkGraph:
    """``function.py:add_cycle``."""
    ns = [int(n) for n in nodes_iter]
    pairs = list(zip(ns, ns[1:]))
    if len(ns) > 1:
        pairs.append((ns[-1], ns[0]))
    return _extend(g, pairs)


# ------------------------------------------------------------------ #
# subgraph / view functional forms
# ------------------------------------------------------------------ #

def subgraph(g: SparkGraph, nodes_iter) -> SparkGraph:
    return g.subgraph(_nbunch_df(g, nodes_iter))


def induced_subgraph(g: SparkGraph, nodes_iter) -> SparkGraph:
    """``graphviews`` ``induced_subgraph`` — same as subgraph here."""
    return subgraph(g, nodes_iter)


def edge_subgraph(g: SparkGraph, edges_iter) -> SparkGraph:
    return g.edge_subgraph(edges_iter)


def restricted_view(g: SparkGraph, nodes_iter, edges_iter) -> SparkGraph:
    return g.restricted_view(nodes_iter, edges_iter)


def subgraph_view(g: SparkGraph, *, filter_node=None, filter_edge=None) -> SparkGraph:
    return g.subgraph_view(filter_node=filter_node, filter_edge=filter_edge)


def to_directed(g: SparkGraph) -> SparkGraph:
    return g.to_directed()


def to_undirected(g: SparkGraph) -> SparkGraph:
    return g.to_undirected()


def reverse_view(g: SparkGraph) -> SparkGraph:
    """``graphviews.py:238`` — reversed arcs (lazy here too: ``reverse``
    only swaps column roles in the plan, nothing materializes)."""
    return g.reverse()


# ------------------------------------------------------------------ #
# self-loops / isolates
# ------------------------------------------------------------------ #

def nodes_with_selfloops(g: SparkGraph) -> DataFrame:
    return (
        g.edges.filter(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("id"))
        .distinct()
    )


def selfloop_edges(g: SparkGraph) -> DataFrame:
    return g.selfloop_edges()


def number_of_selfloops(g: SparkGraph) -> int:
    return g.number_of_selfloops()


def is_isolate(g: SparkGraph, n) -> bool:
    return g.isolates().filter(F.col("id") == int(n)).limit(1).count() > 0


def isolates(g: SparkGraph) -> DataFrame:
    return g.isolates()


def number_of_isolates(g: SparkGraph) -> int:
    return g.isolates().count()


# ------------------------------------------------------------------ #
# weight predicates
# ------------------------------------------------------------------ #

def is_weighted(g: SparkGraph, edge=None, weight: str = "weight") -> bool:
    """``function.py:is_weighted``. Column-store twist: the blessed
    ``weight`` column always exists (default 1.0), so a graph is
    "weighted" when the column was actually supplied / varies — mirrored
    here as: the named column exists in the edge schema."""
    if edge is not None:
        u, v = edge
        row = _edge_row(g, u, v)
        if row is None:
            raise NetworkXError(f"Edge {edge!r} does not exist.")
        return weight in g.edges.columns
    if g.edges.limit(1).count() == 0:
        raise NetworkXError("Graph has no edges.")
    return weight in g.edges.columns


def _edge_row(g: SparkGraph, u, v):
    u, v = int(u), int(v)
    if not g.directed and u > v:
        u, v = v, u
    return g.edges.filter((F.col("src") == u) & (F.col("dst") == v)).first()


def is_negatively_weighted(g: SparkGraph, edge=None, weight: str = "weight") -> bool:
    """``function.py:is_negatively_weighted``."""
    if weight not in g.edges.columns:
        return False
    if edge is not None:
        u, v = edge
        row = _edge_row(g, u, v)
        if row is None:
            raise NetworkXError(f"Edge {edge!r} does not exist.")
        return row[weight] is not None and row[weight] < 0
    return g.edges.filter(F.col(weight) < 0).limit(1).count() > 0


# ------------------------------------------------------------------ #
# attribute get/set (columnar)
# ------------------------------------------------------------------ #

def get_node_attributes(g: SparkGraph, name: str, default=None) -> DataFrame:
    """(id, <name>) — nodes missing the attribute get ``default`` (or are
    dropped when default is None, like the reference's dict)."""
    if name not in g.vertices.columns:
        if default is None:
            return g.vertices.select("id").limit(0).withColumn(name, F.lit(None))
        return g.vertices.select("id", F.lit(default).alias(name))
    out = g.vertices.select("id", name)
    if default is not None:
        out = out.select("id", F.coalesce(F.col(name), F.lit(default)).alias(name))
    else:
        out = out.filter(F.col(name).isNotNull())
    return out


def set_node_attributes(g: SparkGraph, values, name: Optional[str] = None) -> SparkGraph:
    """Returns a NEW graph with the attribute column set. ``values`` may be
    a scalar, a python dict ``{id: value}``, a Column/SQL expression, or a
    DataFrame ``(id, <name>)``."""
    if name is None:
        raise NetworkXError(
            "columnar set_node_attributes needs an attribute name"
        )
    verts = g.vertices
    if isinstance(values, DataFrame):
        vals = values.select(
            F.col(values.columns[0]).cast("long").alias("id"),
            F.col(values.columns[1]).alias(f"_{name}_new"),
        )
        verts = verts.join(vals, "id", "left")
        col = F.col(f"_{name}_new")
    elif isinstance(values, dict):
        vals = g.spark.createDataFrame(
            [(int(k), v) for k, v in values.items()], ["id", f"_{name}_new"]
        )
        verts = verts.join(vals, "id", "left")
        col = F.col(f"_{name}_new")
    elif isinstance(values, Column):
        col = values
    elif isinstance(values, str) and not values.isidentifier():
        col = F.expr(values)
    else:
        col = F.lit(values)
    if name in verts.columns:
        col = F.coalesce(col, F.col(name))
        verts = verts.withColumn(name, col).drop(f"_{name}_new")
    else:
        verts = verts.withColumn(name, col)
        if f"_{name}_new" in verts.columns:
            verts = verts.drop(f"_{name}_new")
    return SparkGraph(g.edges, verts, directed=g.directed, coalesce_edges=False)


def get_edge_attributes(g: SparkGraph, name: str, default=None) -> DataFrame:
    """(src, dst, <name>)."""
    if name not in g.edges.columns:
        if default is None:
            return (
                g.edges.select("src", "dst").limit(0).withColumn(name, F.lit(None))
            )
        return g.edges.select("src", "dst", F.lit(default).alias(name))
    out = g.edges.select("src", "dst", name)
    if default is not None:
        out = out.select(
            "src", "dst", F.coalesce(F.col(name), F.lit(default)).alias(name)
        )
    else:
        out = out.filter(F.col(name).isNotNull())
    return out


def set_edge_attributes(g: SparkGraph, values, name: Optional[str] = None) -> SparkGraph:
    """Returns a NEW graph with the edge attribute column set. ``values``:
    scalar, dict ``{(u, v): value}``, Column/SQL expression, or DataFrame
    ``(src, dst, <value>)``."""
    if name is None:
        raise NetworkXError(
            "columnar set_edge_attributes needs an attribute name"
        )
    e = g.edges
    if isinstance(values, DataFrame):
        vals = values.select(
            F.col(values.columns[0]).cast("long").alias("src"),
            F.col(values.columns[1]).cast("long").alias("dst"),
            F.col(values.columns[2]).alias(f"_{name}_new"),
        )
        if not g.directed:
            vals = vals.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                f"_{name}_new",
            )
        e = e.join(vals, ["src", "dst"], "left")
        col = F.col(f"_{name}_new")
    elif isinstance(values, dict):
        rows = [(int(u), int(v), val) for (u, v), val in values.items()]
        vals = g.spark.createDataFrame(rows, ["src", "dst", f"_{name}_new"])
        if not g.directed:
            vals = vals.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                f"_{name}_new",
            )
        e = e.join(vals, ["src", "dst"], "left")
        col = F.col(f"_{name}_new")
    elif isinstance(values, Column):
        col = values
    elif isinstance(values, str) and not values.isidentifier():
        col = F.expr(values)
    else:
        col = F.lit(values)
    if name in e.columns:
        col = F.coalesce(col, F.col(name))
    e = e.withColumn(name, col)
    if f"_{name}_new" in e.columns:
        e = e.drop(f"_{name}_new")
    return SparkGraph(e, g._vertices, directed=g.directed, coalesce_edges=False)


def remove_node_attributes(g: SparkGraph, *names: str) -> SparkGraph:
    """``function.py:remove_node_attributes`` — drop columns, new graph."""
    verts = g.vertices.drop(*names)
    return SparkGraph(g.edges, verts, directed=g.directed, coalesce_edges=False)


def remove_edge_attributes(g: SparkGraph, *names: str) -> SparkGraph:
    names = tuple(n for n in names if n not in ("src", "dst"))
    e = g.edges.drop(*names)
    return SparkGraph(e, g._vertices, directed=g.directed, coalesce_edges=False)


# ------------------------------------------------------------------ #
# freeze + misc
# ------------------------------------------------------------------ #

def freeze(g: SparkGraph) -> SparkGraph:
    """``function.py:freeze``. SparkGraph never mutates in place (every
    modifier returns a new graph), so freezing only sets the flag the
    reference checks."""
    g.frozen = True
    return g


def is_frozen(g: SparkGraph) -> bool:
    return bool(getattr(g, "frozen", False))


def equivalence_classes(iterable, relation) -> "set[frozenset]":
    """``networkx/algorithms/minors/contraction.py:equivalence_classes`` —
    driver-side helper (it is a python-iterable utility in the reference
    too, not a graph op)."""
    elements = list(iterable)
    classes: "list[list]" = []
    for x in elements:
        for cls in classes:
            if relation(x, cls[0]):
                cls.append(x)
                break
        else:
            classes.append([x])
    return {frozenset(c) for c in classes}
