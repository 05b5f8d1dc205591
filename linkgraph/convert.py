"""Driver-side conversion bridges: dicts, pandas, and the JSON graph
formats.

Reference: ``networkx/convert.py`` (``to/from_dict_of_dicts:374/288``,
``to/from_dict_of_lists:213/171``, ``to_edgelist:461``),
``networkx/convert_matrix.py`` (``to/from_pandas_edgelist:220/312``,
``to/from_pandas_adjacency:154/81``), ``networkx/readwrite/json_graph/``
(``cytoscape.py``, ``adjacency.py``, ``tree.py``; node-link lives in
``linkgraph.io.json_graph``).

These are the reference's model-boundary constructors (SURVEY §1.4). They
are driver-side by nature (Python dicts / pandas frames ARE driver
objects); each ``to_*`` collects under a row guard, each ``from_*`` is one
``createDataFrame``. The parquet/Arrow readers remain the scale ingest.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession, functions as F

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph

__all__ = [
    "to_dict_of_dicts",
    "from_dict_of_dicts",
    "to_dict_of_lists",
    "from_dict_of_lists",
    "to_edgelist",
    "to_pandas_edgelist",
    "from_pandas_edgelist",
    "to_pandas_adjacency",
    "from_pandas_adjacency",
    "cytoscape_data",
    "cytoscape_graph",
    "adjacency_data",
    "adjacency_graph",
    "tree_data",
    "tree_graph",
    "to_networkx_graph",
    "Graph",
    "DiGraph",
    "MultiGraph",
    "MultiDiGraph",
]

_MAX_ROWS = 5_000_000


def _collect_edges(g: SparkGraph, max_rows: int):
    e = g.edges.select("src", "dst", "weight")
    if e.count() > max_rows:
        raise NetworkXError(f"driver bridge exceeds max_rows={max_rows}")
    return e.collect()


def to_dict_of_dicts(g: SparkGraph, *, max_rows: int = _MAX_ROWS) -> dict:
    """``convert.py:374`` — {u: {v: {"weight": w}}}; undirected edges
    appear under both endpoints, like the reference's shared attr dict."""
    d = {int(r["id"]): {} for r in g.vertices.select("id").collect()}
    for r in _collect_edges(g, max_rows):
        u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        d[u][v] = {"weight": w}
        if not g.directed:
            d[v][u] = {"weight": w}
    return d


def from_dict_of_dicts(
    spark: SparkSession, d: dict, *, directed: bool = False
) -> SparkGraph:
    """``convert.py:288``."""
    verts = [(int(u),) for u in d]
    if directed:
        rows = [
            (int(u), int(v), float((data or {}).get("weight", 1.0)))
            for u, nbrs in d.items()
            for v, data in nbrs.items()
        ]
    else:
        seen: dict = {}
        for u, nbrs in d.items():
            for v, data in nbrs.items():
                a, b = sorted((int(u), int(v)))
                seen[(a, b)] = float((data or {}).get("weight", 1.0))
        rows = [(a, b, w) for (a, b), w in seen.items()]
    e = spark.createDataFrame(rows or [], "src long, dst long, weight double")
    v = spark.createDataFrame(verts, "id long")
    return SparkGraph(e, v, directed=directed, coalesce_edges=False)


def to_dict_of_lists(g: SparkGraph, *, max_rows: int = _MAX_ROWS) -> dict:
    """``convert.py:213`` — {u: [neighbors]} (sorted for determinism)."""
    d = {int(r["id"]): [] for r in g.vertices.select("id").collect()}
    arcs = g.symmetric_edges() if not g.directed else g.edges
    if arcs.count() > max_rows:
        raise NetworkXError(f"driver bridge exceeds max_rows={max_rows}")
    for r in arcs.select("src", "dst").collect():
        d[int(r["src"])].append(int(r["dst"]))
    return {u: sorted(vs) for u, vs in d.items()}


def from_dict_of_lists(
    spark: SparkSession, d: dict, *, directed: bool = False
) -> SparkGraph:
    """``convert.py:171``."""
    rows = [(int(u), int(v), 1.0) for u, vs in d.items() for v in vs]
    e = spark.createDataFrame(rows or [], "src long, dst long, weight double")
    v = spark.createDataFrame([(int(u),) for u in d], "id long")
    return SparkGraph(e, v, directed=directed, coalesce_edges=not directed)


def to_edgelist(g: SparkGraph, *, max_rows: int = _MAX_ROWS) -> list:
    """``convert.py:461`` — [(u, v, {"weight": w})]."""
    return [
        (int(r["src"]), int(r["dst"]), {"weight": float(r["weight"])})
        for r in _collect_edges(g, max_rows)
    ]


def to_pandas_edgelist(
    g: SparkGraph,
    source: str = "source",
    target: str = "target",
    *,
    max_rows: int = _MAX_ROWS,
):
    """``convert_matrix.py:220`` — pandas frame (source, target, weight,
    *extra edge attr columns)."""
    e = g.edges
    if e.count() > max_rows:
        raise NetworkXError(f"driver bridge exceeds max_rows={max_rows}")
    pdf = e.toPandas().rename(columns={"src": source, "dst": target})
    return pdf


def from_pandas_edgelist(
    spark: SparkSession,
    df,
    source: str = "source",
    target: str = "target",
    edge_attr=None,
    *,
    directed: bool = False,
) -> SparkGraph:
    """``convert_matrix.py:312``; ``edge_attr=True`` keeps every extra
    column, a list/str keeps those."""
    cols = [source, target]
    if edge_attr is True:
        cols += [c for c in df.columns if c not in (source, target)]
    elif isinstance(edge_attr, str):
        cols.append(edge_attr)
    elif edge_attr:
        cols += list(edge_attr)
    sdf = spark.createDataFrame(df[cols]).withColumnsRenamed(
        {source: "src", target: "dst"}
    )
    return SparkGraph(sdf, directed=directed, coalesce_edges=False)


def to_pandas_adjacency(
    g: SparkGraph, nodelist=None, *, weight=None, max_nodes: int = 20_000
):
    """``convert_matrix.py:154`` — dense adjacency as a pandas frame
    indexed by node id."""
    import pandas as pd

    from linkgraph.linalg import adjacency_matrix

    A, ids = adjacency_matrix(g, nodelist, weight=weight, max_nodes=max_nodes)
    return pd.DataFrame(A, index=ids, columns=ids)


def from_pandas_adjacency(
    spark: SparkSession, df, *, directed: bool = False
) -> SparkGraph:
    """``convert_matrix.py:81`` — nonzero entries become weighted edges;
    raises on non-square input like the reference."""
    if df.shape[0] != df.shape[1]:
        raise NetworkXError(
            f"Input is not a square matrix of the adjacency type: "
            f"{df.shape[0]} rows, {df.shape[1]} columns"
        )
    ids = list(df.index)
    rows = []
    for i, u in enumerate(ids):
        for j, v in enumerate(ids):
            w = float(df.iat[i, j])
            if w != 0 and (directed or i <= j):
                rows.append((int(u), int(v), w))
    e = spark.createDataFrame(rows or [], "src long, dst long, weight double")
    v = spark.createDataFrame([(int(u),) for u in ids], "id long")
    return SparkGraph(e, v, directed=directed, coalesce_edges=False)


# ------------------------------------------------------------------ #
# JSON graph formats (readwrite/json_graph)
# ------------------------------------------------------------------ #


def cytoscape_data(g: SparkGraph, *, max_rows: int = _MAX_ROWS) -> dict:
    """``json_graph/cytoscape.py:12`` ``cytoscape_data``."""
    nodes = [
        {"data": {"id": str(int(r["id"])), "value": int(r["id"]),
                  "name": str(int(r["id"]))}}
        for r in g.vertices.select("id").orderBy("id").collect()
    ]
    edges = [
        {"data": {"source": int(r["src"]), "target": int(r["dst"]),
                  "weight": float(r["weight"])}}
        for r in _collect_edges(g, max_rows)
    ]
    return {
        "data": [],
        "directed": g.directed,
        "multigraph": g.is_multigraph(),
        "elements": {"nodes": nodes, "edges": edges},
    }


def cytoscape_graph(spark: SparkSession, data: dict) -> SparkGraph:
    """``json_graph/cytoscape.py:93`` ``cytoscape_graph``."""
    directed = bool(data.get("directed", False))
    verts = [
        (int(n["data"].get("value", n["data"]["id"])),)
        for n in data["elements"]["nodes"]
    ]
    rows = [
        (
            int(e["data"]["source"]),
            int(e["data"]["target"]),
            float(e["data"].get("weight", 1.0)),
        )
        for e in data["elements"]["edges"]
    ]
    e = spark.createDataFrame(rows or [], "src long, dst long, weight double")
    v = spark.createDataFrame(verts, "id long")
    return SparkGraph(e, v, directed=directed, coalesce_edges=False)


def adjacency_data(g: SparkGraph, *, max_rows: int = _MAX_ROWS) -> dict:
    """``json_graph/adjacency.py:10`` ``adjacency_data``."""
    dol = to_dict_of_lists(g, max_rows=max_rows)
    ids = sorted(dol)
    wmap = {}
    for r in _collect_edges(g, max_rows):
        wmap[(int(r["src"]), int(r["dst"]))] = float(r["weight"])
        if not g.directed:
            wmap[(int(r["dst"]), int(r["src"]))] = float(r["weight"])
    return {
        "directed": g.directed,
        "multigraph": g.is_multigraph(),
        "graph": [],
        "nodes": [{"id": u} for u in ids],
        "adjacency": [
            [{"id": v, "weight": wmap.get((u, v), 1.0)} for v in dol[u]]
            for u in ids
        ],
    }


def adjacency_graph(spark: SparkSession, data: dict) -> SparkGraph:
    """``json_graph/adjacency.py:53`` ``adjacency_graph``."""
    directed = bool(data.get("directed", False))
    ids = [int(n["id"]) for n in data["nodes"]]
    rows = []
    for u, nbrs in zip(ids, data["adjacency"]):
        for nbr in nbrs:
            v = int(nbr["id"])
            if directed or u <= v:
                rows.append((u, v, float(nbr.get("weight", 1.0))))
    e = spark.createDataFrame(rows or [], "src long, dst long, weight double")
    v = spark.createDataFrame([(u,) for u in ids], "id long")
    return SparkGraph(e, v, directed=directed, coalesce_edges=False)


def tree_data(g: SparkGraph, root: int, *, max_rows: int = _MAX_ROWS) -> dict:
    """``json_graph/tree.py:10`` ``tree_data`` — nested {id, children}
    dict of a directed tree; raises unless the graph is a directed tree
    rooted at ``root``, like the reference."""
    if not g.directed:
        raise TypeError("G is not directed.")
    n = g.number_of_nodes()
    m = g.number_of_edges()
    if n != m + 1:
        raise TypeError("G is not a tree.")
    rows = _collect_edges(g, max_rows)
    children: dict = {}
    indeg: dict = {}
    for r in rows:
        u, v = int(r["src"]), int(r["dst"])
        children.setdefault(u, []).append(v)
        indeg[v] = indeg.get(v, 0) + 1
    if any(c > 1 for c in indeg.values()):
        raise TypeError("G is not a tree.")

    def build(u):
        out = {"id": u}
        if children.get(u):
            out["children"] = [build(v) for v in sorted(children[u])]
        return out

    return build(int(root))


def tree_graph(spark: SparkSession, data: dict) -> SparkGraph:
    """``json_graph/tree.py:69`` ``tree_graph``."""
    rows = []
    verts = []

    def walk(node):
        verts.append((int(node["id"]),))
        for c in node.get("children", []):
            rows.append((int(node["id"]), int(c["id"]), 1.0))
            walk(c)

    walk(data)
    e = spark.createDataFrame(rows or [], "src long, dst long, weight double")
    v = spark.createDataFrame(verts, "id long")
    return SparkGraph(e, v, directed=True, coalesce_edges=False)


# ---------------------------------------------------------------------- #
# nx-named class constructors + the to_networkx_graph dispatcher
# (``networkx/convert.py:34``, ``networkx/classes/{graph,digraph,
# multigraph,multidigraph}.py``)
# ---------------------------------------------------------------------- #


def _active_spark(spark: Optional[SparkSession]) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise NetworkXError(
            "no active SparkSession; pass spark= or create one first"
        )
    return s


def to_networkx_graph(
    data=None,
    *,
    directed: bool = False,
    multigraph: bool = False,
    spark: Optional[SparkSession] = None,
):
    """``networkx/convert.py:34`` — the type-dispatching constructor.
    Accepts None (empty graph), a SparkGraph (directedness-converting
    copy), a NetworkX graph, a dict-of-dicts / dict-of-lists, an edge
    iterable, a pandas edgelist/adjacency DataFrame, or a numpy / scipy
    adjacency matrix, mirroring the reference's dispatch order."""
    from linkgraph.graph import from_edgelist, from_nx
    from linkgraph.multigraph import SparkMultiGraph

    cls_kwargs = {"directed": directed}

    def _wrap(g: SparkGraph):
        if multigraph and not isinstance(g, SparkMultiGraph):
            return SparkMultiGraph(g.edges, g.vertices, directed=directed)
        return g

    if data is None:
        s = _active_spark(spark)
        e = s.createDataFrame([], "src long, dst long, weight double")
        v = s.createDataFrame([], "id long")
        ctor = SparkMultiGraph if multigraph else SparkGraph
        return ctor(e, v, directed=directed)
    if isinstance(data, SparkGraph):
        if directed and not data.directed:
            return _wrap(data.to_directed())
        if not directed and data.directed:
            return _wrap(data.to_undirected())
        return _wrap(
            type(data)(data.edges, data.vertices, directed=data.directed)
            if not isinstance(data, SparkMultiGraph)
            else data.copy()
        )
    if hasattr(data, "adj") and hasattr(data, "is_directed"):  # networkx
        s = _active_spark(spark)
        g = from_nx(s, data.to_directed() if directed else data)
        if directed and not g.directed:
            g = g.to_directed()
        if not directed and g.directed:
            g = g.to_undirected()
        return _wrap(g)
    if isinstance(data, dict):
        s = _active_spark(spark)
        try:
            inner = next(iter(data.values()))
        except StopIteration:
            inner = {}
        if isinstance(inner, dict):
            return _wrap(from_dict_of_dicts(s, data, **cls_kwargs))
        return _wrap(from_dict_of_lists(s, data, **cls_kwargs))
    try:
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            s = _active_spark(spark)
            if data.shape[0] == data.shape[1] and not {
                "source", "target"
            } <= set(map(str, data.columns)):
                return _wrap(from_pandas_adjacency(s, data, **cls_kwargs))
            return _wrap(from_pandas_edgelist(s, data, **cls_kwargs))
    except ImportError:  # pragma: no cover
        pass
    try:
        import numpy as np

        if isinstance(data, np.ndarray):
            from linkgraph.convert_matrix import from_numpy_array

            s = _active_spark(spark)
            return _wrap(from_numpy_array(s, data, directed=directed))
    except ImportError:  # pragma: no cover
        pass
    if hasattr(data, "tocoo"):  # scipy sparse
        from linkgraph.convert_matrix import from_scipy_sparse_array

        s = _active_spark(spark)
        return _wrap(from_scipy_sparse_array(s, data, directed=directed))
    if hasattr(data, "__iter__"):  # edge iterable
        s = _active_spark(spark)
        return _wrap(from_edgelist(s, list(data), directed=directed))
    raise NetworkXError(f"cannot convert input of type {type(data)} to a graph")


def Graph(incoming_graph_data=None, *, spark: Optional[SparkSession] = None):
    """``networkx/classes/graph.py`` constructor twin: an undirected
    SparkGraph from any input ``to_networkx_graph`` accepts."""
    return to_networkx_graph(incoming_graph_data, directed=False, spark=spark)


def DiGraph(incoming_graph_data=None, *, spark: Optional[SparkSession] = None):
    """``networkx/classes/digraph.py`` constructor twin."""
    return to_networkx_graph(incoming_graph_data, directed=True, spark=spark)


def MultiGraph(incoming_graph_data=None, *, spark: Optional[SparkSession] = None):
    """``networkx/classes/multigraph.py`` constructor twin (parallel edges
    kept distinct under the ``key`` column)."""
    return to_networkx_graph(
        incoming_graph_data, directed=False, multigraph=True, spark=spark
    )


def MultiDiGraph(incoming_graph_data=None, *, spark: Optional[SparkSession] = None):
    """``networkx/classes/multidigraph.py`` constructor twin."""
    return to_networkx_graph(
        incoming_graph_data, directed=True, multigraph=True, spark=spark
    )
