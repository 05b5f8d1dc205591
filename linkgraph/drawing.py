"""Matplotlib drawing surface — import-gated name parity.

Reference: ``networkx/drawing/nx_pylab.py`` (``draw``, ``draw_networkx``
and the per-layout wrappers). Matplotlib is not part of this engine's
runtime (BASELINE.json's environment ships no plotting stack), exactly
as the reference degrades: every function here computes the layout with
the engine's own distributed/driver layout kernels and only then asks
for matplotlib, raising the reference's ImportError message when it is
absent. The data deliverables — positions DataFrames — come from
:mod:`linkgraph.layout`, which is fully implemented and tested.
"""

from __future__ import annotations

from linkgraph import layout as _layout

__all__ = [
    "draw",
    "draw_networkx",
    "draw_networkx_nodes",
    "draw_networkx_edges",
    "draw_networkx_labels",
    "draw_networkx_edge_labels",
    "draw_circular",
    "draw_kamada_kawai",
    "draw_planar",
    "draw_random",
    "draw_shell",
    "draw_spectral",
    "draw_spring",
    "draw_forceatlas2",
    "draw_bipartite",
    "display",
    "apply_matplotlib_colors",
]


def _require_matplotlib():
    try:
        import matplotlib.pyplot as plt  # noqa: F401

        return plt
    except ImportError as err:
        raise ImportError(
            "Matplotlib required for draw()"
        ) from err


def _pos_dict(pos_df):
    cols = [c for c in pos_df.columns if c != "id"][:2]
    return {r["id"]: (r[cols[0]], r[cols[1]]) for r in pos_df.collect()}


def draw_networkx(g, pos=None, **kwds):
    """``nx_pylab.py`` ``draw_networkx`` — spring positions by default;
    the scatter/line rendering itself needs matplotlib."""
    plt = _require_matplotlib()
    if pos is None:
        pos = _pos_dict(_layout.spring_layout(g))
    elif not isinstance(pos, dict):
        pos = _pos_dict(pos)
    ax = kwds.pop("ax", None) or plt.gca()
    xs = [p[0] for p in pos.values()]
    ys = [p[1] for p in pos.values()]
    ax.scatter(xs, ys)
    for r in g.edges.select("src", "dst").collect():
        if r["src"] in pos and r["dst"] in pos:
            (x1, y1), (x2, y2) = pos[r["src"]], pos[r["dst"]]
            ax.plot([x1, x2], [y1, y2])
    if kwds.pop("with_labels", True):
        for n, (x, y) in pos.items():
            ax.annotate(str(n), (x, y))
    return ax


def draw(g, pos=None, **kwds):
    """``nx_pylab.py`` ``draw``."""
    kwds.setdefault("with_labels", False)
    return draw_networkx(g, pos=pos, **kwds)


def draw_networkx_nodes(g, pos, **kwds):
    plt = _require_matplotlib()
    pos = pos if isinstance(pos, dict) else _pos_dict(pos)
    ax = kwds.pop("ax", None) or plt.gca()
    return ax.scatter([p[0] for p in pos.values()], [p[1] for p in pos.values()])


def draw_networkx_edges(g, pos, **kwds):
    plt = _require_matplotlib()
    pos = pos if isinstance(pos, dict) else _pos_dict(pos)
    ax = kwds.pop("ax", None) or plt.gca()
    out = []
    for r in g.edges.select("src", "dst").collect():
        if r["src"] in pos and r["dst"] in pos:
            (x1, y1), (x2, y2) = pos[r["src"]], pos[r["dst"]]
            out.append(ax.plot([x1, x2], [y1, y2]))
    return out


def draw_networkx_labels(g, pos, labels=None, **kwds):
    plt = _require_matplotlib()
    pos = pos if isinstance(pos, dict) else _pos_dict(pos)
    ax = kwds.pop("ax", None) or plt.gca()
    labels = labels or {n: str(n) for n in pos}
    return {n: ax.annotate(labels.get(n, str(n)), p) for n, p in pos.items()}


def draw_networkx_edge_labels(g, pos, edge_labels=None, **kwds):
    plt = _require_matplotlib()
    pos = pos if isinstance(pos, dict) else _pos_dict(pos)
    ax = kwds.pop("ax", None) or plt.gca()
    out = {}
    for r in g.edges.select("src", "dst").collect():
        e = (r["src"], r["dst"])
        if e[0] in pos and e[1] in pos:
            mid = (
                (pos[e[0]][0] + pos[e[1]][0]) / 2,
                (pos[e[0]][1] + pos[e[1]][1]) / 2,
            )
            text = (edge_labels or {}).get(e, "")
            out[e] = ax.annotate(str(text), mid)
    return out


def _draw_with(layout_fn):
    def _inner(g, **kwds):
        pos = _pos_dict(layout_fn(g))
        return draw(g, pos=pos, **kwds)

    return _inner


draw_circular = _draw_with(_layout.circular_layout)
draw_kamada_kawai = _draw_with(_layout.kamada_kawai_layout)
draw_planar = _draw_with(_layout.planar_layout)
draw_random = _draw_with(_layout.random_layout)
draw_shell = _draw_with(_layout.shell_layout)
draw_spectral = _draw_with(_layout.spectral_layout)
draw_spring = _draw_with(_layout.spring_layout)
draw_forceatlas2 = _draw_with(_layout.forceatlas2_layout)
draw_bipartite = _draw_with(_layout.bipartite_layout)


def display(g, canvas=None, **kwds):
    """``nx_pylab.py`` ``display`` — the reference's rich renderer;
    matplotlib-gated like the rest of this module."""
    _require_matplotlib()
    return draw_networkx(g, **kwds)


def apply_matplotlib_colors(g, src_attr, dest_attr, map_, vmin=None, vmax=None,
                            nodes=True):
    """``nx_pylab.py`` ``apply_matplotlib_colors`` — colormap an
    attribute column into RGBA tuples (matplotlib-gated)."""
    _require_matplotlib()
    import matplotlib as mpl

    obj = g.vertices if nodes else g.edges
    vals = [r[src_attr] for r in obj.select(src_attr).collect()]
    vmin = min(vals) if vmin is None else vmin
    vmax = max(vals) if vmax is None else vmax
    norm = mpl.colors.Normalize(vmin=vmin, vmax=vmax)
    from pyspark.sql import functions as F  # noqa: F401

    return {v: map_(norm(v)) for v in vals}
