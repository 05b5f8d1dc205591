"""LaTeX / TikZ export.

Reference: ``networkx/drawing/nx_latex.py`` — ``to_latex_raw``,
``to_latex``, ``write_latex``. Text generation is a driver artifact by
nature (like network_text); positions may come from any engine layout
DataFrame (id, x, y), a ``{node: (x, y)}`` dict, or be omitted (the
reference's circular default). Options/labels are dicts keyed by node /
edge tuple — the reference's attribute-name indirection maps to vertex
or edge COLUMN names here.
"""

from __future__ import annotations

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph

__all__ = ["to_latex_raw", "to_latex", "write_latex"]

_DOC_WRAPPER_TIKZ = r"""\documentclass{{report}}
\usepackage{{tikz}}
\usepackage{{subcaption}}

\begin{{document}}
{content}
\end{{document}}"""


_FIG_WRAPPER = r"""\begin{{figure}}
{content}{caption}{label}
\end{{figure}}"""


_SUBFIG_WRAPPER = r"""  \begin{{subfigure}}{{{size}\textwidth}}
{content}{caption}{label}
  \end{{subfigure}}"""


def _norm_pos(g, pos):
    nodes = sorted(r["id"] for r in g.vertices.select("id").collect())
    if pos is None:
        out = {
            n: f"({round(360.0 * i / len(nodes), 3)}:2)"
            for i, n in enumerate(nodes)
        }
        return nodes, out
    if isinstance(pos, dict):
        p = dict(pos)
    else:  # positions DataFrame (id, x, y) or (id, x0, x1)
        cols = [c for c in pos.columns if c != "id"][:2]
        p = {r["id"]: (r[cols[0]], r[cols[1]]) for r in pos.collect()}
    out = {}
    for n in nodes:
        if n not in p:
            raise NetworkXError(f"node {n} has no specified pos {p}")
        v = p[n]
        if isinstance(v, str):
            out[n] = v
        else:
            try:
                x, y = v
            except (TypeError, ValueError):
                raise NetworkXError(
                    f"position pos[{n}] is not 2-tuple or a string: {v}"
                )
            out[n] = f"({round(x, 3)}, {round(y, 3)})"
    return nodes, out


def to_latex_raw(
    g: SparkGraph,
    pos=None,
    tikz_options: str = "",
    default_node_options: str = "",
    node_options: dict = None,
    node_label: dict = None,
    default_edge_options: str = "",
    edge_options: dict = None,
    edge_label: dict = None,
    edge_label_options: dict = None,
) -> str:
    """``nx_latex.py`` ``to_latex_raw`` — the tikzpicture string alone
    (no figure/document wrapper), byte-compatible with the reference for
    the same graph, positions and option dicts."""
    i4 = "\n    "
    i8 = "\n        "
    nodes, pos = _norm_pos(g, pos)
    node_options = node_options or {}
    node_label = node_label or {}
    edge_options = edge_options or {}
    edge_label = edge_label or {}
    edge_label_options = edge_label_options or {}

    topts = "" if tikz_options == "" else f"[{tikz_options.strip('[]')}]"
    defn = (
        "" if default_node_options == ""
        else f"[{default_node_options.strip('[]')}]"
    )
    linestyle = "->" if g.directed else "-"
    if default_edge_options == "":
        defe = "[" + linestyle + "]"
    elif "-" in default_edge_options:
        defe = default_edge_options
    else:
        defe = f"[{linestyle},{default_edge_options.strip('[]')}]"

    result = "  \\begin{tikzpicture}" + topts
    result += i4 + "  \\draw" + defn
    for n in nodes:
        nopts = f"[{node_options[n].strip('[]')}]" if n in node_options else ""
        ntext = f"{{{node_label[n]}}}" if n in node_label else f"{{{n}}}"
        result += i8 + f"{pos[n]} node{nopts} ({n}){ntext}"
    result += ";\n"

    result += "      \\begin{scope}" + defe
    base = g.edges.select("src", "dst")
    edge_list = sorted((r["src"], r["dst"]) for r in base.collect())
    for edge in edge_list:
        u, v = edge
        e_opts = (
            f"{edge_options[edge]}".strip("[]") if edge in edge_options else ""
        )
        if u == v and "loop" not in e_opts:
            e_opts = "loop," + e_opts
        e_opts = f"[{e_opts}]" if e_opts != "" else ""
        els = edge_label_options.get(edge, "")
        els = f"[{els.strip('[]')}]"
        e_lab = (
            f" node{els} {{{edge_label[edge]}}}" if edge in edge_label else ""
        )
        result += i8 + f"\\draw{e_opts} ({u}) to{e_lab} ({v});"
    result += "\n      \\end{scope}\n    \\end{tikzpicture}\n"
    return result


def to_latex(
    gbunch,
    pos=None,
    tikz_options: str = "",
    default_node_options: str = "",
    node_options: dict = None,
    node_label: dict = None,
    default_edge_options: str = "",
    edge_options: dict = None,
    edge_label: dict = None,
    edge_label_options: dict = None,
    caption: str = "",
    latex_label: str = "",
    sub_captions=None,
    sub_labels=None,
    n_rows: int = 1,
    as_document: bool = True,
) -> str:
    """``nx_latex.py`` ``to_latex`` — a figure (or whole document) for
    one graph or an iterable of graphs as subfigures."""
    if isinstance(gbunch, SparkGraph):
        raw = to_latex_raw(
            gbunch, pos, tikz_options, default_node_options, node_options,
            node_label, default_edge_options, edge_options, edge_label,
            edge_label_options,
        )
    else:
        graphs = list(gbunch)
        N = len(graphs)
        if pos is None or isinstance(pos, dict):
            pos = [pos] * N
        if sub_captions is None:
            sub_captions = [""] * N
        if sub_labels is None:
            sub_labels = [""] * N
        if not (N == len(pos) == len(sub_captions) == len(sub_labels)):
            raise NetworkXError(
                "length of Gbunch, sub_captions and sub_figures must agree"
            )
        size = 1 / n_rows
        raw = ""
        for gg, pp, subcap, sublbl in zip(graphs, pos, sub_captions, sub_labels):
            subraw = to_latex_raw(
                gg, pp, tikz_options, default_node_options, node_options,
                node_label, default_edge_options, edge_options, edge_label,
                edge_label_options,
            )
            cap = f"    \\caption{{{subcap}}}" if subcap else ""
            lbl = f"\\label{{{sublbl}}}" if sublbl else ""
            raw += _SUBFIG_WRAPPER.format(
                size=size, content=subraw, caption=cap, label=lbl
            )
            raw += "\n"
    raw = raw[:-1]
    cap = f"\n  \\caption{{{caption}}}" if caption else ""
    lbl = f"\\label{{{latex_label}}}" if latex_label else ""
    fig = _FIG_WRAPPER.format(content=raw, caption=cap, label=lbl)
    if as_document:
        return _DOC_WRAPPER_TIKZ.format(content=fig)
    return fig


def write_latex(g, path: str, **options) -> None:
    """``nx_latex.py`` ``write_latex`` — :func:`to_latex` to a file."""
    with open(path, "w") as f:
        f.write(to_latex(g, **options))
