"""Weighted kwargs parity: pagerank(weight=), clustering(weight=)."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.graph import from_nx


def _wG():
    G = nx.Graph()
    for u, v, w in [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (2, 3, 1.5),
                    (3, 4, 2.0), (1, 4, 6.0), (0, 3, 3.0)]:
        G.add_edge(u, v, weight=w)
    return G


def test_pagerank_weight_kwarg(spark):
    from linkgraph.algos.pagerank import pagerank

    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    G = _wG()
    g = from_nx(spark, G)
    # weighted (default) vs unweighted (weight=None) both match the
    # reference's python kernel (nx.pagerank proper needs scipy, absent here)
    for w in ("weight", None):
        want = _pagerank_python(G, weight=w)
        got = {r["id"]: r["rank"] for r in pagerank(g, weight=w).collect()}
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-8), (v, w)
    # and they genuinely differ on this fixture
    a = _pagerank_python(G)
    b = _pagerank_python(G, weight=None)
    assert any(abs(a[v] - b[v]) > 1e-6 for v in a)


def test_weighted_clustering(spark):
    from linkgraph.algos.triangles import clustering, average_clustering

    G = _wG()
    g = from_nx(spark, G)
    want = nx.clustering(G, weight="weight")
    got = {
        r["id"]: r["clustering"]
        for r in clustering(g, weight="weight").collect()
    }
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert average_clustering(g, weight="weight") == pytest.approx(
        nx.average_clustering(G, weight="weight")
    )
    # isolated node -> 0
    G.add_node(99)
    g2 = from_nx(spark, G)
    got2 = {
        r["id"]: r["clustering"]
        for r in clustering(g2, weight="weight").collect()
    }
    assert got2[99] == 0.0


def test_weighted_wiener_and_vitality(spark):
    from linkgraph.algos.neighborhood import wiener_index, closeness_vitality

    G = _wG()
    g = from_nx(spark, G)
    assert wiener_index(g, weight="weight") == pytest.approx(
        nx.wiener_index(G, weight="weight")
    )
    assert closeness_vitality(g, 2, weight="weight") == pytest.approx(
        nx.closeness_vitality(G, node=2, weight="weight")
    )


def test_weighted_degree_assortativity(spark):
    from linkgraph.algos.assortativity import degree_assortativity_coefficient

    G = _wG()
    g = from_nx(spark, G)
    want = nx.degree_assortativity_coefficient(G, weight="weight")
    got = degree_assortativity_coefficient(g, weight="weight")
    assert got == pytest.approx(want, abs=1e-9)
    D = nx.DiGraph()
    for u, v, w in [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0), (1, 3, 4.0),
                    (3, 2, 1.0)]:
        D.add_edge(u, v, weight=w)
    gd = from_nx(spark, D)
    want_d = nx.degree_assortativity_coefficient(D, weight="weight")
    got_d = degree_assortativity_coefficient(gd, weight="weight")
    assert got_d == pytest.approx(want_d, abs=1e-9)


def test_structural_holes_weighted(spark):
    from linkgraph.algos.neighborhood import constraint, effective_size

    G = _wG()
    g = from_nx(spark, G)
    for w in (None, "weight"):
        want_c = nx.constraint(G, weight=w)
        got_c = {
            r["id"]: r["constraint"]
            for r in constraint(g, weight=w).collect()
        }
        for v in want_c:
            assert got_c[v] == pytest.approx(want_c[v], abs=1e-9), (v, w)
        want_e = nx.effective_size(G, weight=w)
        got_e = {
            r["id"]: r["effective_size"]
            for r in effective_size(g, weight=w).collect()
        }
        for v in want_e:
            assert got_e[v] == pytest.approx(want_e[v], abs=1e-9), (v, w)
    # weighted differs from unweighted on this fixture
    cu = nx.constraint(G)
    cw = nx.constraint(G, weight="weight")
    assert any(abs(cu[v] - cw[v]) > 1e-9 for v in cu)


def test_structural_holes_directed_weighted(spark):
    from linkgraph.algos.neighborhood import constraint, effective_size

    D = nx.DiGraph()
    for u, v, w in [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0), (1, 3, 4.0),
                    (3, 2, 1.0), (0, 2, 2.5)]:
        D.add_edge(u, v, weight=w)
    g = from_nx(spark, D)
    for w in (None, "weight"):
        want_c = nx.constraint(D, weight=w)
        got_c = {
            r["id"]: r["constraint"]
            for r in constraint(g, weight=w).collect()
        }
        for v in want_c:
            import math
            if math.isnan(want_c[v]):
                assert got_c.get(v) is None or math.isnan(got_c[v]), (v, w)
            else:
                assert got_c[v] == pytest.approx(want_c[v], abs=1e-9), (v, w)
        want_e = nx.effective_size(D, weight=w)
        got_e = {
            r["id"]: r["effective_size"]
            for r in effective_size(g, weight=w).collect()
        }
        for v in want_e:
            import math
            if math.isnan(want_e[v]):
                assert got_e.get(v) is None or math.isnan(got_e[v]), (v, w)
            else:
                assert got_e[v] == pytest.approx(want_e[v], abs=1e-9), (v, w)


def test_weighted_laplacian_centrality(spark):
    # the reference implementation needs scipy (absent here), so the
    # oracle is the DEFINITION computed densely with numpy: energy =
    # sum of squared Laplacian eigenvalues, centrality = energy drop
    # when the node is removed
    import numpy as np

    from linkgraph.algos.degrees import laplacian_centrality

    G = _wG()
    g = from_nx(spark, G)
    nodes = sorted(G)

    def energy(H, w):
        idx = {n: i for i, n in enumerate(sorted(H))}
        L = np.zeros((len(idx), len(idx)))
        for u, v, d in H.edges(data=True):
            wt = d["weight"] if w else 1.0
            L[idx[u], idx[u]] += wt
            L[idx[v], idx[v]] += wt
            L[idx[u], idx[v]] -= wt
            L[idx[v], idx[u]] -= wt
        return float((np.linalg.eigvalsh(L) ** 2).sum())

    for w in (None, "weight"):
        full = energy(G, w)
        want = {}
        for v in nodes:
            H = G.copy()
            H.remove_node(v)
            want[v] = full - energy(H, w)
        for norm in (True, False):
            got = {
                r["id"]: r["laplacian_centrality"]
                for r in laplacian_centrality(
                    g, normalized=norm, weight=w
                ).collect()
            }
            scale = 1.0 / full if norm else 1.0
            for v in nodes:
                assert got[v] == pytest.approx(want[v] * scale, abs=1e-8), (
                    v, w, norm,
                )


def test_dag_longest_path_weight_contract(spark):
    from linkgraph.algos.dag import dag_longest_path, dag_longest_path_length

    D = nx.DiGraph()
    for u, v, w in [(0, 1, 5.0), (1, 2, 1.0), (0, 3, 1.0), (3, 4, 1.0),
                    (4, 2, 1.0), (2, 5, 2.0)]:
        D.add_edge(u, v, weight=w)
    g = from_nx(spark, D)
    assert dag_longest_path_length(g) == nx.dag_longest_path_length(D)
    assert dag_longest_path(g) == nx.dag_longest_path(D)
    # weight=None counts hops
    assert dag_longest_path_length(g, weight=None) == nx.dag_longest_path_length(
        D, weight=None
    )
    # unknown attribute name falls back to default_weight per edge
    assert dag_longest_path_length(g, weight="nope", default_weight=2.0) == (
        nx.dag_longest_path_length(D, weight="nope", default_weight=2)
    )


def test_weighted_knn_and_mixing(spark):
    from linkgraph.algos.neighborhood import average_degree_connectivity
    from linkgraph.algos.assortativity import (
        node_degree_xy,
        degree_mixing_dict,
        degree_pearson_correlation_coefficient,
    )

    # the reference docstring example
    P = nx.path_graph(4)
    P.edges[1, 2]["weight"] = 3
    for u, v in P.edges():
        P[u][v].setdefault("weight", 1)
    gp = from_nx(spark, P)
    got = {
        r["degree"]: r["knn"]
        for r in average_degree_connectivity(gp, weight="weight").collect()
    }
    want = nx.average_degree_connectivity(P, weight="weight")
    assert got == pytest.approx(want)

    G = _wG()
    g = from_nx(spark, G)
    got2 = {
        r["degree"]: r["knn"]
        for r in average_degree_connectivity(g, weight="weight").collect()
    }
    want2 = nx.average_degree_connectivity(G, weight="weight")
    for k in want2:
        assert got2[k] == pytest.approx(want2[k]), k

    # node_degree_xy strengths multiset parity
    ours = sorted(
        (r["x"], r["y"]) for r in node_degree_xy(g, weight="weight").collect()
    )
    ref = sorted(nx.node_degree_xy(G, weight="weight"))
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        assert a[0] == pytest.approx(b[0]) and a[1] == pytest.approx(b[1])

    # mixing dict keys = strengths
    md = degree_mixing_dict(g, weight="weight")
    ref_md = nx.degree_mixing_dict(G, weight="weight")
    assert {round(k, 9) for k in md} == {round(k, 9) for k in ref_md}

    assert degree_pearson_correlation_coefficient(
        g, weight="weight"
    ) == pytest.approx(nx.degree_assortativity_coefficient(G, weight="weight"), abs=1e-9)


def test_directed_weighted_knn(spark):
    from linkgraph.algos.neighborhood import average_degree_connectivity

    D = nx.DiGraph()
    for u, v, w in [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0), (1, 3, 4.0),
                    (3, 2, 1.0)]:
        D.add_edge(u, v, weight=w)
    g = from_nx(spark, D)
    got = {
        r["degree"]: r["knn"]
        for r in average_degree_connectivity(g, weight="weight").collect()
    }
    want = nx.average_degree_connectivity(D, weight="weight")
    for k in want:
        assert got[k] == pytest.approx(want[k]), k


def test_weighted_index_family(spark):
    from linkgraph.algos.distance import barycenter
    from linkgraph.algos.neighborhood import (
        schultz_index, gutman_index, harmonic_diameter,
    )
    from linkgraph.algos.regularity import hyper_wiener_index

    G = _wG()
    g = from_nx(spark, G)
    assert {r["id"] for r in barycenter(g, weight="weight").collect()} == set(
        nx.barycenter(G, weight="weight")
    )
    assert schultz_index(g, weight="weight") == pytest.approx(
        nx.schultz_index(G, weight="weight")
    )
    assert gutman_index(g, weight="weight") == pytest.approx(
        nx.gutman_index(G, weight="weight")
    )
    assert harmonic_diameter(g, weight="weight") == pytest.approx(
        nx.harmonic_diameter(G, weight="weight")
    )
    # weighted all-pairs via the dijkstra table
    want_hw = 0.0
    import itertools
    for u, v in itertools.combinations(sorted(G), 2):
        d = nx.dijkstra_path_length(G, u, v)
        want_hw += 0.5 * (d + d * d)
    assert hyper_wiener_index(g, weight="weight") == pytest.approx(want_hw)


def test_to_numpy_array_weight_contract(spark):
    import numpy as np

    from linkgraph.convert_matrix import to_numpy_array

    G = _wG()
    g = from_nx(spark, G)
    A_w = to_numpy_array(g)
    want_w = nx.to_numpy_array(G)  # nx default weight="weight"
    assert np.allclose(A_w, want_w)
    A_u = to_numpy_array(g, weight=None)
    want_u = nx.to_numpy_array(G, weight=None)
    assert np.allclose(A_u, want_u)
    assert not np.allclose(A_w, A_u)


def test_kwarg_parity_extras(spark):
    from linkgraph.algos.distance import closeness_centrality
    from linkgraph.algos.triangles import clustering, average_clustering
    from linkgraph.algos.bridges import bridges
    from linkgraph.algos.neighborhood import closeness_vitality, wiener_index

    G = _wG()
    g = from_nx(spark, G)
    # single-node closeness returns a float like the reference
    assert closeness_centrality(g, 2) == pytest.approx(
        nx.closeness_centrality(G, 2)
    )
    # clustering over a node subset
    want = nx.clustering(G, nodes=[0, 2])
    got = {r["id"]: r["clustering"] for r in clustering(g, nodes=[0, 2]).collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v])
    assert average_clustering(g, nodes=[0, 2]) == pytest.approx(
        sum(want.values()) / 2
    )
    # bridges restricted to a root's component
    H = nx.disjoint_union(nx.path_graph(3), nx.cycle_graph(4))
    gh = from_nx(spark, H)
    got_b = {(r["u"], r["v"]) for r in bridges(gh, root=0).collect()}
    want_b = {tuple(sorted(e)) for e in nx.bridges(H, root=0)}
    assert got_b == want_b
    # precomputed wiener passthrough
    wi = wiener_index(g)
    assert closeness_vitality(g, 2, wiener_index=wi) == pytest.approx(
        nx.closeness_vitality(G, node=2)
    )


def test_weighted_reaching_centrality(spark):
    from linkgraph.algos.hierarchy import (
        local_reaching_centrality, global_reaching_centrality,
    )

    D = nx.DiGraph()
    # distinct weights -> unique shortest paths under the inverted metric
    for u, v, w in [(0, 1, 2.0), (0, 2, 7.0), (1, 3, 3.0), (2, 3, 1.0),
                    (3, 4, 5.0), (1, 4, 11.0)]:
        D.add_edge(u, v, weight=w)
    g = from_nx(spark, D)
    for norm in (True, False):
        got = {
            r["id"]: r["lrc"]
            for r in local_reaching_centrality(
                g, weight="weight", normalized=norm
            ).collect()
        }
        for v in D:
            want = nx.local_reaching_centrality(
                D, v, weight="weight", normalized=norm
            )
            assert got[v] == pytest.approx(want, abs=1e-9), (v, norm)
        assert global_reaching_centrality(
            g, weight="weight", normalized=norm
        ) == pytest.approx(
            nx.global_reaching_centrality(D, weight="weight", normalized=norm),
            abs=1e-9,
        )
    # unweighted stays green
    assert global_reaching_centrality(g) == pytest.approx(
        nx.global_reaching_centrality(D)
    )


def test_weighted_local_bridges_span(spark):
    import math

    from linkgraph.algos.neighborhood import local_bridges

    G = nx.Graph()
    # a bridge (3,4) between two triangles plus a weighted detour
    for u, v, w in [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 3.0), (2, 3, 1.0),
                    (3, 4, 5.0), (4, 5, 1.0), (5, 6, 2.0), (6, 4, 3.0),
                    (0, 6, 10.0)]:
        G.add_edge(u, v, weight=w)
    g = from_nx(spark, G)
    want = {
        (min(u, v), max(u, v)): s
        for u, v, s in nx.local_bridges(G, weight="weight")
    }
    got = {
        (r["u"], r["v"]): r["span"]
        for r in local_bridges(g, with_span=True, weight="weight").collect()
    }
    assert set(got) == set(want)
    for k, s in want.items():
        if math.isinf(s):
            assert got[k] is None, k
        else:
            assert got[k] == pytest.approx(s), k


def test_average_neighbor_degree_variants(spark):
    from linkgraph.algos.neighborhood import average_neighbor_degree

    D = nx.DiGraph()
    for u, v, w in [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0), (1, 3, 4.0),
                    (3, 2, 1.0)]:
        D.add_edge(u, v, weight=w)
    g = from_nx(spark, D)
    for src in ("in", "out", "in+out"):
        for tgt in ("in", "out", "in+out"):
            for w in (None, "weight"):
                want = nx.average_neighbor_degree(
                    D, source=src, target=tgt, weight=w
                )
                got = {
                    r["id"]: r["avg_nbr_deg"]
                    for r in average_neighbor_degree(
                        g, source=src, target=tgt, weight=w
                    ).collect()
                }
                for v in want:
                    assert got[v] == pytest.approx(want[v]), (v, src, tgt, w)
    # nodes filter
    sub = average_neighbor_degree(g, nodes=[1, 2]).collect()
    assert {r["id"] for r in sub} == {1, 2}


def test_closeness_vitality_all_nodes(spark):
    from linkgraph.algos.neighborhood import closeness_vitality

    G = _wG()
    g = from_nx(spark, G)
    want = nx.closeness_vitality(G)
    got = {
        r["id"]: r["closeness_vitality"]
        for r in closeness_vitality(g).collect()
    }
    for v in want:
        assert got[v] == pytest.approx(want[v]), v


def test_normalized_algebraic_connectivity(spark):
    import numpy as np

    from linkgraph.algos.fiedler import algebraic_connectivity, fiedler_vector

    G = _wG()
    g = from_nx(spark, G)
    nodes = sorted(G)
    idx = {n: i for i, n in enumerate(nodes)}
    L = np.zeros((len(nodes), len(nodes)))
    for u, v, d in G.edges(data=True):
        w = d["weight"]
        L[idx[u], idx[u]] += w
        L[idx[v], idx[v]] += w
        L[idx[u], idx[v]] -= w
        L[idx[v], idx[u]] -= w
    dinv = np.diag(1.0 / np.sqrt(np.diag(L)))
    Ln = dinv @ L @ dinv
    lam2 = np.sort(np.linalg.eigvalsh(Ln))[1]
    got = algebraic_connectivity(g, weight="weight", normalized=True)
    assert got == pytest.approx(lam2, rel=1e-5)
    # the vector satisfies the eigen equation and is sqrt(d)-orthogonal
    fv = {r["id"]: r["value"] for r in
          fiedler_vector(g, weight="weight", normalized=True).collect()}
    v = np.array([fv[n] for n in nodes])
    assert np.linalg.norm(Ln @ v - lam2 * v) < 1e-4
    sq = np.sqrt(np.diag(L))
    assert abs(v @ sq) < 1e-6
    # unnormalized path still matches the plain lambda2
    lam2p = np.sort(np.linalg.eigvalsh(L))[1]
    assert algebraic_connectivity(g, weight="weight") == pytest.approx(
        lam2p, rel=1e-5
    )


def test_attribute_mixing_kwargs(spark):
    from linkgraph.graph import SparkGraph
    from linkgraph.algos.assortativity import (
        attribute_assortativity_coefficient,
        attribute_mixing_dict,
        attribute_mixing_matrix,
    )

    G = nx.Graph([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    colors = {0: "r", 1: "b", 2: "r", 3: "b"}
    nx.set_node_attributes(G, colors, "color")
    edf = spark.createDataFrame(list(G.edges()), "src long, dst long")
    vdf = spark.createDataFrame(
        [(n, c) for n, c in colors.items()], "id long, color string"
    )
    g = SparkGraph(edf, vertices=vdf, directed=False, coalesce_edges=False)
    sub = [0, 1, 2]
    assert attribute_assortativity_coefficient(
        g, "color", nodes=sub
    ) == pytest.approx(
        nx.attribute_assortativity_coefficient(G, "color", nodes=sub)
    )
    got = attribute_mixing_dict(g, "color", normalized=True)
    want = nx.attribute_mixing_dict(G, "color", normalized=True)
    for x in want:
        for y in want[x]:
            assert got[x][y] == pytest.approx(want[x][y]), (x, y)
    mapping = {"r": 0, "b": 1}
    M, idx = attribute_mixing_matrix(g, "color", mapping=mapping)
    import numpy as np
    Mref = nx.attribute_mixing_matrix(G, "color", mapping=mapping)
    assert np.allclose(M, Mref)
    assert idx == mapping


def test_astar_cutoff(spark):
    from linkgraph.algos.sssp import astar_path_length
    from linkgraph.exceptions import NetworkXError

    G = _wG()
    g = from_nx(spark, G)
    want = nx.astar_path_length(G, 0, 4, weight="weight")
    assert astar_path_length(g, 0, 4, weight="weight") == pytest.approx(want)
    # generous cutoff: same answer; tight cutoff: unreachable, like nx
    assert astar_path_length(
        g, 0, 4, weight="weight", cutoff=want + 1
    ) == pytest.approx(want)
    with pytest.raises(NetworkXError):
        astar_path_length(g, 0, 4, weight="weight", cutoff=want - 0.5)
    with pytest.raises(nx.NetworkXNoPath):
        nx.astar_path_length(G, 0, 4, weight="weight", cutoff=want - 0.5)


def test_linkpred_ebunch_spelling(spark):
    from linkgraph.algos.linkpred import (
        jaccard_coefficient, adamic_adar_index, preferential_attachment,
        resource_allocation_index,
    )

    G = _wG()
    g = from_nx(spark, G)
    eb = [(0, 4), (1, 3)]
    for ours, ref, col in [
        (jaccard_coefficient, nx.jaccard_coefficient, "jaccard"),
        (adamic_adar_index, nx.adamic_adar_index, "aa_index"),
        (preferential_attachment, nx.preferential_attachment, "pa"),
        (resource_allocation_index, nx.resource_allocation_index, "ra_index"),
    ]:
        got = {(r["u"], r["v"]): r[col] for r in ours(g, ebunch=eb).collect()}
        want = {(u, v): s for u, v, s in ref(G, ebunch=eb)}
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k]), (col, k)


def test_param_parity_batch(spark):
    from linkgraph.generators import barabasi_albert_graph, cycle_graph
    from linkgraph.algos.paths import all_shortest_paths
    from linkgraph.algos.kcomponents import all_pairs_node_connectivity
    from linkgraph.algos.flow import average_node_connectivity

    # BA with an initial graph: seed edges preserved, growth attaches
    g0 = cycle_graph(spark, 5)
    g = barabasi_albert_graph(spark, 30, 2, seed=3, initial_graph=g0)
    assert g.number_of_nodes() == 30
    edges = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    for u, v in [(0, 1), (1, 2), (2, 3), (3, 4)]:
        assert (u, v) in edges or (v, u) in edges
    # method/flow_func accepted (same results by construction)
    G = nx.path_graph(4)
    gp = from_nx(spark, G)
    assert all_shortest_paths(gp, 0, 3, method="dijkstra") == [[0, 1, 2, 3]]
    assert average_node_connectivity(gp, flow_func="anything") == pytest.approx(
        nx.average_node_connectivity(G)
    )
    out = all_pairs_node_connectivity(gp, flow_func=None)
    assert out.count() > 0
