"""Joint-degree (degree-correlation) graph realization.

Reference: ``networkx/generators/joint_degree_seq.py`` —
``is_valid_joint_degree``, ``joint_degree_graph`` (Gjoka, Kurant &
Markopoulou 2015: realize a target joint degree matrix exactly, using
neighbor switches to free saturated endpoints), and the directed pair
``is_valid_directed_joint_degree`` / ``directed_joint_degree_graph``
(Tillman, Markopoulou, Gjoka & Butts 2017).

The construction is a sequential edge-by-edge process with global
residual state — inherently driver-side; the returned graph is the
distributed object. Checks are O(|degree classes|²) driver math.
"""

from __future__ import annotations

import random as _random

from pyspark.sql import SparkSession

from linkgraph.exceptions import NetworkXError
from linkgraph.graph import SparkGraph

__all__ = [
    "is_valid_joint_degree",
    "joint_degree_graph",
    "is_valid_directed_joint_degree",
    "directed_joint_degree_graph",
]


def is_valid_joint_degree(joint_degrees) -> bool:
    """``joint_degree_seq.py`` ``is_valid_joint_degree`` — the Erdős-
    Gallai-style realizability conditions for a joint degree dict:
    integer class sizes, integer entries, pair capacity bounds, and even
    diagonal."""
    counts = {}
    for k, row in joint_degrees.items():
        if k > 0:
            size = sum(row.values()) / k
            if size != int(size):
                return False
            counts[k] = size
    for k, row in joint_degrees.items():
        for l, val in row.items():
            if float(val) != int(val):
                return False
            if k != l:
                if val > counts[k] * counts[l]:
                    return False
            else:
                if val > counts[k] * (counts[k] - 1):
                    return False
                if val % 2 != 0:
                    return False
    return True


def _switch(adj, w, unsat, residual, avoid=None):
    """Free one unit of capacity on saturated node ``w`` by moving one of
    its edges to an unsaturated same-degree node."""
    if avoid is None or residual[avoid] > 1:
        w_prime = next(iter(unsat))
    else:
        w_prime = next(x for x in unsat if x != avoid)
    target = next(
        v for v in adj[w] if v not in adj[w_prime] and v != w_prime
    )
    adj[w].discard(target)
    adj[target].discard(w)
    adj[w_prime].add(target)
    adj[target].add(w_prime)
    residual[w] += 1
    residual[w_prime] -= 1
    if residual[w_prime] == 0:
        unsat.discard(w_prime)


def joint_degree_graph(
    spark: SparkSession, joint_degrees, seed: int = 0
) -> SparkGraph:
    """``joint_degree_seq.py`` ``joint_degree_graph`` — a simple graph
    whose joint degree matrix EQUALS ``joint_degrees``. Nodes are grouped
    by degree class; random (v, w) proposals are repaired by neighbor
    switches whenever an endpoint is already saturated."""
    if not is_valid_joint_degree(joint_degrees):
        raise NetworkXError(
            "Input joint degree dict not realizable as a simple graph"
        )
    rng = _random.Random(int(seed))
    counts = {k: sum(row.values()) // k for k, row in joint_degrees.items() if k > 0}
    n = sum(counts.values())
    nodelist = {}
    residual = {}
    nid = 0
    for degree, num in counts.items():
        nodelist[degree] = list(range(nid, nid + int(num)))
        for v in nodelist[degree]:
            residual[v] = degree
        nid += int(num)
    adj = {v: set() for v in range(n)}
    for k, row in joint_degrees.items():
        for l, val in row.items():
            if val <= 0 or k < l:
                continue
            k_nodes, l_nodes = nodelist[k], nodelist[l]
            k_unsat = {v for v in k_nodes if residual[v] > 0}
            if k != l:
                l_unsat = {w for w in l_nodes if residual[w] > 0}
                to_add = val
            else:
                l_unsat = k_unsat
                to_add = val // 2
            while to_add > 0:
                v = k_nodes[rng.randrange(len(k_nodes))]
                w = l_nodes[rng.randrange(len(l_nodes))]
                if v == w or w in adj[v]:
                    continue
                if residual[v] == 0:
                    _switch(adj, v, k_unsat, residual)
                if residual[w] == 0:
                    _switch(adj, w, l_unsat, residual,
                            avoid=v if k == l else None)
                adj[v].add(w)
                adj[w].add(v)
                residual[v] -= 1
                residual[w] -= 1
                to_add -= 1
                if residual[v] == 0:
                    k_unsat.discard(v)
                if residual[w] == 0:
                    l_unsat.discard(w)
    edges = sorted(
        {(min(u, v), max(u, v)) for u, nbrs in adj.items() for v in nbrs}
    )
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    v_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return SparkGraph(e, v_df, directed=False, coalesce_edges=False)


def is_valid_directed_joint_degree(in_degrees, out_degrees, nkk) -> bool:
    """``joint_degree_seq.py`` ``is_valid_directed_joint_degree`` —
    realizability of a directed joint out/in degree matrix given the
    paired in/out degree sequences."""
    if len(in_degrees) != len(out_degrees):
        return False
    V = {}
    forbidden = {}
    for i, o in zip(in_degrees, out_degrees):
        V[(i, 0)] = V.get((i, 0), 0) + 1
        V[(o, 1)] = V.get((o, 1), 0) + 1
        forbidden[(o, i)] = forbidden.get((o, i), 0) + 1
    S = {}
    for k, row in nkk.items():
        for l, val in row.items():
            if float(val) != int(val):
                return False
            if val > 0:
                S[(k, 1)] = S.get((k, 1), 0) + val
                S[(l, 0)] = S.get((l, 0), 0) + val
                if val + forbidden.get((k, l), 0) > V[(k, 1)] * V[(l, 0)]:
                    return False
    return all(S[s] / s[0] == V[s] for s in S)


def _dswitch_out(succ, pred, w, unsat, res_out, chords, part_in, partition):
    """Directed neighbor switch on out-stubs (Tillman et al. 2017)."""
    w_prime = next(iter(unsat))
    for v in list(succ[w]):
        if v not in succ[w_prime] and w_prime != v:
            succ[w].discard(v)
            pred[v].discard(w)
            succ[w_prime].add(v)
            pred[v].add(w_prime)
            if part_in[v] == partition:
                chords.add((w, v))
                chords.discard((w_prime, v))
            res_out[w] += 1
            res_out[w_prime] -= 1
            if res_out[w_prime] == 0:
                unsat.discard(w_prime)
            return None
    return w_prime


def _dswitch_in(succ, pred, w, unsat, res_in, chords, part_out, partition):
    """Directed neighbor switch on in-stubs."""
    w_prime = next(iter(unsat))
    for v in list(pred[w]):
        if v not in pred[w_prime] and w_prime != v:
            succ[v].discard(w)
            pred[w].discard(v)
            succ[v].add(w_prime)
            pred[w_prime].add(v)
            if part_out[v] == partition:
                chords.add((v, w))
                chords.discard((v, w_prime))
            res_in[w] += 1
            res_in[w_prime] -= 1
            if res_in[w_prime] == 0:
                unsat.discard(w_prime)
            return None
    return w_prime


def directed_joint_degree_graph(
    spark: SparkSession, in_degrees, out_degrees, nkk, seed: int = 0
) -> SparkGraph:
    """``joint_degree_seq.py`` ``directed_joint_degree_graph`` — a simple
    digraph realizing the directed joint degree matrix ``nkk`` with the
    given in/out degree sequences exactly."""
    if not is_valid_directed_joint_degree(in_degrees, out_degrees, nkk):
        raise NetworkXError("Input is not realizable as a simple graph")
    rng = _random.Random(int(seed))
    n = len(in_degrees)
    succ = {v: set() for v in range(n)}
    pred = {v: set() for v in range(n)}
    in_nodes, in_unsat = {}, {}
    out_nodes, out_unsat = {}, {}
    res_in, res_out = {}, {}
    part_in, part_out = {}, {}
    non_chords = {}
    for idx, i in enumerate(in_degrees):
        if i > 0:
            in_nodes.setdefault(i, []).append(idx)
            in_unsat.setdefault(i, set()).add(idx)
            res_in[idx] = i
            part_in[idx] = i
    for idx, o in enumerate(out_degrees):
        non_chords[(o, in_degrees[idx])] = non_chords.get((o, in_degrees[idx]), 0) + 1
        if o > 0:
            out_nodes.setdefault(o, []).append(idx)
            out_unsat.setdefault(o, set()).add(idx)
            res_out[idx] = o
            part_out[idx] = o
    for k, row in nkk.items():
        for l, val in row.items():
            if val <= 0:
                continue
            chords = set()
            k_len = len(out_nodes[k])
            l_len = len(in_nodes[l])
            sample = rng.sample(
                range(k_len * l_len), val + non_chords.get((k, l), 0)
            )
            num = 0
            while len(chords) < val:
                i = out_nodes[k][sample[num] % k_len]
                j = in_nodes[l][sample[num] // k_len]
                num += 1
                if i != j:
                    chords.add((i, j))
            k_unsat = out_unsat[k]
            l_unsat = in_unsat[l]
            to_add = val
            while to_add > 0:
                v, w = next(iter(chords))
                if res_out[v] == 0:
                    alt = _dswitch_out(succ, pred, v, k_unsat, res_out,
                                       chords, part_in, l)
                    if alt is not None:
                        v = alt
                if res_in[w] == 0:
                    alt = _dswitch_in(succ, pred, w, l_unsat, res_in,
                                      chords, part_out, k)
                    if alt is not None:
                        w = alt
                succ[v].add(w)
                pred[w].add(v)
                res_out[v] -= 1
                res_in[w] -= 1
                to_add -= 1
                chords.discard((v, w))
                if res_out[v] == 0:
                    k_unsat.discard(v)
                if res_in[w] == 0:
                    l_unsat.discard(w)
    edges = sorted((u, v) for u, nbrs in succ.items() for v in nbrs)
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    v_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return SparkGraph(e, v_df, directed=True, coalesce_edges=False)
