"""Parity tests for degree-sequence realizability vs the reference
(networkx/algorithms/graphical.py)."""

import random

import networkx as nx
import pytest

from linkgraph.algos import graphical as lgg


def _random_sequences(seed, n_cases=200, max_len=12, max_deg=12):
    rng = random.Random(seed)
    for _ in range(n_cases):
        p = rng.randint(0, max_len)
        yield [rng.randint(0, max_deg) for _ in range(p)]


def test_is_graphical_random_parity():
    for seq in _random_sequences(1):
        assert lgg.is_graphical(seq) == nx.is_graphical(seq), seq
        assert lgg.is_valid_degree_sequence_erdos_gallai(
            seq
        ) == nx.is_valid_degree_sequence_erdos_gallai(seq), seq
        assert lgg.is_valid_degree_sequence_havel_hakimi(
            seq
        ) == nx.is_valid_degree_sequence_havel_hakimi(seq), seq


def test_is_graphical_true_sequences():
    # degree sequences of actual graphs are always graphical
    for seed in range(10):
        G = nx.gnp_random_graph(15, 0.3, seed=seed)
        seq = [d for _, d in G.degree()]
        assert lgg.is_graphical(seq)
        assert nx.is_graphical(seq)


def test_multigraphical_pseudographical_parity():
    for seq in _random_sequences(2):
        assert lgg.is_multigraphical(seq) == nx.is_multigraphical(seq), seq
        if seq:
            assert lgg.is_pseudographical(seq) == nx.is_pseudographical(seq), seq


def test_is_digraphical_random_parity():
    rng = random.Random(3)
    for _ in range(300):
        p = rng.randint(0, 8)
        ins = [rng.randint(0, 6) for _ in range(p)]
        outs = [rng.randint(0, 6) for _ in range(p)]
        assert lgg.is_digraphical(ins, outs) == nx.is_digraphical(ins, outs), (
            ins,
            outs,
        )
    # degree pairs of actual digraphs
    for seed in range(10):
        D = nx.gnp_random_graph(10, 0.3, seed=seed, directed=True)
        ins = [d for _, d in D.in_degree()]
        outs = [d for _, d in D.out_degree()]
        assert lgg.is_digraphical(ins, outs)


def test_dataframe_and_graph_inputs(spark):
    from linkgraph.graph import from_nx

    G = nx.gnp_random_graph(20, 0.25, seed=4)
    seq = [d for _, d in G.degree()]
    df = spark.createDataFrame([(d,) for d in seq], "degree long")
    assert lgg.is_graphical(df)
    assert lgg.is_graphical(from_nx(spark, G))
    # broken sequence via DataFrame
    bad = spark.createDataFrame([(3,), (1,)], "degree long")
    assert not lgg.is_graphical(bad)


def test_method_guard():
    with pytest.raises(ValueError):
        lgg.is_graphical([1, 1], method="nope")
