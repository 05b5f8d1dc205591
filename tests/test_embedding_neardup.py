"""Tests for the embedding-cosine near-duplicate pipeline."""

import math
import random

import pytest
from pyspark.sql import functions as F

from linkgraph.embeddings import embedding_near_duplicates


def _emb_df(spark, n=60, dim=8, seed=3, dup_every=5):
    """n random unit-ish vectors; every ``dup_every``-th gets an exact
    duplicate at id+1000 -> known clusters {i, i+1000}."""
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        v = [rnd.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, v))
        if i % dup_every == 0:
            rows.append((i + 1000, list(v)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _clusters(rows):
    out = {}
    for r in rows:
        out.setdefault(r["canonical_vec_id"], set()).add(r["vec_id"])
    return {frozenset(v) for v in out.values()}


def test_exact_clusters(spark):
    emb = _emb_df(spark)
    rows = embedding_near_duplicates(emb, 0.999, method="exact", dim=8).collect()
    cl = _clusters(rows)
    # every 5th id clusters with its shifted copy; everything else is alone
    for i in range(0, 60, 5):
        assert frozenset({i, i + 1000}) in cl
    assert frozenset({7}) in cl


def test_canonical_is_min(spark):
    emb = _emb_df(spark)
    rows = embedding_near_duplicates(emb, 0.999, method="exact", dim=8).collect()
    for r in rows:
        assert r["canonical_vec_id"] <= r["vec_id"]


def test_lsh_finds_exact_duplicates(spark):
    # identical vectors always share every bucket -> LSH recall on exact
    # duplicates is 1.0 regardless of the hyperplanes
    emb = _emb_df(spark)
    exact = _clusters(
        embedding_near_duplicates(emb, 0.999, method="exact", dim=8).collect()
    )
    lsh = _clusters(
        embedding_near_duplicates(emb, 0.999, method="lsh", dim=8).collect()
    )
    assert lsh == exact


def test_threshold_low_merges_more(spark):
    emb = _emb_df(spark)
    hi = embedding_near_duplicates(emb, 0.999, method="exact", dim=8)
    lo = embedding_near_duplicates(emb, 0.5, method="exact", dim=8)
    n_hi = hi.filter(F.col("vec_id") == F.col("canonical_vec_id")).count()
    n_lo = lo.filter(F.col("vec_id") == F.col("canonical_vec_id")).count()
    assert n_lo <= n_hi


def test_bad_method_raises(spark):
    emb = _emb_df(spark, n=5)
    with pytest.raises(ValueError):
        embedding_near_duplicates(emb, method="nope")
