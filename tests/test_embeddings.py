"""Tests for linkgraph.embeddings — brute-force and LSH similarity search."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph import embeddings as EMB


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    dim = 16
    base = rng.normal(size=(10, dim))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # a near-copy of each base vector at id 100+i (tiny noise)
        rows.append((100 + i, [float(x) for x in v + rng.normal(scale=0.01, size=dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_cosine_topk_matches_numpy(emb):
    data = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    queries = emb.filter(F.col("vec_id") < 3)
    got = EMB.cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cosine"]))
    for qid in (0, 1, 2):
        truth = sorted(
            ((nid, round(_cos(data[qid], v), 4)) for nid, v in data.items() if nid != qid),
            key=lambda t: (-t[1], t[0]),
        )[:5]
        assert by_q[qid] == truth
        # the planted near-copy must be the top neighbor
        assert by_q[qid][0][0] == 100 + qid


def test_topk_k_rows_per_query(emb):
    queries = emb.filter(F.col("vec_id") < 4)
    got = EMB.cosine_topk(emb, queries, k=3)
    counts = {r["query_id"]: r["n"] for r in got.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}


def test_ann_finds_planted_near_dups(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    got = EMB.ann_topk(emb, queries, k=3, dim=16, n_tables=6, n_bits=4).collect()
    top1 = {}
    for r in got:
        cur = top1.get(r["query_id"])
        if cur is None or r["cosine"] > cur[1]:
            top1[r["query_id"]] = (r["neighbor_id"], r["cosine"])
    # near-copies are nearly parallel -> same bucket in virtually every
    # table; require >=8/10 recall of the planted duplicate as top-1
    hits = sum(1 for qid, (nid, _) in top1.items() if nid == 100 + qid)
    assert hits >= 8


def test_ann_is_subset_quality(emb):
    """ANN cosines are exact for the pairs it returns (re-rank is exact)."""
    data = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    queries = emb.filter(F.col("vec_id") < 2)
    for r in EMB.ann_topk(emb, queries, k=5, dim=16).collect():
        assert r["cosine"] == round(_cos(data[r["query_id"]], data[r["neighbor_id"]]), 4)


# ------------------------------- IVF path ------------------------------- #


def test_ivf_finds_planted_near_dups(emb):
    queries = emb.filter(F.col("vec_id") < 3)
    got = EMB.ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=2)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qid in (0, 1, 2):
        # the planted near-copy shares the query's centroid by construction
        assert by_q[qid][0] == 100 + qid


def test_ivf_recall_vs_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in EMB.cosine_topk(emb, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in EMB.ivf_topk(
            emb, queries, k=3, n_centroids=4, n_probe=3
        ).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.6, recall
    # scores must be exact cosines for whatever candidates it returns
    data = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for r in EMB.ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=3).collect():
        assert r["cosine"] == pytest.approx(
            round(_cos(data[r["query_id"]], data[r["neighbor_id"]]), 4), abs=1e-9
        )


def test_ivf_deterministic(emb):
    queries = emb.filter(F.col("vec_id") < 4)
    a = sorted(map(tuple, EMB.ivf_topk(emb, queries, k=3, n_centroids=4).collect()))
    b = sorted(map(tuple, EMB.ivf_topk(emb, queries, k=3, n_centroids=4).collect()))
    assert a == b
