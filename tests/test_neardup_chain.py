"""Chain-shaped duplicate clusters: the r04 driver divergence class.

``doc_curation_summary`` went driver-red in round 4 because the DuckDB
oracle unrolled min-label propagation to a FIXED 16 rounds while the
engine's connected components run to fixpoint — a dup cluster shaped as a
long chain (doc i ~ doc i+1 only) needs more label rounds than its
diameter lets a fixed unroll cover.  The oracle is now an exact recursive
transitive closure; these tests pin the ENGINE side: a sliding-window
corpus whose dup graph is a 24-hop path must collapse to one cluster with
the minimum doc_id as canonical, through both ``near_duplicates`` and the
full ``curate_corpus`` composition.
"""

import pytest

from linkgraph import text as TX

WORDS = [f"tok{i:03d}" for i in range(60)]


def _chain_docs(spark, n_docs=25, window=30):
    # doc i = words[i : i+window] -> consecutive docs share (window-1)
    # shingles of (window+1): Jaccard ~0.94; non-adjacent pairs fall off
    # fast, so the dup graph at threshold 0.8 is exactly the path.
    rows = [(i, " ".join(WORDS[i : i + window])) for i in range(n_docs)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chain_cluster_collapses_to_min(spark):
    docs = _chain_docs(spark)
    out = {
        r["doc_id"]: r["canonical_doc_id"]
        for r in TX.near_duplicates(
            docs, k=2, num_hashes=16, band_size=2, threshold=0.8
        ).collect()
    }
    assert len(out) == 25
    # every doc in the chain labels to the global minimum — needs the
    # label propagation to cross 24 hops, i.e. run to fixpoint.
    assert set(out.values()) == {0}


def test_chain_survivor_count_via_curation(spark):
    # through the full pipeline: 25 inputs, all pass quality (30 tokens,
    # all alphanumeric) and the neutral language gate, one survivor.
    docs = _chain_docs(spark)
    row = TX.curate_corpus(
        docs, min_tokens=30, min_alpha=0.5, num_hashes=16, threshold=0.8
    ).first()
    assert row["n_input"] == 25
    assert row["n_after_quality"] == 25
    assert row["n_survivors"] == 1
    assert row["tokens_kept"] == 30
