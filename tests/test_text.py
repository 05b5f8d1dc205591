"""Tests for linkgraph.text — dedup / similarity / quality operators."""

import pytest
from pyspark.sql import functions as F

from linkgraph import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "completely different content about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "one"),  # shorter than shingle width
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_counts(docs):
    got = {r["doc_id"]: r["n_tokens"] for r in TX.token_counts(docs).collect()}
    assert got == {0: 9, 1: 9, 2: 6, 3: 9, 4: 1}


def test_exact_duplicates(docs):
    groups = TX.exact_duplicates(docs).collect()
    by_canon = {r["canonical_doc_id"]: r["n_docs"] for r in groups}
    assert by_canon[0] == 2  # docs 0 and 3
    assert by_canon[1] == 1
    assert len(groups) == 4


def test_word_shingles(docs):
    sh = TX.word_shingles(docs, k=2).filter(F.col("doc_id") == 2).collect()
    got = {r["shingle"] for r in sh}
    assert got == {
        "completely different",
        "different content",
        "content about",
        "about spark",
        "spark engines",
    }
    # doc 4 is too short for a 2-shingle
    assert TX.word_shingles(docs, k=2).filter(F.col("doc_id") == 4).count() == 0


def test_ngram_jaccard_exact_values(docs):
    pairs = TX.ngram_jaccard_pairs(docs, k=2, threshold=0.0).collect()
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    # docs 0/3 identical: jaccard 1; docs 0/1 share 7 of 9 shingles:
    # |inter|=7, |union|=8+8-7=9
    assert j[(0, 3)] == 1.0
    assert j[(0, 1)] == round(7 / 9, 6)
    assert (0, 2) not in j  # no shared shingles


def test_minhash_lsh_finds_near_dups(docs):
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in TX.minhash_lsh_pairs(docs, k=2, num_hashes=8, band_size=2).collect()
    }
    # exact dup must always collide; high-jaccard pair almost surely does
    assert (0, 3) in cand
    assert (0, 1) in cand
    assert (0, 2) not in cand


def test_minhash_lsh_candidates_superset_check(spark, docs):
    """LSH candidates at threshold ~0.8 should all have decent true jaccard
    on this tiny corpus (no unlucky bands with 8x2 config here)."""
    cand = TX.minhash_lsh_pairs(docs, k=2, num_hashes=8, band_size=2)
    truth = TX.ngram_jaccard_pairs(docs, k=2, threshold=0.0).select(
        "doc_a", "doc_b", "jaccard"
    )
    joined = cand.join(truth, ["doc_a", "doc_b"], "left").collect()
    for r in joined:
        assert r["jaccard"] is not None and r["jaccard"] > 0.5


def test_quality_features(docs):
    r = {
        row["doc_id"]: row
        for row in TX.quality_features(docs).collect()
    }
    # doc 0: 9 tokens, 35 letters total; stopwords present
    assert r[0]["n_tokens"] == 9
    assert r[0]["alpha_ratio"] == 1.0
    assert r[0]["stopword_ratio"] > 0
    assert r[4]["n_tokens"] == 1


def test_language_id(spark):
    rows = [
        (0, "der hund ist nicht mit der katze"),
        (1, "the dog is on the mat"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["predicted_lang"] for r in TX.language_id(df).collect()}
    assert got == {0: "de", 1: "en"}


def test_fingerprints_normalize_whitespace(spark):
    rows = [(0, "Hello   World"), (1, "hello world"), (2, "other text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = {r["doc_id"]: r["fp"] for r in TX.fingerprints(df).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_simhash_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base.replace("today", "tonight")),        # near-dup of 0
        (2, "completely unrelated words about spark catalyst tungsten"),
        (3, base),                                    # exact dup of 0
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {r["doc_id"]: r["simhash"] for r in TX.simhash64(docs).collect()}
    assert fps[0] == fps[3]  # identical text -> identical fingerprint
    # near-dup within small hamming; unrelated far away
    ham = lambda a, b: bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1")
    assert ham(0, 1) <= 6
    assert ham(0, 2) > 10

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in TX.simhash_near_dups(docs, max_hamming=6).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 0
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_simhash_deterministic(spark):
    rows = [(i, f"doc number {i} with shared vocabulary tokens") for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {r["doc_id"]: r["simhash"] for r in TX.simhash64(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in TX.simhash64(docs.repartition(7)).collect()}
    assert a == b
