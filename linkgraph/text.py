"""Text-analysis and deduplication operators over a ``documents`` table.

The training-data-pipeline surface: exact dedup, n-gram Jaccard near-dup,
MinHash+LSH candidate generation, token statistics, quality scoring,
heuristic language ID, and rolling fingerprints — everything as built-in
``pyspark.sql.functions`` expressions (whole-stage codegen, no Python in the
hot path). Every operator here is deliberately expressible in portable ANSI
SQL so the DuckDB oracle can verify it value-for-value.

Determinism/portability notes:

- Hashing uses ``md5`` (hex string) — the one hash both Spark and DuckDB
  implement identically. MinHash takes the **lexicographic minimum of the
  md5 hex digests** per seeded permutation: min-over-strings is a valid
  min-wise scheme (the digest is uniform) and is bit-portable across
  engines, unlike integer xxhash variants.
- Tokenization is ``split(trim(text), '\\s+')`` — whitespace tokens only.

Scale shape (100 TB story): everything is scan → project → explode →
hash-agg; the only shuffles are the groupBys on (doc, shingle)-shaped keys
and the shingle/band equi-joins for candidate pairs. Band buckets are the
LSH join keys, so near-dup detection never goes O(n²); the exact Jaccard
verify join runs only on LSH candidates at scale (the all-pairs form below
is for oracle-checkable small inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, toks ARRAY<STRING>) — whitespace tokenization."""
    return docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens BIGINT)."""
    return tokens(docs).select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: (text_md5, n_docs, canonical_doc_id).

    ``canonical_doc_id`` is the minimum doc_id of the group — the survivor
    a dedup pass would keep.
    """
    return (
        docs.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("canonical_doc_id"),
        )
    )


def word_shingles(docs: DataFrame, k: int = 2) -> DataFrame:
    """(doc_id, shingle) — distinct k-word shingles joined by single spaces."""
    t = tokens(docs)
    idx = F.sequence(F.lit(0), F.size("toks") - F.lit(k))
    return (
        t.filter(F.size("toks") >= k)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, k)),
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 2, threshold: float = 0.8
) -> DataFrame:
    """Near-duplicate pairs by exact Jaccard over k-word shingle sets:
    (doc_a, doc_b, jaccard DOUBLE rounded to 6), doc_a < doc_b.

    The shingle equi-join finds only pairs with ≥1 shared shingle, so the
    candidate space is bounded by shingle co-occurrence, not n².
    """
    sh = word_shingles(docs, k).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def minhash_signatures(
    docs: DataFrame, k: int = 2, num_hashes: int = 8
) -> DataFrame:
    """(doc_id, sig ARRAY<STRING>) — MinHash signature per document.

    Permutation ``i`` is ``md5(i || '#' || shingle)``; the signature element
    is the lexicographic minimum digest over the doc's shingle set.
    """
    sh = word_shingles(docs, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}#"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame, k: int = 2, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """LSH candidate pairs (doc_a, doc_b), doc_a < doc_b, distinct.

    Signatures are cut into bands of ``band_size``; documents sharing any
    band collide into a bucket and the bucket self-join emits the pair. At
    scale the bucket key is the shuffle key — no all-pairs comparison.
    """
    sig = minhash_signatures(docs, k, num_hashes)
    n_bands = num_hashes // band_size
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        *[F.col("sig")[b * band_size + j] for j in range(band_size)],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).distinct()
    a = bands.select(F.col("doc_id").alias("doc_a"), "band")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band")
    return (
        a.join(b, "band")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify_candidates(
    docs: DataFrame, candidates: DataFrame, k: int = 2, threshold: float = 0.8
) -> DataFrame:
    """Exact Jaccard computed ONLY on candidate pairs:
    ``(doc_a, doc_b, jaccard)`` filtered to ``jaccard >= threshold``.

    This is the scale-safe verify step: the shingle join is driven by the
    candidate list (LSH buckets), never by raw shingle co-occurrence — the
    hot-stop-shingle explosion of :func:`ngram_jaccard_pairs` cannot happen.
    """
    sh = word_shingles(docs, k).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cand = candidates.select("doc_a", "doc_b")
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
            "left_semi",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.coalesce("i", F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce("i", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def near_duplicates(
    docs: DataFrame,
    k: int = 2,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """The composed dedup pipeline — the blessed scale entry point:

    1. MinHash-LSH candidate pairs (bucket join, never all-pairs);
    2. exact Jaccard verify on the candidates only;
    3. connected components over the verified duplicate graph
       (large-star/small-star);
    4. canonical survivor = minimum doc_id per duplicate cluster.

    Returns ``(doc_id BIGINT, canonical_doc_id BIGINT)`` for EVERY document
    (non-duplicates map to themselves); ``doc_id == canonical_doc_id``
    marks the survivors a dedup pass keeps. :func:`ngram_jaccard_pairs` is
    the oracle/test-scale all-pairs form — use this at scale.
    """
    from linkgraph.graph import SparkGraph
    from linkgraph.algos.components import connected_components

    cand = minhash_lsh_pairs(docs, k, num_hashes, band_size)
    dup = jaccard_verify_candidates(docs, cand, k, threshold)
    g = SparkGraph(
        dup.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        vertices=docs.select(F.col("doc_id").cast("long").alias("id")),
        directed=False,
        coalesce_edges=False,
    )
    return connected_components(g).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("canonical_doc_id"),
    )


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stopword_ratio, alpha_ratio)
    — the standard cheap quality signals, all rounded to 6 for portability."""
    t = tokens(docs)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size("toks").cast("double")
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.round(
            F.aggregate(
                "toks", F.lit(0.0), lambda acc, x: acc + F.length(x)
            )
            / n,
            6,
        ).alias("avg_token_len"),
        F.round(
            F.size(F.array_intersect("toks", stop_arr)).cast("double")
            / F.size(F.array_distinct("toks")),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace(F.concat_ws("", "toks"), "[^a-zA-Z]", ""))
            / F.greatest(F.length(F.concat_ws("", "toks")), F.lit(1)).cast("double"),
            6,
        ).alias("alpha_ratio"),
    )


_DE_MARKERS = ("der", "die", "das", "und", "ist", "nicht", "mit", "ein")


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, predicted_lang) — marker-word heuristic: German if the text
    contains more German marker tokens than English stopword tokens."""
    t = tokens(docs)
    en = F.array(*[F.lit(s) for s in STOPWORDS])
    de = F.array(*[F.lit(s) for s in _DE_MARKERS])
    hits = lambda arr: F.size(
        F.filter("toks", lambda x: F.array_contains(arr, x))
    )
    return t.select(
        "doc_id",
        F.when(hits(de) > hits(en), F.lit("de")).otherwise(F.lit("en")).alias(
            "predicted_lang"
        ),
    )


def fingerprints(docs: DataFrame, prefix_chars: int = 64) -> DataFrame:
    """(doc_id, fp) — content-defined fingerprint: md5 of the
    whitespace-normalized lowercased text prefix. A deterministic stand-in
    for rolling-hash fingerprints that stays portable across engines."""
    norm = F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
    return docs.select(
        "doc_id", F.md5(F.substring(norm, 1, prefix_chars)).alias("fp")
    )


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT) — 64-bit SimHash over whitespace tokens.

    Classic Charikar construction: each token hashes to 64 bits
    (``xxhash64``); each bit position accumulates +1/-1 per token; the
    fingerprint takes the sign of each accumulator. Near-duplicate
    documents land within a small Hamming distance.

    Entirely JVM-side: explode tokens -> one row per (doc, token),
    per-bit sums via 64 conditional aggregates (whole-stage codegen'd),
    recombined with shifts. Not DuckDB-portable (xxhash64), so this op is
    covered by tests rather than a SQL oracle.
    """
    t = tokens(docs).select("doc_id", F.explode("toks").alias("tok"))
    h = t.select("doc_id", F.xxhash64("tok").alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = h.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for b in range(64):
        fp = fp + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << b).cast("long") if b < 63 else fp
    # bit 63 would overflow a signed long via 1<<63; use shiftleft on the flag
    fp = fp + F.shiftleft(
        F.when(F.col("b63") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
        63,
    )
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_near_dups(
    docs: DataFrame, max_hamming: int = 3, band_bits: int = 16
) -> DataFrame:
    """(doc_a, doc_b, hamming) — candidate pairs whose 64-bit SimHash
    differs in <= ``max_hamming`` bits.

    LSH over fingerprint bands (pigeonhole: any pair within Hamming k < 4
    shares at least one of four 16-bit bands exactly): band equality is the
    equi-join key, then the exact popcount filter runs only on candidates.
    """
    sh = simhash64(docs).persist()
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(i)),
                        F.shiftright("simhash", i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .cast("string"),
                    )
                    for i in range(64 // band_bits)
                ]
            )
        ).alias("band"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "band"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "band"
    )
    cand = (
        a.join(b, "band")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def curate_corpus(
    docs: DataFrame,
    *,
    min_tokens: int = 30,
    min_alpha: float = 0.5,
    lang: str = "en",
    k: int = 2,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """The end-to-end training-data curation pipeline as ONE composition:
    quality gate (token count + alpha ratio) → language gate → MinHash-LSH
    near-duplicate removal on the survivors → corpus summary. Returns one
    row ``(n_input, n_after_quality, n_after_lang, n_survivors,
    tokens_kept)``.

    Every stage is a scan-shaped DataFrame op over the previous stage's
    survivors — quality and language are codegen'd projections, dedup is
    the candidate-driven LSH pipeline of :func:`near_duplicates` run on
    the FILTERED corpus (never on the raw input), which is the order a
    100 TB curation run wants: the cheap gates shrink the corpus before
    the only stage with a shuffle.
    """
    q = quality_features(docs).filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("alpha_ratio") >= min_alpha)
    )
    kept_q = docs.join(q.select("doc_id"), "doc_id", "left_semi")
    lid = language_id(kept_q).filter(F.col("predicted_lang") == lang)
    kept_l = kept_q.join(lid.select("doc_id"), "doc_id", "left_semi")
    nd = near_duplicates(
        kept_l, k=k, num_hashes=num_hashes, band_size=band_size, threshold=threshold
    )
    survivors = nd.filter(F.col("doc_id") == F.col("canonical_doc_id")).select(
        "doc_id"
    )
    tok = token_counts(kept_l).join(survivors, "doc_id", "left_semi")
    spark = docs.sparkSession
    row = (
        docs.agg(F.count(F.lit(1)).alias("n_input")).first(),
        kept_q.agg(F.count(F.lit(1))).first()[0],
        kept_l.agg(F.count(F.lit(1))).first()[0],
        survivors.count(),
        tok.agg(F.coalesce(F.sum("n_tokens"), F.lit(0))).first()[0],
    )
    return spark.createDataFrame(
        [
            (
                int(row[0]["n_input"]),
                int(row[1]),
                int(row[2]),
                int(row[3]),
                int(row[4]),
            )
        ],
        "n_input bigint, n_after_quality bigint, n_after_lang bigint,"
        " n_survivors bigint, tokens_kept bigint",
    )
