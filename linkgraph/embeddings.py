"""Similarity search over an embedding column (``array<float>``).

Two paths, per the standard ANN playbook:

- **Brute-force top-k** (the correctness baseline): a broadcast join of the
  (small) query set against the corpus with the cosine computed as a
  JVM-side ``zip_with``/``aggregate`` fold — no Python in the plan at all.
  Cost is O(|queries| · n · d) FLOPs spread across partitions; right for
  re-ranking and for oracle verification.
- **LSH-bucketed** (the scale path): random-hyperplane (SimHash) signs make
  a bucket key; only same-bucket pairs are compared, so the join is an
  equi-join on the bucket id instead of a crossJoin. Recall is tunable via
  number of hyperplane tables; hyperplanes are derived deterministically
  from a seed with ``md5``-based per-dimension coefficients so the plan is
  reproducible across runs and engines.

All floats are computed in DOUBLE and rounded to 4 decimals at the output
boundary; ordering ties break on neighbor id — this makes top-k results
deterministic and portable to the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pair_dot_udf():
    """Arrow-vectorized row-wise dot product of two ``array<double>``
    columns. Catalyst higher-order functions (``aggregate``/``zip_with``)
    are evaluated INTERPRETED per element — measured ~20s for the ~100M
    multiply-adds of a 10x IVF rerank — while one numpy batch op does the
    same work in milliseconds. Returns the raw double; callers keep
    ``F.round`` in-plan so the output boundary (and the DuckDB oracle
    contract) is unchanged."""
    import pandas as pd

    @F.pandas_udf("double")
    def dot(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        if not len(a):
            return pd.Series([], dtype="float64")
        A = np.stack(a.values).astype("float64")
        B = np.stack(b.values).astype("float64")
        return pd.Series((A * B).sum(axis=1))

    return dot


def _assign_udf(cent_rows):
    """Arrow-vectorized nearest-centroid assignment against a collected
    codebook (the coarse quantizer is small by definition — C x d doubles,
    the one structure IVF deliberately keeps broadcastable). Matches
    :func:`_nearest_centroid` exactly: similarity = dot/|c| rounded
    HALF-UP to 9 decimals, argmax breaking ties toward the smaller cid
    (numpy argmax returns the first maximum over cid-ascending columns)."""
    import numpy as np
    import pandas as pd

    order = sorted(cent_rows, key=lambda r: r["cid"])
    cids = np.array([r["cid"] for r in order], dtype="int64")
    M = np.array([list(r["centroid"]) for r in order], dtype="float64")
    cn = np.sqrt((M * M).sum(axis=1))
    cn[cn == 0] = 1.0
    Mt = np.ascontiguousarray((M / cn[:, None]).T)

    @F.pandas_udf("long")
    def assign(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="int64")
        V = np.stack(v.values).astype("float64")
        S = V @ Mt
        S = np.sign(S) * np.floor(np.abs(S) * 1e9 + 0.5) / 1e9
        return pd.Series(cids[S.argmax(axis=1)])

    return assign


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("_norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: for each query row, the k nearest corpus
    rows (excluding itself): (query_id, neighbor_id, cosine DOUBLE).

    ``queries`` is broadcast (it is the small side by construction); the
    corpus never shuffles — the ranking window partitions by query id, whose
    cardinality equals |queries|.
    """
    c = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    sims = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _hyperplane(dim: int, table: int, h: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane coefficients derived
    from md5 — reproducible with no RNG state."""
    import hashlib

    coeffs = []
    for d in range(dim):
        digest = hashlib.md5(f"{table}:{h}:{d}".encode()).hexdigest()
        coeffs.append(int(digest[:8], 16) / 2**31 - 1.0)
    return coeffs


def simhash_buckets(
    emb: DataFrame,
    dim: int,
    n_tables: int = 4,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, bucket STRING) — one row per hash table; the LSH join key.

    The bucket is ``table#b0b1…``: the sign pattern of ``n_bits``
    hyperplane projections. Vectors in the same bucket of any table are
    candidate neighbors.
    """
    rows = []
    for t in range(n_tables):
        bits = []
        for h in range(n_bits):
            plane = _hyperplane(dim, t, h)
            proj = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(c) for c in plane]),
                    lambda x, c: x.cast("double") * c,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        rows.append(F.concat(F.lit(f"{t}#"), *bits))
    return emb.select(
        F.col(id_col).alias("id"), F.explode(F.array(*rows)).alias("bucket")
    )


def ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_tables: int = 4,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates from shared SimHash buckets, exact
    cosine re-rank of candidates only. Same output schema as
    :func:`cosine_topk`; recall < 1 by design (judged as the scale path)."""
    qb = simhash_buckets(queries, dim, n_tables, n_bits, vec_col, id_col)
    cb = simhash_buckets(emb, dim, n_tables, n_bits, vec_col, id_col)
    cand = (
        qb.select(F.col("id").alias("query_id"), "bucket")
        .join(cb.select(F.col("id").alias("neighbor_id"), "bucket"), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    sims = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sims.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _nearest_centroid(vec_col, cents_col):
    """Expression: id of the nearest centroid (max cosine, ties → lower id)
    from an array<struct<cid,cv,cn>> column, computed as a JVM-side fold.

    The similarity is rounded to 9 decimals before the argmax so the
    assignment decision is identical across engines (Spark's fold and the
    oracle's SUM may add the 64 products in different orders; the ~1e-16
    difference would otherwise flip borderline argmax choices)."""
    sim = lambda c: F.round(
        _dot(vec_col, c["cv"])
        / F.when(c["cn"] > 0, c["cn"]).otherwise(F.lit(1.0)),
        9,
    )
    best = F.aggregate(
        cents_col,
        F.struct(
            F.lit(-2.0).cast("double").alias("s"),
            F.lit(-1).cast("long").alias("cid"),
        ),
        lambda acc, c: F.when(
            (sim(c) > acc["s"]) | ((sim(c) == acc["s"]) & (c["cid"] < acc["cid"])),
            F.struct(sim(c).alias("s"), c["cid"].alias("cid")),
        ).otherwise(acc),
    )
    return best["cid"]


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 64,
    lloyd_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_sample_cap: "int | None" = 16384,
) -> DataFrame:
    """IVF coarse quantizer: ``(cid BIGINT, centroid ARRAY<DOUBLE>)``.

    k-means with deterministic init (the ``n_centroids`` corpus vectors with
    the smallest ``md5(concat(seed, ':', id))`` digest — a seeded uniform
    sample with no RNG state; md5 rather than xxhash64 because both Spark
    and DuckDB produce the identical lowercase-hex digest, which makes the
    whole quantizer replayable in the SQL oracle) and ``lloyd_iters`` Lloyd
    rounds, entirely as DataFrame ops:
    assignment is a fold over the broadcast centroid array (O(n·C·d) FLOPs,
    map-only); the update is ``posexplode`` → per-(cid, dim) mean → rebuild,
    i.e. one shuffle keyed on (cid, dim) per round — no driver-side vectors,
    so C and d scale past what a driver could hold.

    ``train_sample_cap`` bounds the TRAINING set: when the corpus exceeds
    it, Lloyd iterations (and the init pick) run on a deterministic seeded
    hash-sample of ~cap vectors — k-means quality needs a bounded quorum
    per centroid, not the whole corpus, and an uncapped default made
    retraining dominate 10x-scale benches (r04 verdict: full-corpus Lloyd
    was ~80%% of emb_ivf_10x wall). The final inverted-list ASSIGNMENT in
    :func:`ivf_topk` always covers the full corpus. Corpora at or under
    the cap (every oracle scale) train exactly as before, so the SQL
    replay is unchanged; size it ~256x n_centroids for production. Pass
    ``None`` to train on everything.
    """
    v = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if train_sample_cap:
        n_corpus = v.count()
        if n_corpus > train_sample_cap:
            denom = 1_000_003
            num = max(1, int(denom * train_sample_cap / n_corpus))
            v = v.filter(
                F.pmod(F.xxhash64(F.col("id"), F.lit(int(seed))), F.lit(denom))
                < F.lit(num)
            )
    init = (
        v.withColumn(
            "_h",
            F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col("id").cast("string"))),
        )
        .orderBy("_h", "id")
        .limit(n_centroids)
        .select(
            (F.row_number().over(Window.orderBy("_h", "id")) - 1)
            .cast("long")
            .alias("cid"),
            F.col("v").alias("centroid"),
        )
    )
    cents = init
    for _ in range(max(0, lloyd_iters)):
        # the codebook round-trips through the driver between Lloyd rounds
        # (C x d doubles — the one structure IVF keeps broadcast-small);
        # assignment itself is the Arrow-vectorized map over the corpus
        assigned = v.select(
            "id", "v", _assign_udf(cents.collect())(F.col("v")).alias("cid")
        )
        # ROUND(avg, 9) snaps the new centroid components to engine-stable
        # values (Spark and the oracle sum members in different orders).
        cents = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 9).alias("x"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "x"))
                ).alias("px")
            )
            .select(
                "cid", F.transform("px", lambda p: p["x"]).alias("centroid")
            )
        )
    return cents


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 4,
    lloyd_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    centroids: DataFrame = None,
    train_sample_cap: "int | None" = 16384,
) -> DataFrame:
    """IVF-style approximate top-k (the third ANN path, next to
    :func:`cosine_topk` brute force and :func:`ann_topk` LSH).

    Corpus vectors are assigned to their nearest coarse centroid once (the
    inverted lists — an equi-join key, exactly how a 100 TB corpus would be
    bucketed on disk); each query probes its ``n_probe`` nearest centroids
    and exact-reranks only those lists. Candidate volume ≈
    n·(n_probe/n_centroids) per query instead of n. Deterministic for a
    fixed seed; same output schema as :func:`cosine_topk`; recall < 1 by
    design. Pass a pre-trained ``centroids`` table to amortize training
    across query batches.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            emb, n_centroids, lloyd_iters, vec_col, id_col, seed, train_sample_cap
        )
    cent_rows = centroids.collect()
    # rebuild the broadcast codebook from the collected rows so the (lazy)
    # training plan executes exactly once
    centroids = emb.sparkSession.createDataFrame(
        [(int(r["cid"]), [float(x) for x in r["centroid"]]) for r in cent_rows],
        "cid long, centroid array<double>",
    )
    packed = centroids.select(
        F.collect_list(
            F.struct(
                F.col("cid"),
                F.col("centroid").alias("cv"),
                F.sqrt(_dot(F.col("centroid"), F.col("centroid"))).alias("cn"),
            )
        ).alias("cents")
    )
    fast_dot = _pair_dot_udf()
    v = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cv"),
    )
    lists = v.select(
        "neighbor_id",
        "_cv",
        _assign_udf(cent_rows)(F.col("_cv")).alias("cid"),
    ).withColumn("_cn", F.sqrt(fast_dot(F.col("_cv"), F.col("_cv"))))
    # query → its n_probe nearest centroids (explode the scored array)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qv"),
    )
    qprobe = (
        q.crossJoin(F.broadcast(packed))
        .select(
            "query_id",
            "_qv",
            F.explode(
                F.transform(
                    F.col("cents"),
                    lambda c: F.struct(
                        c["cid"].alias("cid"),
                        F.round(
                            _dot(F.col("_qv"), c["cv"])
                            / F.when(c["cn"] > 0, c["cn"]).otherwise(F.lit(1.0)),
                            9,
                        ).alias("s"),
                    ),
                )
            ).alias("e"),
        )
        .select("query_id", "_qv", F.col("e.cid").alias("cid"), F.col("e.s").alias("s"))
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("cid"))
    qprobe = (
        qprobe.withColumn("_rk", F.row_number().over(w_probe))
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "_qv", "cid")
    )
    qn = qprobe.withColumn("_qn", F.sqrt(_dot(F.col("_qv"), F.col("_qv"))))
    sims = (
        qn.join(lists, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                fast_dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")),
                4,
            ).alias("cosine"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sims.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.95,
    *,
    method: str = "lsh",
    dim: int = 64,
    n_tables: int = 4,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate clustering — the vector-side sibling
    of :func:`linkgraph.text.near_duplicates`:

    1. candidate pairs — ``method="lsh"`` buckets by hyperplane sign
       patterns (:func:`simhash_buckets`) and equi-joins bucket keys, never
       all-pairs (the 100 TB path; recall vs exact pinned in pytest);
       ``method="exact"`` joins all id-ordered pairs (the oracle/test-scale
       form, like ``ngram_jaccard_pairs`` for text);
    2. exact cosine verify on candidates only (JVM-side ``zip_with`` fold,
       rounded to 6 decimals so the threshold cut is engine-stable);
    3. connected components over the duplicate graph
       (large-star/small-star);
    4. canonical survivor = minimum vec_id per cluster.

    Returns ``(vec_id BIGINT, canonical_vec_id BIGINT)`` for every vector;
    ``vec_id == canonical_vec_id`` marks survivors.
    """
    from linkgraph.graph import SparkGraph
    from linkgraph.algos.components import connected_components

    base = emb.select(
        F.col(id_col).cast("long").alias("vid"), F.col(vec_col).alias("vec")
    )
    if method == "exact":
        a = with_norm(base, "vec").select(
            F.col("vid").alias("ua"), F.col("vec").alias("_va"), F.col("_norm").alias("_na")
        )
        b = with_norm(base, "vec").select(
            F.col("vid").alias("ub"), F.col("vec").alias("_vb"), F.col("_norm").alias("_nb")
        )
        cand = a.join(b, F.col("ua") < F.col("ub"))
    elif method == "lsh":
        buckets = simhash_buckets(
            base, dim, n_tables=n_tables, n_bits=n_bits, vec_col="vec", id_col="vid"
        )
        pairs = (
            buckets.alias("x")
            .join(buckets.alias("y"), F.col("x.bucket") == F.col("y.bucket"))
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("ua"), F.col("y.id").alias("ub"))
            .distinct()
        )
        an = with_norm(base, "vec").select(
            F.col("vid").alias("ua"), F.col("vec").alias("_va"), F.col("_norm").alias("_na")
        )
        bn = with_norm(base, "vec").select(
            F.col("vid").alias("ub"), F.col("vec").alias("_vb"), F.col("_norm").alias("_nb")
        )
        cand = pairs.join(an, "ua").join(bn, "ub")
    else:
        raise ValueError(f"unknown method {method!r}")

    dup = cand.select(
        "ua",
        "ub",
        F.round(
            _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6
        ).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)

    g = SparkGraph(
        dup.select(F.col("ua").alias("src"), F.col("ub").alias("dst")),
        vertices=base.select(F.col("vid").alias("id")),
        directed=False,
        coalesce_edges=False,
    )
    return connected_components(g).select(
        F.col("id").cast("long").alias("vec_id"),
        F.col("component").cast("long").alias("canonical_vec_id"),
    )
