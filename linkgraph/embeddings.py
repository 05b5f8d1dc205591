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

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


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
