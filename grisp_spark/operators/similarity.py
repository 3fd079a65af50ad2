"""Similarity search over embedding columns (array<float>).

``dot``/``cosine`` are sequential left-fold expressions (F.aggregate)
so the DuckDB oracle (list_reduce in the same order) produces
bit-identical doubles — rank tie-breaks can't flap between engines.

Scale notes (100 TB / 10^9 vectors):
- brute-force top-k is the O(n·q) correctness baseline; the join is a
  broadcast of the (small) query set against the vector corpus —
  no shuffle of the big side, one pass, then a per-query top-k window.
- the LSH path buckets vectors by the sign pattern of their leading
  components (axis-aligned random-hyperplane LSH); candidate
  generation becomes an equi-join on bucket — the n² space is never
  touched. Same-bucket recall is tunable by bits / multi-probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

LSH_BITS = 8


def dot(a, b, dim: int):
    """Sequential fold: identical summation order in any engine."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double"),
    )


def norm(a, dim: int):
    return F.sqrt(dot(a, a, dim))


def cosine_expr(a, b, dim: int):
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def neardup_pairs(emb: DataFrame, dim: int = 64, threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force baseline)."""
    a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("va") < F.col("vb"))
        .withColumn("cos", cosine_expr(F.col("ea"), F.col("eb"), dim))
        .filter(F.col("cos") >= threshold)
        .select("va", "vb", "cos")
        .orderBy("va", "vb")
    )


def topk_bruteforce(
    emb: DataFrame, n_queries: int = 5, k: int = 10, dim: int = 64
) -> DataFrame:
    """Exact cosine top-k for the first ``n_queries`` vectors. The
    query side is broadcast; the corpus is scanned once."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .withColumn("cos", cosine_expr(F.col("q_emb"), F.col("c_emb"), dim))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
        .orderBy("q_id", "rank")
    )


def lsh_bucket(col, bits: int = LSH_BITS):
    """Axis-aligned hyperplane LSH: sign bits of the first ``bits``
    components."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(bits)),
            lambda i: F.when(F.element_at(col, i) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            ),
        ),
        "",
    )


def topk_lsh(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    dim: int = 64,
    bits: int = LSH_BITS,
) -> DataFrame:
    """ANN top-k within the query's LSH bucket (the scale path:
    equi-join on bucket instead of a cross join)."""
    bucketed = emb.withColumn("bucket", lsh_bucket(F.col("embedding"), bits))
    q = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    c = bucketed.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"), "bucket"
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("cos", cosine_expr(F.col("q_emb"), F.col("c_emb"), dim))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
        .orderBy("q_id", "rank")
    )
