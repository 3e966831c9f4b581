"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exactness baseline, and an LSH-bucketed
(random-hyperplane) variant as the scale path: at 10^9+ vectors the
brute-force cross join is infeasible; hyperplane buckets cut candidates by
~2^planes while keeping recall high for near-neighbors (verified against
brute-force in tests).

All dot products are JVM-side (``aggregate``/``zip_with``) — no Python in
the scoring loop.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact cosine top-k of every query against the vector table.

    Deterministic ranking: (rounded score desc, neighbor id asc) — rounding
    first makes the order reproducible across summation orders/engines.
    Self-matches are excluded.
    """
    v = vectors.select(
        F.col(id_col).alias("nb_id"),
        F.col(vec_col).cast("array<double>").alias("nb_vec"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    scored = (
        q.crossJoin(v)
        .filter(F.col("q_id") != F.col("nb_id"))
        .withColumn("score", F.round(cosine(F.col("q_vec"), F.col("nb_vec")), round_digits))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("nb_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "nb_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit j = sign(v . plane_j)."""
    bits = [
        (_dot(vec_col, F.array(*[F.lit(x) for x in p])) > 0).cast("int") for p in planes
    ]
    sig = F.lit(0)
    for j, b in enumerate(bits):
        sig = sig + (b * F.lit(1 << j))
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH bucket.

    At scale the bucket column is a partition/bucketing key for the vector
    table, so a query touches ~1/2^planes of the data. Recall vs
    brute-force is measured in tests (same deterministic seed).
    """
    planes = hyperplanes(dim, n_planes, seed)
    v = vectors.select(
        F.col(id_col).alias("nb_id"),
        F.col(vec_col).cast("array<double>").alias("nb_vec"),
    ).withColumn("bucket", lsh_signature(F.col("nb_vec"), planes))
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    ).withColumn("bucket", lsh_signature(F.col("q_vec"), planes))
    scored = (
        q.join(v, "bucket")
        .filter(F.col("q_id") != F.col("nb_id"))
        .withColumn("score", F.round(cosine(F.col("q_vec"), F.col("nb_vec")), 4))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("nb_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "nb_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucket self-join."""
    planes = hyperplanes(dim, n_planes, seed)
    v = vectors.select(
        F.col(id_col).alias("doc"), F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("bucket", lsh_signature(F.col("vec"), planes))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .withColumn("score", F.round(cosine(F.col("a.vec"), F.col("b.vec")), 4))
        .filter(F.col("score") >= threshold)
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"), "score")
    )
