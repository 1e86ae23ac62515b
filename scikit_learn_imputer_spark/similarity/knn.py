"""Approximate-nearest-neighbor search over an embedding column.

- ``cosine_topk``: brute-force exact top-k cosine — the correctness
  baseline. Query side is a handful of vectors → BROADCAST cross join (the
  corpus is never shuffled), per-query top-k via a window partitioned by the
  query id (parallel across queries, never a global sort).
- ``cosine_topk_lsh``: the scale path — sign-random-projection (SimHash for
  vectors) buckets shrink the candidate set before exact re-ranking.
  Projection hyperplanes are derived deterministically from md5, so results
  are reproducible without shipping a random state.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.dedup.embedding import cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cosine, rank).

    Self-matches (same id) are excluded. Ties broken by neighbor id so the
    result is deterministic."""
    from scikit_learn_imputer_spark.dedup.embedding import dot, norm

    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    # Norms precomputed per side (O(n·d)), not per pair; the division keeps
    # the identical float sequence dot/(‖q‖·‖c‖).
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine via BLAS: the throughput path for brute-force ANN.

    The (small, by contract) query matrix is broadcast to every executor;
    each Arrow batch of the corpus is scored with ONE ``C @ Q.T`` matmul and
    reduced to its local top-k per query, so the shuffle that feeds the final
    global top-k carries at most ``partitions × |Q| × k`` rows — never the
    corpus. Same result as ``cosine_topk`` (same tie-break: cosine desc,
    neighbor id asc); floats differ only by summation order (pairwise vs
    sequential), i.e. last-ulp."""
    import numpy as np

    query_id_col = query_id_col or id_col
    qrows = queries.select(query_id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype="int64")
    Q = np.array([r[1] for r in qrows], dtype="float64")
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((qids, Qn))

    schema = "query_id bigint, neighbor_id bigint, cosine double"

    def score(batches):
        import pandas as pd

        q_ids, q_mat = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            C = np.array(list(pdf[vec_col]), dtype="float64")
            C /= np.linalg.norm(C, axis=1, keepdims=True)
            S = C @ q_mat.T  # (batch, |Q|)
            S[ids[:, None] == q_ids[None, :]] = -np.inf  # self-match mask
            kk = min(k, len(ids))
            # lexsort: primary cosine desc, secondary neighbor id asc
            order = np.lexsort((ids[:, None].repeat(len(q_ids), 1), -S), axis=0)[:kk]
            out = {
                "query_id": np.repeat(q_ids, kk),
                "neighbor_id": ids[order].T.ravel(),
                "cosine": np.take_along_axis(S, order, axis=0).T.ravel(),
            }
            df = pd.DataFrame(out)
            yield df[np.isfinite(df["cosine"])]

    candidates = corpus.select(id_col, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return candidates.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _projection_bit(vec, dim: int, plane: int) -> "F.Column":
    """Sign bit of a deterministic pseudo-random hyperplane projection.

    Hyperplane component j for plane p is ±1 derived from md5(p|j) — an
    engine-portable stand-in for a Gaussian random projection; for sign-LSH
    Rademacher (±1) projections carry the same cosine guarantee.

    The sign pattern is driver-side Python (hashlib.md5 — bit-identical to
    the previous in-plan ``conv(substring(md5(...)))&1`` form): emitting it
    as a literal array keeps the expression tree O(dim) instead of O(dim)
    nested CASE/md5/conv nodes per plane, which dominated analysis/codegen
    time (12s → sub-second for the whole query at bench SF)."""
    import hashlib

    signs = F.array(
        *[
            F.lit(
                1.0
                if int(hashlib.md5(f"{plane}|{j}".encode()).hexdigest()[:8], 16) & 1
                else -1.0
            )
            for j in range(dim)
        ]
    )
    proj = F.aggregate(
        F.zip_with(vec, signs, lambda x, s: x * s),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj >= 0, 1).otherwise(0)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates must share a sign-LSH bucket with the
    query; exact cosine re-ranks the candidates.

    ``probes=1`` checks the query's own bucket only. ``probes>1`` is
    standard multi-probe: the QUERY side additionally probes the buckets
    at Hamming distance 1 (each single plane's sign flipped — the most
    likely buckets for a near neighbor that straddles a hyperplane),
    up to ``min(probes-1, planes)`` of them. Recall rises monotonically
    with probes at the cost of a proportionally larger candidate set; the
    corpus side is untouched, so the index (bucket assignment) is shared
    across probe settings. probes = planes+1 probes every 1-bit
    neighborhood."""
    def with_bucket(df, out):
        v = F.col(vec_col).cast("array<double>")
        bucket = sum(
            _projection_bit(v, dim, p) * (1 << p) for p in range(planes)
        )
        return df.withColumn(out, bucket)

    q = with_bucket(queries, "bucket").select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    if probes > 1:
        # bucket XOR (1<<p) flips plane p's bit; explode the probe list
        # (query side only — tiny), dedup (query, bucket) is free since
        # all probe buckets are distinct by construction.
        flips = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p))
                for p in range(min(probes - 1, planes))
            ],
        )
        q = q.withColumn("bucket", F.explode(flips))
    c = with_bucket(corpus, "bucket").select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
