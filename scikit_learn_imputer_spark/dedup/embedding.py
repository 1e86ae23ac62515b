"""Embedding-cosine near-duplicate detection.

Exact path: normalized vectors + a FULL self pair-join (crossJoin on
id < id) — intentionally O(n²), the small-scale correctness anchor; cosine
itself is a JVM higher-order expression (zip_with + aggregate), no UDF.
A NumPy/BLAS twin computes the same oracle via a broadcast matrix product
(guarded to ≤200k rows).

At 100 TB you run ``embedding_near_pairs_cells`` — bounded-size KMeans
cells, pairs only within cells (measured sf exponent 0.20). MLlib's
BucketedRandomProjectionLSH variant is kept as a recall baseline only:
its FIXED bucket resolution makes candidates Θ(n²·p) (measured exponent
1.96 at sf1 — BASELINE.md). The exact paths exist to judge recall.
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
    dot/(‖a‖·‖b‖) so results stay bit-equal to the naive form. fan_out
    floors the STREAMED side's parallelism: a single-file corpus scan
    would otherwise evaluate all O(n²) dot products on one core."""
    from scikit_learn_imputer_spark.functions.skew import fan_out

    df = fan_out(df)
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


def embedding_near_pairs_blas(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 200_000,
) -> DataFrame:
    """Same exact pair semantics as ``embedding_near_pairs``, BLAS path:
    the normalized corpus matrix is broadcast (the exact pair join is only
    viable while n is broadcast-sized anyway — the guard makes the bound
    explicit), and each partition scores its row block against everything
    with one matmul. The O(n²) compute stays distributed across blocks;
    only pairs above threshold leave Python. ~d× fewer interpreter steps
    than the per-pair expression form. Cosines differ from the expression
    path only by float summation order (pairwise vs sequential)."""
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    n = len(rows)
    if n > max_broadcast_rows:
        raise ValueError(
            f"exact pair join over {n} rows exceeds max_broadcast_rows="
            f"{max_broadcast_rows}; use embedding_near_pairs_cells at scale"
        )
    all_ids = np.array([r[0] for r in rows], dtype="int64")
    M = np.array([r[1] for r in rows], dtype="float64")
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    bcast = df.sparkSession.sparkContext.broadcast((all_ids, M))

    schema = "id_a bigint, id_b bigint, cosine double"

    def score(batches):
        import pandas as pd

        ids_all, mat = bcast.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids_blk = pdf[id_col].to_numpy(dtype="int64")
            C = np.array(list(pdf[vec_col]), dtype="float64")
            C /= np.linalg.norm(C, axis=1, keepdims=True)
            S = C @ mat.T
            mask = (S >= threshold) & (ids_all[None, :] > ids_blk[:, None])
            bi, bj = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": ids_blk[bi],
                    "id_b": ids_all[bj],
                    "cosine": S[bi, bj],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(score, schema)


def embedding_near_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """The 100 TB path: MLlib BucketedRandomProjectionLSH over UNIT
    vectors. On the unit sphere, cosine ≥ t ⟺ euclidean distance ≤
    √(2 − 2t), so the Euclidean approxSimilarityJoin implements a cosine
    threshold join; candidate pairs only form inside shared hash buckets
    (sub-quadratic), and the exact cosine is recomputed on the survivors.

    Approximate: pairs missed by every hash table are lost — increase
    ``num_hash_tables`` / ``bucket_length`` for recall at more cost.

    COST MODEL (measured, BASELINE.md sf1 scale-proof): MLlib puts ONE
    projection per hash table, so buckets per table = range/bucketLength
    — a constant independent of n — and candidate volume is Θ(n²·p).
    Measured exponent 1.96 from 2k→20k vectors. Fine at moderate n; at
    corpus scale use cell-scoped pairs (``semdedup_survivors`` with
    ``assigned``) or IVF-scoped probes (similarity/ivf.py, measured
    ~flat), or shrink ``bucket_length`` with n at a recall trade.
    """
    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    norm_t = Normalizer(inputCol="__v", outputCol="__unit", p=2.0)
    unit = norm_t.transform(
        df.select(
            F.col(id_col),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("__v"),
        )
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="__unit",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(unit)
    dist_threshold = math.sqrt(max(2.0 - 2.0 * threshold, 0.0))
    pairs = lsh.approxSimilarityJoin(unit, unit, dist_threshold, distCol="__dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            (1.0 - F.col("__dist") * F.col("__dist") / 2.0).alias("cosine"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("cosine") >= threshold)
    )


def semdedup_survivors(
    df: DataFrame,
    eps: float = 0.42,
    assigned: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): drop semantic
    duplicates — documents whose embeddings are within ``eps`` cosine of
    a kept representative. Deterministic keep rule (documented variant):
    a document is dropped iff it has a SMALLER-ID neighbor with cosine
    >= eps in its cluster; the paper keeps the member farthest from the
    cluster centroid, which depends on centroid floats — min-id keeps
    the operator engine-portable and the exact variant ORACLE-able.

    ``assigned`` (id, cell) scopes the pair search to clusters — the
    paper's actual trick: pairs form per cell (one equi-join shuffle on
    the cell key, per-cell quadratic bounded by cell size), never
    corpus×corpus. ``assigned=None`` is the single-cluster EXACT
    variant — the small-SF correctness baseline (quadratic; same role
    as embedding_near_pairs)."""
    if assigned is None:
        pairs = embedding_near_pairs(df, threshold=eps, id_col=id_col, vec_col=vec_col)
    else:
        tagged = df.join(assigned.select(id_col, "cell"), id_col)
        pairs = cell_scoped_pairs(tagged, eps, id_col=id_col, vec_col=vec_col)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.select(id_col).join(dropped, id_col, "left_anti")


def cell_scoped_pairs(
    tagged: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) with cosine ≥ threshold, pairs formed ONLY
    inside a shared ``cell`` — one equi-join shuffle on the cell key,
    per-cell quadratic bounded by cell size. Cosines are recomputed
    exactly on the survivors, so the result is a SUBSET of the exact
    pair set (no false positives; cross-cell pairs are the only
    misses)."""
    a = tagged.select(
        F.col("cell"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    ).withColumn("na", norm(F.col("va")))
    b = tagged.select(
        F.col("cell"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    ).withColumn("nb", norm(F.col("vb")))
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_pairs_cells(
    df: DataFrame,
    threshold: float = 0.95,
    nlist: int | None = None,
    target_cell_rows: int = 256,
    seed: int = 42,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cell-scoped near-pair inventory — the measured SUB-QUADRATIC
    answer to ``embedding_near_pairs_lsh``'s Θ(n²) cost model (see that
    docstring / BASELINE.md sf1 scale-proof): assign every vector to a
    KMeans cell, form pairs only within cells. The scale lever is that
    ``nlist`` defaults to ceil(n / target_cell_rows) — cell SIZE stays
    bounded as the corpus grows, so per-cell quadratic work totals
    O(n · target_cell_rows) and the whole inventory scales ~linearly
    (the SemDeDup deployment recipe, Abbas et al. 2023). Approximate:
    cross-cell pairs are missed (recall floor anchored in tests);
    emitted pairs carry EXACT cosines, so the output is always a subset
    of the brute-force pair set. ``nlist=1`` is the exact limit
    (== embedding_near_pairs). The df.count() for auto-nlist is one
    O(1)-result action — at deployment the corpus row count is catalog
    metadata."""
    import math as _math

    from scikit_learn_imputer_spark.similarity.ivf import build_ivf_index

    if nlist is None:
        n = df.count()
        nlist = max(1, _math.ceil(n / target_cell_rows))
    if nlist == 1:
        return embedding_near_pairs(
            df, threshold=threshold, id_col=id_col, vec_col=vec_col
        )
    assigned, _ = build_ivf_index(
        df,
        nlist=nlist,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        max_iter=max_iter,
        init_mode="random",
        build_partitions=4,
    )
    tagged = df.join(assigned.select(id_col, "cell"), id_col)
    return cell_scoped_pairs(tagged, threshold, id_col=id_col, vec_col=vec_col)


def semantic_decontam_flags(
    df: DataFrame,
    threshold: float = 0.38,
    salt: str = "holdout:",
    train_cut: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_df: DataFrame | None = None,
) -> DataFrame:
    """Semantic decontamination: flag TRAIN documents whose embedding
    lies within ``threshold`` cosine of ANY benchmark/eval document —
    the embedding-space complement of the word-gram `decontaminate_*`
    family (paraphrased benchmark leakage that shares no exact n-gram).

    ``eval_df`` (a frame carrying ``vec_col``) is the real deployment
    shape: an EXTERNAL fixed-size benchmark table, decontaminated
    against the FULL corpus ``df`` — the broadcast-bounded claim below
    is then structural, not an assumption about a split fraction
    (ADVICE r9). When ``eval_df`` is None, eval membership falls back
    to the engine's standard salted-md5 holdout assignment (same
    salt/cuts as corpus_holdout_split, so it audits exactly that split)
    and train is the split complement. Returns one row per flagged
    train vector: ``n_eval_hits`` and its worst-case ``max_cosine``.

    Scale shape: the EVAL side is broadcast — eval/benchmark sets are
    fixed-size in practice (thousands of documents), so the non-equi
    cosine join is a broadcast nested-loop over a bounded side and the
    train corpus streams through map-side, linear at 100 TB. Norms are
    computed once per vector before the join; zero-norm (all-zero)
    vectors are filtered on BOTH sides before the division (ADVICE r9:
    non-ANSI Spark division by zero yields NULL, silently dropping the
    row, while IEEE engines yield inf/NaN — guard rather than diverge).
    Max/count aggregate per train id is order-independent (no
    float-sum drift)."""
    from scikit_learn_imputer_spark.functions.skew import fan_out
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    if eval_df is None:
        h = uniform_hash_col(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        )
        tagged = df.withColumn("__h", h)
        train_src = tagged.filter(F.col("__h") < train_cut)
        eval_src = tagged.filter(F.col("__h") >= train_cut)
    else:
        train_src = df
        eval_src = eval_df
    tr = (
        fan_out(train_src)
        .select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__va"),
        )
        .withColumn("__na", norm(F.col("__va")))
        .filter(F.col("__na") > 0)
    )
    ev = (
        eval_src.select(
            F.col(vec_col).cast("array<double>").alias("__vb"),
        )
        .withColumn("__nb", norm(F.col("__vb")))
        .filter(F.col("__nb") > 0)
    )
    cos = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        tr.crossJoin(F.broadcast(ev))
        .select(id_col, cos.alias("__c"))
        .filter(F.col("__c") >= threshold)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_hits"),
            F.round(F.max("__c"), 6).alias("max_cosine"),
        )
    )
