"""Skew-mitigation helpers.

``salted_agg`` is the standard two-stage aggregation for hot keys: stage 1
aggregates on (key, salt) — spreading a hot key over ``salts`` reducers —
stage 2 merges the partials by key. Results are identical to the direct
groupBy for any agg with a partial/merge decomposition (count/sum/min/max).

At 100 TB AQE's skew-join splitting handles JOIN skew automatically
(enabled in session.py); salting is for aggregation skew, where a single
degenerate key (empty string, null-ish defaults) would otherwise pin one
reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → (input column/expr, fn) with fn in
    {count, sum, min, max}. Example::

        salted_agg(df, ["event_type"], {"n": ("*", "count"),
                                        "total": ("value", "sum")})
    """
    partial_fns = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    merge_fns = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}

    salt = (F.rand(seed=42) * salts).cast("int").alias("__salt")
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            partial_fns[fn](F.lit(1) if col == "*" else F.col(col)).alias(
                f"__p_{out}"
            )
            for out, (col, fn) in aggs.items()
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            merge_fns[fn](F.col(f"__p_{out}")).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Parallelism floor for CPU-bound fan-out stages (n-gram/shingle
    explodes, per-char hashing, signature computation).

    A small parquet file scans as ONE partition, which serializes every
    downstream per-row expansion on a single core even on a 32-core
    box — the local-mode analogue of reading a few unsplittable files.
    When the upstream partition count is well below cluster parallelism,
    round-robin repartition up to ``defaultParallelism × multiplier``;
    otherwise NO-OP (at 100 TB a corpus scan already has thousands of
    partitions, so this never inserts a shuffle there). The shuffle it
    does insert moves the raw input rows — by contract the cheap side of
    a fan-out stage (documents before shingling, not shingles)."""
    if df.isStreaming:
        # Streaming plans have no static partition count to inspect;
        # micro-batch parallelism is the source's concern.
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() * 4 <= target:
        return df.repartition(target)
    return df
