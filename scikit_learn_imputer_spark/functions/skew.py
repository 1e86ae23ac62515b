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
