"""Keyed interval (range) join — the scalable form of
``l.key = r.key AND r.ts ∈ [l.ts - window, l.ts)``.

A naive non-equi join degenerates to a per-key nested loop (and without a
key, a cartesian product). The distributed shape here is TIME BUCKETING:
both sides get a bucket id ``floor(ts / window)``; a right row can only
match left rows in its own or the next bucket, so the theta join becomes an
EQUI join on (key, bucket) ∪ (key, bucket+1) followed by the exact interval
filter. Catalyst executes it as a hash join; fan-out per row is bounded by
2× the per-bucket density instead of the whole key group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    count_col: str = "n_in_window",
) -> DataFrame:
    """For each left row, count right rows with the same key whose
    timestamp falls in ``[left_ts - window, left_ts)`` (half-open —
    simultaneous events don't count themselves). Returns all left columns
    + the count."""
    # Bucket ids via integer DIV (same convention as sources/tables.py):
    # float division would round-trip microsecond longs through a double
    # mantissa and truncate toward zero. DIV also truncates toward zero,
    # but bucket BOUNDARIES stay at exact multiples of the window, so the
    # "b or b+1" candidate property below still holds for pre-1970
    # timestamps; the exact interval filter does the rest.
    win_us = window_seconds * 1_000_000
    l = left.withColumn("__lus", F.unix_micros(F.col(left_ts))).withColumn(
        "__lb", F.expr(f"__lus DIV {win_us}")
    )
    r = right.select(
        F.col(on).alias("__rk"),
        F.unix_micros(F.col(right_ts)).alias("__rus"),
    ).withColumn("__rb", F.expr(f"__rus DIV {win_us}"))

    # A right row in bucket b matches left rows in buckets b and b+1.
    r2 = r.select("__rk", "__rus", F.col("__rb").alias("__b")).unionAll(
        r.select("__rk", "__rus", (F.col("__rb") + 1).alias("__b"))
    )
    joined = l.join(
        r2,
        (l[on] == r2["__rk"]) & (l["__lb"] == r2["__b"]),
        how="left",
    )
    in_window = (
        F.col("__rus").isNotNull()
        & (F.col("__rus") >= F.col("__lus") - win_us)
        & (F.col("__rus") < F.col("__lus"))
    )
    out_cols = [c for c in left.columns]
    return (
        joined.groupBy(*[l[c] for c in out_cols])
        .agg(F.sum(in_window.cast("long")).alias(count_col))
        .select(*out_cols, count_col)
    )
