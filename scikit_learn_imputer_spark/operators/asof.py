"""Distributed as-of join (SURVEY.md §2.10 — no reference counterpart;
a staple the engine adds for time-series/event workloads).

For each left row, attach the value columns of the LATEST right row with
``right_ts <= left_ts`` and equal keys (backward as-of, inclusive — the
same semantics as DuckDB's ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts``,
which serves as the oracle).

Distributed shape: instead of a per-key loop or a range cross join, both
sides are UNIONED with a side tag, hash-partitioned by key, sorted by
(ts, side) within key, and the right side's values are carried forward with
a running ``last(ignorenulls)`` window — one shuffle, no quadratic blowup,
skew bounded by the hottest key. Right rows sort before left rows at equal
timestamps, which yields the inclusive match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward-inclusive as-of join. Returns all left columns plus
    ``value_cols`` from the matched right row (NULL when no right row
    precedes)."""
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in on],
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols,
        F.col("__side"),
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
