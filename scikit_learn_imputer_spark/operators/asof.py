"""Distributed as-of join (SURVEY.md §2.10 — no reference counterpart;
a staple the engine adds for time-series/event workloads).

For each left row, attach the value columns of the matched right row with
equal keys, where the match is, by ``direction``:

- ``backward`` (default): LATEST right row with ``right_ts <= left_ts`` —
  the same semantics as DuckDB's ``ASOF JOIN ... ON l.k = r.k AND
  l.ts >= r.ts`` (the oracle) and pandas ``merge_asof``'s default;
- ``forward``: EARLIEST right row with ``right_ts >= left_ts``;
- ``nearest``: whichever of the two is closer in time; exact-distance ties
  resolve BACKWARD (matching pandas ``merge_asof(direction='nearest')``).

Distributed shape: instead of a per-key loop or a range cross join, both
sides are UNIONED with a side tag, hash-partitioned by key, sorted by
(ts, side) within key, and the right side's match struct is carried with a
RUNNING ``last(ignorenulls)`` window — one shuffle, no quadratic blowup,
skew bounded by the hottest key. The forward pass runs the same running
frame over the reversed order (never the O(n²)
``current→unboundedFollowing`` frame). Right rows sort adjacent to left
rows at equal timestamps on the inclusive side, which yields inclusivity.
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
    direction: str = "backward",
) -> DataFrame:
    """As-of join. Returns all left columns plus ``value_cols`` from the
    matched right row (NULL when no right row matches in ``direction``)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    lcols = left.columns
    rtypes = dict(right.dtypes)
    match_struct = F.struct(
        F.col("__ts").alias("__rts"),
        *[F.col(f"__v_{c}").alias(c) for c in value_cols],
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__v_{c}") for c in value_cols],
    )
    r = right.select(
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lcols
            if c not in on
        ],
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    u = l.unionByName(r).withColumn(
        "__m", F.when(F.col("__side") == 0, match_struct)
    )

    def running(desc: bool):
        # At equal ts the right row must sort BEFORE the left row so the
        # running carry includes it (inclusive match on that side).
        order = (
            [F.col("__ts").desc(), F.col("__side").asc()]
            if desc
            else [F.col("__ts").asc(), F.col("__side").asc()]
        )
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last(F.col("__m"), ignorenulls=True).over(w)

    if direction == "backward":
        carried = u.withColumn("__match", running(desc=False))
    elif direction == "forward":
        carried = u.withColumn("__match", running(desc=True))
    else:  # nearest: evaluate both passes, pick the closer match
        carried = u.withColumn("__b", running(desc=False)).withColumn(
            "__f", running(desc=True)
        )
        b_dist = F.col("__ts").cast("double") - F.col("__b.__rts").cast("double")
        f_dist = F.col("__f.__rts").cast("double") - F.col("__ts").cast("double")
        carried = carried.withColumn(
            "__match",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(b_dist <= f_dist, F.col("__b"))  # tie -> backward
            .otherwise(F.col("__f")),
        )

    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *lcols,
            *[F.col(f"__match.{c}").alias(c) for c in value_cols],
        )
    )
