"""Missingness operators (SURVEY.md §2 P3, A1-A3, C2, C3).

Reference parity:
- ``missing_indicator`` ↔ SklearnImputer.missing_indicator
  (scikit_learn_imputer.py:109-115): one boolean ``<col>_flag`` per column.
- ``missing_metrics`` ↔ SklearnImputer.missing_metrics
  (scikit_learn_imputer.py:117-138): per-column observed/missing/total/rate.

Scale notes: the reference makes two frame-wide passes (count then sum,
:132-133); here both collapse into ONE distributed aggregate over all columns
— one scan, map-side partial aggregation, a single tiny result row that is
unpivoted JVM-side (explode of a literal struct array, no collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_indicator(df: DataFrame, cols: list[str] | None = None, keep: list[str] | None = None) -> DataFrame:
    """One ``<col>_flag`` boolean column per input column (true = missing).

    ``keep`` columns (e.g. the row id) pass through untouched so the flags
    stay joinable on a key rather than on position.
    """
    cols = cols or [c for c in df.columns if c not in (keep or [])]
    passthrough = [F.col(c) for c in (keep or [])]
    flags = [F.col(c).isNull().alias(f"{c}_flag") for c in cols]
    return df.select(*passthrough, *flags)


def missing_metrics(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column missingness report:
    (variable, observed, missing, total, imputation_rate).

    Single aggregate pass over every column at once; the one-row result is
    reshaped to long form with explode — fully lazy, nothing collected.
    """
    cols = cols or df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[F.count(F.col(c)).alias(f"__obs_{c}") for c in cols],
    )
    structs = [
        F.struct(
            F.lit(c).alias("variable"),
            F.col(f"__obs_{c}").alias("observed"),
            (F.col("__total") - F.col(f"__obs_{c}")).alias("missing"),
            F.col("__total").alias("total"),
        )
        for c in cols
    ]
    return (
        agg.select(F.explode(F.array(*structs)).alias("m"))
        .select("m.*")
        .withColumn(
            "imputation_rate",
            F.col("missing").cast("double") / F.col("total").cast("double"),
        )
    )
