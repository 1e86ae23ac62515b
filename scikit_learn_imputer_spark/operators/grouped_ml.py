"""Grouped per-key model fitting via ``applyInPandas`` (Arrow-batched).

The reference fits one sklearn model per *column* in a driver loop
(``scikit_learn_imputer.py:216`` M4).  At 100 TB the analogous pattern is one
model per *group* — millions of independent small fits, which must run on the
executors, not the driver.  This module implements the canonical instance:
grouped ordinary-least-squares (y ~ a + b*x), computed with the numerically
stable centered form inside a vectorized pandas UDF.

Scale notes:
- ``applyInPandas`` shuffles once on the group keys; each group is fit
  independently on its executor — embarrassingly parallel across groups.
- Skewed groups: a single giant group lands on one task.  For OLS
  specifically, the sufficient statistics (n, Σx, Σy, Σxx, Σyy, Σxy) are
  algebraic aggregates, so ``grouped_linreg_agg`` provides the same result
  as a pure built-in aggregation — partial (map-side) combine, no Python,
  no skew hazard.  ``grouped_linreg_pandas`` is the template for models
  that do NOT decompose into algebraic aggregates (trees, iterative fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

RESULT_FIELDS = [
    ("slope", DoubleType()),
    ("intercept", DoubleType()),
    ("r2", DoubleType()),
    ("n", LongType()),
]


def _result_schema(df: DataFrame, group_cols: list[str]) -> StructType:
    fields = [df.schema[c] for c in group_cols]
    fields += [StructField(name, dtype, True) for name, dtype in RESULT_FIELDS]
    return StructType(fields)


def grouped_linreg_pandas(
    df: DataFrame, group_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """One OLS fit per group, executed executor-side in Arrow batches.

    Template for arbitrary per-group estimators: swap the closed-form
    math for any sklearn-style fit on the group's pandas frame.
    """
    import numpy as np
    import pandas as pd

    schema = _result_schema(df, group_cols)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        n = len(x)
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        if n < 2:
            out.update(slope=[None], intercept=[None], r2=[None], n=[n])
            return pd.DataFrame(out)
        mx, my = x.mean(), y.mean()
        dx, dy = x - mx, y - my
        sxx = float(dx @ dx)
        syy = float(dy @ dy)
        sxy = float(dx @ dy)
        slope = sxy / sxx if sxx else None
        intercept = my - slope * mx if slope is not None else None
        r2 = (sxy * sxy) / (sxx * syy) if sxx and syy else None
        out.update(slope=[slope], intercept=[intercept], r2=[r2], n=[n])
        return pd.DataFrame(out)

    return (
        df.select(*group_cols, x_col, y_col)
        .dropna(subset=[x_col, y_col])
        .groupBy(*group_cols)
        .applyInPandas(fit, schema=schema)
    )


def grouped_linreg_agg(
    df: DataFrame, group_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """Same regression as algebraic built-in aggregates (regr_*) — the
    scale path: map-side partial aggregation, whole-stage codegen, no
    Python in the loop."""
    x, y = F.col(x_col), F.col(y_col)
    return (
        df.select(*group_cols, x_col, y_col)
        .dropna(subset=[x_col, y_col])
        .groupBy(*group_cols)
        .agg(
            F.regr_slope(y, x).alias("slope"),
            F.regr_intercept(y, x).alias("intercept"),
            F.regr_r2(y, x).alias("r2"),
            F.regr_count(y, x).alias("n"),
        )
    )
