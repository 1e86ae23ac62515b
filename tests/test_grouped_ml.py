"""Grouped executor-side model fitting (operators/grouped_ml.py).

The applyInPandas OLS path must agree with the pure-aggregate regr_* path
(the two physical strategies for the same logical operator), and both must
match a hand-computed fit on a constructed frame.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.operators.grouped_ml import (
    grouped_linreg_agg,
    grouped_linreg_pandas,
)
from scikit_learn_imputer_spark.sources.tables import load_table


def _by_key(df, keys):
    return {
        tuple(r[k] for k in keys): (r["slope"], r["intercept"], r["r2"], r["n"])
        for r in df.collect()
    }


def test_pandas_path_equals_agg_path(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    a = _by_key(grouped_linreg_pandas(li, keys, "l_quantity", "l_extendedprice"), keys)
    b = _by_key(grouped_linreg_agg(li, keys, "l_quantity", "l_extendedprice"), keys)
    assert set(a) == set(b) and len(a) > 0
    for k in a:
        for x, y in zip(a[k], b[k]):
            assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9), (k, a[k], b[k])


def test_known_fit_and_degenerate_groups(spark):
    rows = (
        # group g1: exact line y = 3x + 1 → slope 3, intercept 1, r2 1
        [("g1", float(x), 3.0 * x + 1.0) for x in range(10)]
        # g2: constant x → slope undefined (null)
        + [("g2", 5.0, float(y)) for y in range(4)]
        # g3: single point → n < 2 → nulls
        + [("g3", 1.0, 2.0)]
        # nulls in x/y are dropped before fitting
        + [("g1", None, 99.0), ("g1", 99.0, None)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = _by_key(grouped_linreg_pandas(df, ["g"], "x", "y"), ["g"])
    slope, intercept, r2, n = out[("g1",)]
    assert math.isclose(slope, 3.0) and math.isclose(intercept, 1.0)
    assert math.isclose(r2, 1.0) and n == 10
    assert out[("g2",)][0] is None
    assert out[("g3",)] == (None, None, None, 1)


def test_agg_path_is_pure_builtin(spark, sf_smoke):
    """The scale path must contain no Python evaluation (BatchEvalPython /
    ArrowEvalPython / FlatMapGroupsInPandas) — it is whole-stage codegen."""
    li = load_table(spark, sf_smoke, "lineitem")
    plan = (
        grouped_linreg_agg(li, ["l_returnflag"], "l_quantity", "l_extendedprice")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
