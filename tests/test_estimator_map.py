"""Per-column estimator maps: {column: estimator, "*": default} wherever a
single estimator was accepted (fit / select_model)."""

from __future__ import annotations

import os
import tempfile

import pytest

from scikit_learn_imputer_spark.imputer import SparkImputer, _resolve_estimator
from scikit_learn_imputer_spark.sources.territories import territories_df


def _imputer(spark):
    return SparkImputer(
        territories_df(spark),
        categorical=["Name", "Location"],
        save_models_to=os.path.join(tempfile.mkdtemp(), "m"),
        round_column=["population"],
        class_threshold=14,
        id_col="id",
    )


def test_resolve_estimator_map_and_errors():
    assert _resolve_estimator("plain", "c") == "plain"
    assert _resolve_estimator({"c": 1, "*": 2}, "c") == 1
    assert _resolve_estimator({"c": 1, "*": 2}, "other") == 2
    with pytest.raises(KeyError, match="no '\\*' default"):
        _resolve_estimator({"c": 1}, "other")


def test_fit_with_per_column_regressor_map(spark):
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.regression import DecisionTreeRegressor, LinearRegression

    imp = _imputer(spark)
    res = imp.fit(
        classification=LogisticRegression(maxIter=5),
        regression={
            "km2": DecisionTreeRegressor(maxDepth=3),
            "*": LinearRegression(maxIter=5),
        },
        transform=True,
        parallelism=1,
    )
    stage = lambda c: type(res[c]["trained_model"].stages[-1]).__name__
    assert stage("km2") == "DecisionTreeRegressionModel"
    assert stage("gdp_per_capita") == "LinearRegressionModel"
    assert stage("Location") == "LogisticRegressionModel"
    nulls = res["imputed_data"].filter(
        "Location IS NULL OR km2 IS NULL OR gdp_per_capita IS NULL"
    ).count()
    assert nulls == 0
