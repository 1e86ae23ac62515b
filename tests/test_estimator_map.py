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


# ------------------------------------------------------- dummy estimators
def test_dummy_estimator_fit_constants_and_persistence(spark, tmp_path):
    from scikit_learn_imputer_spark.estimators import (
        DummyClassifier,
        DummyClassifierModel,
        DummyRegressor,
    )

    df = spark.createDataFrame([(0.0,), (1.0,), (1.0,), (2.0,)], ["label"])

    clf = DummyClassifier(strategy="most_frequent").setLabelCol("label")
    model = clf.fit(df)
    assert {r["prediction"] for r in model.transform(df).collect()} == {1.0}

    strat = DummyClassifier(strategy="stratified", seed=7).setLabelCol("label")
    preds = {r["prediction"] for r in strat.fit(df).transform(df).collect()}
    assert preds <= {0.0, 1.0, 2.0} and preds

    mean_m = DummyRegressor(strategy="mean").setLabelCol("label").fit(df)
    assert mean_m.transform(df).first()["prediction"] == 1.0
    med_m = DummyRegressor(strategy="median").setLabelCol("label").fit(df)
    assert med_m.transform(df).first()["prediction"] == 1.0

    # Params-only persistence round-trip (model state lives in Params).
    path = str(tmp_path / "dummy_clf")
    model.write().overwrite().save(path)
    loaded = DummyClassifierModel.load(path)
    assert loaded.transform(df).first()["prediction"] == 1.0


def test_reference_estimator_map_documents_all_eight_pairs():
    from scikit_learn_imputer_spark.estimators import REFERENCE_ESTIMATOR_MAP

    assert len(REFERENCE_ESTIMATOR_MAP) == 8
    assert REFERENCE_ESTIMATOR_MAP["knn"]["classifier"] is None
    assert REFERENCE_ESTIMATOR_MAP["mlp"]["regressor"] is None
