"""Baseline ("dummy") estimators — MLlib-pluggable counterparts of
sklearn's ``DummyClassifier`` / ``DummyRegressor``.

Reference parity: the reference e2e matrix (reference tests.py:218-234)
exercises ``DummyClassifier(strategy='most_frequent'|'stratified')`` and
``DummyRegressor(strategy='mean'|'median')`` as the first two of its eight
classifier/regressor pairs. MLlib ships no dummy estimators, so these are
implemented as genuine ``pyspark.ml`` Estimator/Model pairs: they fit with
one tiny aggregate (O(classes) / one row — never a data-sized collect),
transform as a pure projection (a literal, or a seeded rand() mapped
through the cumulative class distribution), persist via
``DefaultParamsWritable`` (the learned state lives in Params), and slot
into ``Pipeline`` / ``SparkImputer`` exactly like any MLlib estimator.

Scale notes: fit is a single groupBy(label).count() (bounded by the
engine's class_threshold gate) or a one-row percentile aggregate;
transform adds no shuffle and stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import (
    HasFeaturesCol,
    HasLabelCol,
    HasPredictionCol,
    HasSeed,
)
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable


class _DummyParams(HasFeaturesCol, HasLabelCol, HasPredictionCol, HasSeed):
    """Shared params + the sklearn-style ``strategy`` knob."""

    strategy = Param(
        Params._dummy(),
        "strategy",
        "fill strategy",
        typeConverter=TypeConverters.toString,
    )

    def getStrategy(self) -> str:
        return self.getOrDefault(self.strategy)

    # MLlib-style fluent setters (SparkImputer calls these on any estimator).
    def setFeaturesCol(self, value):
        return self._set(featuresCol=value)

    def setLabelCol(self, value):
        return self._set(labelCol=value)

    def setPredictionCol(self, value):
        return self._set(predictionCol=value)

    def setSeed(self, value):
        return self._set(seed=value)


class DummyClassifier(
    Estimator, _DummyParams, DefaultParamsReadable, DefaultParamsWritable
):
    """``strategy='most_frequent'``: always predict the modal label (ties
    broken by smallest label — deterministic). ``strategy='stratified'``:
    predict a label drawn from the empirical class distribution using
    ``rand(seed)`` (sklearn draws from the same distribution; the exact
    random stream is engine-specific by nature)."""

    def __init__(self, strategy: str = "most_frequent", seed: int = 0):
        super().__init__()
        if strategy not in ("most_frequent", "stratified"):
            raise ValueError(f"unknown DummyClassifier strategy: {strategy}")
        self._setDefault(
            strategy="most_frequent",
            seed=0,
            featuresCol="features",
            labelCol="label",
            predictionCol="prediction",
        )
        self._set(strategy=strategy, seed=seed)

    def _fit(self, dataset: DataFrame) -> "DummyClassifierModel":
        label = self.getLabelCol()
        counts = sorted(
            (
                (r[label], r["cnt"])
                for r in dataset.groupBy(label)
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            ),
        )
        total = sum(c for _, c in counts) or 1
        labels = [float(lbl) for lbl, _ in counts]
        cumprobs = []
        acc = 0.0
        for _, c in counts:
            acc += c / total
            cumprobs.append(acc)
        model = DummyClassifierModel()
        model._set(
            strategy=self.getStrategy(),
            seed=self.getOrDefault(self.seed),
            featuresCol=self.getFeaturesCol(),
            labelCol=label,
            predictionCol=self.getPredictionCol(),
            labels=labels,
            cumProbs=cumprobs,
        )
        if self.getStrategy() == "most_frequent":
            modal = max(counts, key=lambda t: (t[1], -t[0]))[0]
            model._set(constant=float(modal))
        return model


class DummyClassifierModel(
    Model, _DummyParams, DefaultParamsReadable, DefaultParamsWritable
):
    constant = Param(
        Params._dummy(), "constant", "modal label",
        typeConverter=TypeConverters.toFloat,
    )
    labels = Param(
        Params._dummy(), "labels", "sorted class labels",
        typeConverter=TypeConverters.toListFloat,
    )
    cumProbs = Param(
        Params._dummy(), "cumProbs", "cumulative class probabilities",
        typeConverter=TypeConverters.toListFloat,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(constant=0.0, labels=[], cumProbs=[])

    def _transform(self, dataset: DataFrame) -> DataFrame:
        pred = self.getPredictionCol()
        if self.getStrategy() == "most_frequent":
            return dataset.withColumn(
                pred, F.lit(self.getOrDefault(self.constant)).cast("double")
            )
        labels = self.getOrDefault(self.labels)
        cum = self.getOrDefault(self.cumProbs)
        r = F.rand(self.getOrDefault(self.seed))
        expr = F.lit(labels[-1]).cast("double")
        # r < cum[i] → labels[i], checked from the last threshold down so
        # the earliest matching bucket wins.
        for lbl, c in list(zip(labels, cum))[-2::-1]:
            expr = F.when(r < F.lit(c), F.lit(lbl)).otherwise(expr)
        return dataset.withColumn(pred, expr.cast("double"))


class DummyRegressor(
    Estimator, _DummyParams, DefaultParamsReadable, DefaultParamsWritable
):
    """``strategy='mean'|'median'``: always predict the training label's
    mean / exact interpolated median (sklearn uses the same percentile
    definition)."""

    def __init__(self, strategy: str = "mean"):
        super().__init__()
        if strategy not in ("mean", "median"):
            raise ValueError(f"unknown DummyRegressor strategy: {strategy}")
        self._setDefault(
            strategy="mean",
            seed=0,
            featuresCol="features",
            labelCol="label",
            predictionCol="prediction",
        )
        self._set(strategy=strategy)

    def _fit(self, dataset: DataFrame) -> "DummyRegressorModel":
        label = F.col(self.getLabelCol()).cast("double")
        if self.getStrategy() == "mean":
            agg = F.avg(label)
        else:
            agg = F.percentile(label, F.lit(0.5))
        value = dataset.agg(agg.alias("v")).collect()[0]["v"]
        model = DummyRegressorModel()
        model._set(
            strategy=self.getStrategy(),
            featuresCol=self.getFeaturesCol(),
            labelCol=self.getLabelCol(),
            predictionCol=self.getPredictionCol(),
            constant=float(value if value is not None else 0.0),
        )
        return model


class DummyRegressorModel(
    Model, _DummyParams, DefaultParamsReadable, DefaultParamsWritable
):
    constant = Param(
        Params._dummy(), "constant", "fitted fill value",
        typeConverter=TypeConverters.toFloat,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(constant=0.0)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return dataset.withColumn(
            self.getPredictionCol(),
            F.lit(self.getOrDefault(self.constant)).cast("double"),
        )


#: Reference pair → MLlib/engine mapping (reference tests.py:218-234).
#: ``None`` marks documented-unsupported estimators.
REFERENCE_ESTIMATOR_MAP: dict[str, dict[str, object]] = {
    "dummy_most_frequent": {
        "classifier": "scikit_learn_imputer_spark.estimators.DummyClassifier(most_frequent)",
        "regressor": "scikit_learn_imputer_spark.estimators.DummyRegressor(mean)",
    },
    "dummy_stratified": {
        "classifier": "scikit_learn_imputer_spark.estimators.DummyClassifier(stratified)",
        "regressor": "scikit_learn_imputer_spark.estimators.DummyRegressor(median)",
    },
    "logistic_linear": {
        "classifier": "pyspark.ml.classification.LogisticRegression",
        "regressor": "pyspark.ml.regression.LinearRegression",
    },
    "decision_tree": {
        "classifier": "pyspark.ml.classification.DecisionTreeClassifier",
        "regressor": "pyspark.ml.regression.DecisionTreeRegressor",
    },
    "random_forest": {
        "classifier": "pyspark.ml.classification.RandomForestClassifier",
        "regressor": "pyspark.ml.regression.RandomForestRegressor",
    },
    "extra_trees": {
        # MLlib has no ExtraTrees; GBT is the documented stand-in for
        # regression, OneVsRest(GBT) for (multiclass) classification.
        "classifier": "pyspark.ml.classification.OneVsRest(GBTClassifier)",
        "regressor": "pyspark.ml.regression.GBTRegressor",
    },
    "knn": {
        # No KNN estimator in MLlib; the engine's LSH-KNN
        # (similarity/knn.py) covers the retrieval use-case but is not an
        # Estimator. Documented-unsupported for the imputer surface.
        "classifier": None,
        "regressor": None,
    },
    "mlp": {
        "classifier": "pyspark.ml.classification.MultilayerPerceptronClassifier"
        " (layers auto-derived when unset)",
        # MLlib has no MLP regressor.
        "regressor": None,
    },
}
