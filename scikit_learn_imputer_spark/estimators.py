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

import numpy as np
import pandas as pd

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


class _KNNParams(_DummyParams):
    """Shared KNN params; the fitted training set lives IN the Params so
    ``DefaultParamsWritable`` persists the model through the engine's
    existing MLlib-writer model sink (S3) with no custom serialization."""

    k = Param(
        Params._dummy(), "k", "number of neighbors",
        typeConverter=TypeConverters.toInt,
    )
    maxFitRows = Param(
        Params._dummy(), "maxFitRows",
        "broadcast guard: max training rows collected at fit",
        typeConverter=TypeConverters.toInt,
    )
    trainFlat = Param(
        Params._dummy(), "trainFlat", "row-major flattened training matrix",
        typeConverter=TypeConverters.toListFloat,
    )
    trainLabels = Param(
        Params._dummy(), "trainLabels", "training labels",
        typeConverter=TypeConverters.toListFloat,
    )
    dim = Param(
        Params._dummy(), "dim", "feature dimension",
        typeConverter=TypeConverters.toInt,
    )

    def getK(self) -> int:
        return self.getOrDefault(self.k)


class _KNNEstimatorBase(Estimator, _KNNParams):
    """k-nearest-neighbors fit: one guarded collect of (features, label).

    Closes the reference estimator matrix's last hole
    (reference tests.py:223 — ``KNeighborsClassifier/Regressor``): MLlib
    ships no KNN, so this wraps the engine's own neighbor-scoring kernel
    (similarity/knn.py's broadcast-matmul shape) as a ``pyspark.ml``
    Estimator/Model pair that slots into Pipeline / SparkImputer.

    Scale contract: exact KNN against the full training set is only viable
    while that set is broadcast-sized — the ``maxFitRows`` guard makes the
    bound explicit and the error points to the sub-quadratic LSH path
    (similarity/knn.py:cosine_topk_lsh) for retrieval at 100 TB. The
    TRANSFORM side stays fully distributed: each Arrow batch is scored with
    one BLAS matmul against the broadcast matrix, never a pair join."""

    def __init__(self, k: int = 5, max_fit_rows: int = 100_000):
        super().__init__()
        self._setDefault(
            k=5,
            maxFitRows=100_000,
            seed=0,
            strategy="uniform",
            featuresCol="features",
            labelCol="label",
            predictionCol="prediction",
            trainFlat=[],
            trainLabels=[],
            dim=0,
        )
        self._set(k=k, maxFitRows=max_fit_rows)

    _model_cls: type  # set by subclasses

    def _fit(self, dataset: DataFrame):
        from pyspark.ml.functions import vector_to_array

        cap = self.getOrDefault(self.maxFitRows)
        rows = (
            dataset.select(
                vector_to_array(F.col(self.getFeaturesCol())).alias("__f"),
                F.col(self.getLabelCol()).cast("double").alias("__l"),
            )
            .limit(cap + 1)
            .collect()
        )
        if len(rows) > cap:
            raise ValueError(
                f"KNN fit over more than maxFitRows={cap} training rows; "
                "exact KNN needs a broadcast-sized training set — use the "
                "LSH path (similarity/knn.py) for retrieval at scale"
            )
        if not rows:
            raise ValueError("KNN fit on an empty training set")
        dim = len(rows[0]["__f"])
        flat = [float(v) for r in rows for v in r["__f"]]
        labels = [float(r["__l"]) for r in rows]
        model = self._model_cls()
        model._set(
            k=self.getK(),
            maxFitRows=cap,
            featuresCol=self.getFeaturesCol(),
            labelCol=self.getLabelCol(),
            predictionCol=self.getPredictionCol(),
            trainFlat=flat,
            trainLabels=labels,
            dim=dim,
        )
        return model


class _KNNModelBase(Model, _KNNParams):
    """Shared transform: Arrow-batched pandas UDF; per batch one
    d²(x,t) = |x|² + |t|² − 2·x·tᵀ matmul + argpartition top-k. NaN feature
    entries (VectorAssembler handleInvalid='keep' on still-missing cells)
    are treated as 0.0 on both sides — deterministic, and consistent
    between fit and transform."""

    #: True → majority vote (ties → smallest label, sklearn mode
    #: semantics); False → mean of neighbor labels.
    _vote: bool

    def _transform(self, dataset: DataFrame) -> DataFrame:
        from pyspark.ml.functions import vector_to_array
        from pyspark.sql.functions import pandas_udf

        dim = self.getOrDefault(self.dim)
        k = max(1, min(self.getK(), len(self.getOrDefault(self.trainLabels))))
        vote = self._vote
        train = np.nan_to_num(
            np.asarray(self.getOrDefault(self.trainFlat), dtype="float64")
            .reshape(-1, dim)
        )
        labels = np.asarray(self.getOrDefault(self.trainLabels), dtype="float64")
        classes, codes = np.unique(labels, return_inverse=True)
        t_sq = (train * train).sum(axis=1)
        bcast = dataset.sparkSession.sparkContext.broadcast(
            (train, t_sq, labels, classes, codes)
        )

        @pandas_udf("double")
        def knn_predict(arrs: pd.Series) -> pd.Series:
            tr, tsq, lab, cls, cod = bcast.value
            X = np.nan_to_num(np.array(list(arrs), dtype="float64"))
            # (batch, n_train) squared distances via one matmul.
            d2 = ((X * X).sum(axis=1)[:, None] + tsq[None, :]
                  - 2.0 * (X @ tr.T))
            nbr = np.argpartition(d2, kth=k - 1, axis=1)[:, :k]
            if vote:
                counts = (
                    cod[nbr][:, :, None] == np.arange(len(cls))[None, None, :]
                ).sum(axis=1)
                # argmax returns the FIRST max; classes are sorted, so ties
                # break toward the smallest label (sklearn mode semantics).
                out = cls[np.argmax(counts, axis=1)]
            else:
                out = lab[nbr].mean(axis=1)
            return pd.Series(out)

        return dataset.withColumn(
            self.getPredictionCol(),
            knn_predict(vector_to_array(F.col(self.getFeaturesCol()))),
        )


class KNNClassifier(
    _KNNEstimatorBase, DefaultParamsReadable, DefaultParamsWritable
):
    """sklearn ``KNeighborsClassifier(n_neighbors=k)`` counterpart:
    unweighted majority vote over the k nearest (euclidean) neighbors."""


class KNNClassifierModel(
    _KNNModelBase, DefaultParamsReadable, DefaultParamsWritable
):
    _vote = True

    def __init__(self):
        super().__init__()
        self._setDefault(
            k=5, maxFitRows=100_000, seed=0, strategy="uniform",
            trainFlat=[], trainLabels=[], dim=0,
        )


class KNNRegressor(
    _KNNEstimatorBase, DefaultParamsReadable, DefaultParamsWritable
):
    """sklearn ``KNeighborsRegressor(n_neighbors=k)`` counterpart: mean of
    the k nearest neighbors' labels."""


class KNNRegressorModel(
    _KNNModelBase, DefaultParamsReadable, DefaultParamsWritable
):
    _vote = False

    def __init__(self):
        super().__init__()
        self._setDefault(
            k=5, maxFitRows=100_000, seed=0, strategy="uniform",
            trainFlat=[], trainLabels=[], dim=0,
        )


KNNClassifier._model_cls = KNNClassifierModel
KNNRegressor._model_cls = KNNRegressorModel


class _MLPParams(_DummyParams):
    """MLP regressor params; fitted weights live IN the Params (flattened)
    so ``DefaultParamsWritable`` persists the model through the engine's
    MLlib-writer model sink exactly like the KNN pair."""

    hiddenLayerSizes = Param(
        Params._dummy(), "hiddenLayerSizes", "hidden layer widths",
        typeConverter=TypeConverters.toListInt,
    )
    maxIter = Param(
        Params._dummy(), "maxIter", "full-batch Adam steps",
        typeConverter=TypeConverters.toInt,
    )
    stepSize = Param(
        Params._dummy(), "stepSize", "Adam learning rate",
        typeConverter=TypeConverters.toFloat,
    )
    maxFitRows = Param(
        Params._dummy(), "maxFitRows",
        "driver guard: max training rows collected at fit",
        typeConverter=TypeConverters.toInt,
    )
    weightsFlat = Param(
        Params._dummy(), "weightsFlat", "flattened [W1,b1,W2,b2,...]",
        typeConverter=TypeConverters.toListFloat,
    )
    layerDims = Param(
        Params._dummy(), "layerDims", "[n_in, hidden..., 1]",
        typeConverter=TypeConverters.toListInt,
    )
    featCenter = Param(
        Params._dummy(), "featCenter", "feature standardization means",
        typeConverter=TypeConverters.toListFloat,
    )
    featScale = Param(
        Params._dummy(), "featScale", "feature standardization stds",
        typeConverter=TypeConverters.toListFloat,
    )
    labelCenter = Param(
        Params._dummy(), "labelCenter", "label mean",
        typeConverter=TypeConverters.toFloat,
    )
    labelScale = Param(
        Params._dummy(), "labelScale", "label std",
        typeConverter=TypeConverters.toFloat,
    )


def _mlp_defaults(obj) -> None:
    obj._setDefault(
        hiddenLayerSizes=[32], maxIter=300, stepSize=0.01,
        maxFitRows=100_000, seed=0, strategy="adam",
        featuresCol="features", labelCol="label", predictionCol="prediction",
        weightsFlat=[], layerDims=[], featCenter=[], featScale=[],
        labelCenter=0.0, labelScale=1.0,
    )


def _unflatten(flat: np.ndarray, dims: list[int]):
    """[W1,b1,W2,b2,...] from the flat Params vector."""
    ws, off = [], 0
    for i in range(len(dims) - 1):
        n_in, n_out = dims[i], dims[i + 1]
        W = flat[off:off + n_in * n_out].reshape(n_in, n_out)
        off += n_in * n_out
        b = flat[off:off + n_out]
        off += n_out
        ws.append((W, b))
    return ws


def _mlp_forward(X: np.ndarray, ws) -> np.ndarray:
    a = X
    for W, b in ws[:-1]:
        a = np.tanh(a @ W + b)
    W, b = ws[-1]
    return (a @ W + b)[:, 0]


class MLPRegressor(
    Estimator, _MLPParams, DefaultParamsReadable, DefaultParamsWritable
):
    """sklearn ``MLPRegressor``-shaped estimator — closes the reference
    matrix's 8th pair (reference tests.py:234): MLlib ships an MLP
    *classifier* but no MLP *regressor*, so this fits a small tanh MLP
    (linear output head, full-batch Adam on standardized features/label,
    seeded numpy → deterministic) on a guarded-collect training set,
    mirroring the KNN pattern (same ``maxFitRows`` contract:
    imputation training sets are label-complete subsets that must be
    driver-sized; the error names the bound). The TRANSFORM side stays
    fully distributed — one Arrow-batched forward pass per batch."""

    def __init__(
        self,
        hidden_layer_sizes: tuple[int, ...] = (32,),
        max_iter: int = 300,
        step_size: float = 0.01,
        seed: int = 0,
        max_fit_rows: int = 100_000,
    ):
        super().__init__()
        _mlp_defaults(self)
        self._set(
            hiddenLayerSizes=list(hidden_layer_sizes),
            maxIter=max_iter,
            stepSize=step_size,
            seed=seed,
            maxFitRows=max_fit_rows,
        )

    def _fit(self, dataset: DataFrame) -> "MLPRegressorModel":
        from pyspark.ml.functions import vector_to_array

        cap = self.getOrDefault(self.maxFitRows)
        rows = (
            dataset.select(
                vector_to_array(F.col(self.getFeaturesCol())).alias("__f"),
                F.col(self.getLabelCol()).cast("double").alias("__l"),
            )
            .limit(cap + 1)
            .collect()
        )
        if len(rows) > cap:
            raise ValueError(
                f"MLPRegressor fit over more than maxFitRows={cap} training "
                "rows; the driver-side fit needs a bounded training set — "
                "raise max_fit_rows deliberately or sample the training data"
            )
        if not rows:
            raise ValueError("MLPRegressor fit on an empty training set")

        X = np.nan_to_num(np.array([r["__f"] for r in rows], dtype="float64"))
        y = np.array([r["__l"] for r in rows], dtype="float64")
        mu, sd = X.mean(axis=0), X.std(axis=0)
        sd = np.where(sd > 0, sd, 1.0)
        Xs = (X - mu) / sd
        ym = float(y.mean())
        ys = float(y.std()) or 1.0
        yn = (y - ym) / ys

        hidden = [int(h) for h in self.getOrDefault(self.hiddenLayerSizes)]
        dims = [Xs.shape[1], *hidden, 1]
        rng = np.random.default_rng(self.getOrDefault(self.seed))
        ws = [
            (
                rng.normal(0.0, np.sqrt(1.0 / dims[i]), (dims[i], dims[i + 1])),
                np.zeros(dims[i + 1]),
            )
            for i in range(len(dims) - 1)
        ]

        lr = float(self.getOrDefault(self.stepSize))
        beta1, beta2, eps = 0.9, 0.999, 1e-8
        mom = [(np.zeros_like(W), np.zeros_like(b)) for W, b in ws]
        vel = [(np.zeros_like(W), np.zeros_like(b)) for W, b in ws]
        n = len(yn)
        for t in range(1, int(self.getOrDefault(self.maxIter)) + 1):
            # Forward, keeping activations for backprop.
            acts = [Xs]
            for W, b in ws[:-1]:
                acts.append(np.tanh(acts[-1] @ W + b))
            W, b = ws[-1]
            out = (acts[-1] @ W + b)[:, 0]
            # Backprop of mean squared error.
            delta = (2.0 / n) * (out - yn)[:, None]
            grads: list[tuple[np.ndarray, np.ndarray]] = []
            for i in range(len(ws) - 1, -1, -1):
                W, _ = ws[i]
                gW = acts[i].T @ delta
                gb = delta.sum(axis=0)
                grads.append((gW, gb))
                if i > 0:
                    delta = (delta @ W.T) * (1.0 - acts[i] ** 2)
            grads.reverse()
            # Adam update.
            corr1, corr2 = 1 - beta1**t, 1 - beta2**t
            for i, ((W, b), (gW, gb)) in enumerate(zip(ws, grads)):
                mW, mb = mom[i]
                vW, vb = vel[i]
                mW = beta1 * mW + (1 - beta1) * gW
                mb = beta1 * mb + (1 - beta1) * gb
                vW = beta2 * vW + (1 - beta2) * gW**2
                vb = beta2 * vb + (1 - beta2) * gb**2
                mom[i], vel[i] = (mW, mb), (vW, vb)
                ws[i] = (
                    W - lr * (mW / corr1) / (np.sqrt(vW / corr2) + eps),
                    b - lr * (mb / corr1) / (np.sqrt(vb / corr2) + eps),
                )

        flat = np.concatenate(
            [np.concatenate([W.ravel(), b]) for W, b in ws]
        )
        model = MLPRegressorModel()
        model._set(
            hiddenLayerSizes=hidden,
            maxIter=self.getOrDefault(self.maxIter),
            stepSize=lr,
            seed=self.getOrDefault(self.seed),
            maxFitRows=cap,
            featuresCol=self.getFeaturesCol(),
            labelCol=self.getLabelCol(),
            predictionCol=self.getPredictionCol(),
            weightsFlat=[float(v) for v in flat],
            layerDims=dims,
            featCenter=[float(v) for v in mu],
            featScale=[float(v) for v in sd],
            labelCenter=ym,
            labelScale=ys,
        )
        return model


class MLPRegressorModel(
    Model, _MLPParams, DefaultParamsReadable, DefaultParamsWritable
):
    def __init__(self):
        super().__init__()
        _mlp_defaults(self)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        from pyspark.ml.functions import vector_to_array
        from pyspark.sql.functions import pandas_udf

        dims = [int(d) for d in self.getOrDefault(self.layerDims)]
        ws = _unflatten(
            np.asarray(self.getOrDefault(self.weightsFlat), dtype="float64"),
            dims,
        )
        mu = np.asarray(self.getOrDefault(self.featCenter), dtype="float64")
        sd = np.asarray(self.getOrDefault(self.featScale), dtype="float64")
        ym = float(self.getOrDefault(self.labelCenter))
        ys = float(self.getOrDefault(self.labelScale))
        bcast = dataset.sparkSession.sparkContext.broadcast((ws, mu, sd, ym, ys))

        @pandas_udf("double")
        def mlp_predict(arrs: pd.Series) -> pd.Series:
            w, m, s, a, b = bcast.value
            X = np.nan_to_num(np.array(list(arrs), dtype="float64"))
            Xs = (X - m) / s
            return pd.Series(_mlp_forward(Xs, w) * b + a)

        return dataset.withColumn(
            self.getPredictionCol(),
            mlp_predict(vector_to_array(F.col(self.getFeaturesCol()))),
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
        # MLlib has no KNN; the engine ships its own Estimator pair
        # (broadcast-matmul exact KNN with an explicit maxFitRows guard;
        # similarity/knn.py's LSH path is the retrieval-scale analogue).
        "classifier": "scikit_learn_imputer_spark.estimators.KNNClassifier",
        "regressor": "scikit_learn_imputer_spark.estimators.KNNRegressor",
    },
    "mlp": {
        "classifier": "pyspark.ml.classification.MultilayerPerceptronClassifier"
        " (layers auto-derived when unset)",
        # MLlib has no MLP regressor; the engine ships its own (seeded
        # numpy tanh MLP, guarded driver fit / distributed transform —
        # same contract as the KNN pair).
        "regressor": "scikit_learn_imputer_spark.estimators.MLPRegressor",
    },
}
