"""Model-based quality filtering (the fineweb-edu / DCLM pattern):
distill an EXPENSIVE document gate into a cheap-feature classifier.

The Gopher repetition gate (functions/repetition.py) costs four gram
explodes per document. At 100 TB you run it once over a sample, train a
model that predicts its verdict from CHEAP map-only features (char/token
counts and ratios — one projection over the scan), then gate the full
corpus with the model: inference is a single whole-stage-codegen
projection plus a broadcast model, no explodes. The same dataflow
generalizes to any teacher signal (an LLM judge, a human-labeled set).

Determinism: RandomForest with a fixed seed on a fixed split is
reproducible run to run; the train/eval split is the engine's modular
doc_id split (no engine randomness). No SQL oracle is possible for MLlib
internals — the query registers rows-only with a NAMED anchor test
(holdout-accuracy floor + determinism), the same contract as
spark_imputer_e2e.

No reference counterpart (the reference is a single-node imputer); this
is north-star training-data surface.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.functions.repetition import repetition_signals
from scikit_learn_imputer_spark.functions.text import quality_features

CHEAP_FEATURES = (
    "q_chars",
    "q_tokens",
    "q_avg_token_len",
    "q_stopword_ratio",
    "q_punct_ratio",
    "q_score",
)


def gopher_label_col() -> Column:
    """The teacher verdict: the oracled Gopher gate (same thresholds as
    the gopher_quality_gate query), as a 0/1 label."""
    return (
        F.col("n_tokens").between(30, 95)
        & (F.col("top2_frac") <= 0.12)
        & (F.col("top3_frac") <= 0.10)
        & (F.col("dup5_frac") <= 0.15)
        & (F.col("dup8_frac") <= 0.10)
    ).cast("double")


def quality_training_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, cheap features..., label) — teacher signals computed ONCE
    (the expensive pass), cheap features as map-only projections."""
    cheap = quality_features(docs.select(id_col, text_col)).select(
        id_col,
        *[F.coalesce(F.col(c), F.lit(0.0)).cast("double").alias(c) for c in CHEAP_FEATURES],
    )
    teacher = repetition_signals(docs, id_col=id_col, text_col=text_col).select(
        id_col, gopher_label_col().alias("label")
    )
    return cheap.join(teacher, id_col)


def train_quality_model(
    train: DataFrame, seed: int = 42, num_trees: int = 20, max_depth: int = 5
):
    """Fit assembler+RF on a quality_training_frame. Tree ensembles are
    the right hypothesis class here: the teacher gate is a BAND on
    n_tokens plus threshold rules — axis-aligned splits express it,
    a linear model cannot."""
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=list(CHEAP_FEATURES), outputCol="features"),
            RandomForestClassifier(
                numTrees=num_trees, maxDepth=max_depth, seed=seed, labelCol="label"
            ),
        ]
    )
    return pipe.fit(train)


def quality_model_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    frame: DataFrame | None = None,
) -> DataFrame:
    """Train on the modular 80% split (doc_id % 10 < 8), score the held
    20%: (id, label, p_good, pred). The returned frame is the HOLDOUT
    evaluation a filter designer reads before trusting the distilled
    gate on the full corpus.

    ``frame`` — an already-persisted ``quality_training_frame`` to
    reuse (the agreement audit shares ONE teacher pass between the RF
    and stump twins instead of recomputing it per model — optimization
    round 14); ownership stays with the caller (not unpersisted
    here)."""
    # fit() consumes the training frame eagerly and the lazy holdout plan
    # reads it again at evaluation, so it is persisted across both — then
    # the scored holdout is eagerly materialized (localCheckpoint, the
    # spans/semdedup pattern) so the cache can be released before
    # returning instead of leaking until ContextCleaner GC (ADVICE r6).
    # At 100 TB the persist is a parquet checkpoint.
    own_frame = frame is None
    if own_frame:
        frame = quality_training_frame(docs, id_col, text_col).persist()
    train = frame.filter(F.col(id_col) % 10 < 8)
    hold = frame.filter(F.col(id_col) % 10 >= 8)
    model = train_quality_model(train, seed=seed)
    scored = model.transform(hold)
    prob = vector_to_array("probability")
    # A degenerate train split (single label class) yields a length-1
    # probability vector; element_at(.., 2) would throw under ANSI mode.
    # numClasses = max(label)+1, so the only length-1 shape is all-0
    # labels, where P(good) == prediction == 0 (ADVICE r6).
    p_good = F.when(F.size(prob) >= 2, F.element_at(prob, 2)).otherwise(
        F.col("prediction").cast("double")
    )
    out = scored.select(
        F.col(id_col),
        F.col("label").cast("bigint").alias("label"),
        F.round(p_good, 6).alias("p_good"),
        F.col("prediction").cast("bigint").alias("pred"),
    ).localCheckpoint(eager=True)
    if own_frame:
        frame.unpersist()
    return out


# Micro-unit snap and the band width (in snapped units) for the
# engine-exact stump's exact-rank decile thresholds. The width only
# shapes the banded two-pass (#bands stays metadata-sized: the widest
# feature domain, chars at ~1e10 micro-units, gives ~1e4 bands); one
# width serves every feature because the deciles come from ONE grouped
# exact_rank_quantiles call over the feature-long frame.
_SNAP = 1_000_000
_THR_BAND_WIDTH = 1e6


def snapped_features_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frame: DataFrame | None = None,
) -> DataFrame:
    """(id, label, x0..x5): the quality_training_frame with every cheap
    feature snapped to BIGINT micro-units (round(f * 1e6)) — the
    source_quality_matrix snap, so downstream integer arithmetic is
    bit-identical on any engine. ``frame`` reuses an already-computed
    ``quality_training_frame`` (see quality_model_scores)."""
    if frame is None:
        frame = quality_training_frame(docs, id_col, text_col)
    return frame.select(
        id_col,
        F.col("label").cast("bigint").alias("label"),
        *[
            F.round(F.col(c) * _SNAP).cast("bigint").alias(f"x{i}")
            for i, c in enumerate(CHEAP_FEATURES)
        ],
    )


def quality_model_holdout_snapped(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frame: DataFrame | None = None,
) -> DataFrame:
    """ENGINE-EXACT distilled-gate holdout: the ``ivf_balance_snapped``
    technique applied to model distillation (VERDICT r12 #4), so the
    per-doc holdout frame is driver-hash-checkable end to end. The
    model is a decision stump with empirical leaf probabilities,
    trained on the SAME cheap features and split as the RandomForest
    (which stays registered as the anchored production twin,
    quality_model_holdout_rf):

    - features snap to BIGINT micro-units;
    - candidate thresholds are the EXACT lower-rank train deciles per
      feature (stats.py:exact_rank_quantiles — distributed, banded);
    - each of the 54 candidates is scored by its best-achievable train
      accuracy with per-leaf majority labels, in ONE map-side-combined
      aggregate over the feature-long frame (54 groups);
    - ties break on (accuracy DESC, feature index ASC, decile ASC);
    - holdout scoring: pred = leaf majority (tie -> 0), p_good =
      (1e6 * leaf_pos div leaf_n) / 1e6 — integer floor-div then one
      exact double divide, identical on any engine; an empty train
      leaf scores (0.5, 0).

    Returns (id, label, p_good, pred) for the modular 20% holdout —
    the same shape as the RF holdout frame. Scale shape: two passes
    over the snapped frame (deciles + candidate aggregate; the frame is
    persisted), a 54-row broadcast argmin, and a map-only scoring
    projection; the 9x feature-long expansion collapses map-side."""
    snapped = snapped_features_frame(
        docs, id_col, text_col, frame=frame
    ).persist()
    train = snapped.filter(F.col(id_col) % 10 < 8)
    hold = snapped.filter(F.col(id_col) % 10 >= 8)

    from scikit_learn_imputer_spark.functions.stats import (
        exact_rank_quantiles,
    )

    fracs = [(k, 10) for k in range(1, 10)]
    tnames = [f"t{k}" for k in range(1, 10)]
    train_long = train.select(
        "label",
        F.posexplode(
            F.array(*[f"x{i}" for i in range(len(CHEAP_FEATURES))])
        ).alias("fidx", "x"),
    )
    # ONE grouped two-pass over the feature-long frame (r13 review:
    # six serial per-feature calls each paid the banded machinery's
    # fixed scheduling constant — identical threshold values, 6x the
    # eager jobs).
    # Per-feature distinct domains are bounded (ratios/score are
    # micro-snapped [0, 1e6] lattices; chars/tokens/avg-token-len have
    # at most one distinct value per possible document length) → the
    # single-aggregate fast path applies, runtime-guarded at 4M distinct
    # per feature (VERDICT r13 #1 — drops the eager banded constant).
    thresholds = exact_rank_quantiles(
        train_long,
        "x",
        fracs,
        tnames,
        band_width=_THR_BAND_WIDTH,
        group_cols=("fidx",),
        domain_bound=4_000_000,
    ).select(
        "fidx", F.posexplode(F.array(*tnames)).alias("tidx0", "t")
    ).select("fidx", (F.col("tidx0") + 1).alias("tidx"), "t")
    ge = (F.col("x") >= F.col("t")).cast("bigint")
    cand = (
        train_long.join(F.broadcast(thresholds), "fidx")
        .groupBy("fidx", "tidx", "t")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").alias("pos"),
            F.sum(ge).alias("n_ge"),
            F.sum(F.col("label") * ge).alias("pos_ge"),
        )
    )
    acc = F.greatest(
        F.col("pos_ge"), F.col("n_ge") - F.col("pos_ge")
    ) + F.greatest(
        F.col("pos") - F.col("pos_ge"),
        (F.col("n") - F.col("n_ge")) - (F.col("pos") - F.col("pos_ge")),
    )
    best = (
        cand.select(
            "fidx",
            "tidx",
            "t",
            "n_ge",
            "pos_ge",
            (F.col("n") - F.col("n_ge")).alias("n_lt"),
            (F.col("pos") - F.col("pos_ge")).alias("pos_lt"),
            acc.alias("__acc"),
        )
        .orderBy(F.col("__acc").desc(), "fidx", "tidx")
        .limit(1)
    )
    x_sel = F.element_at(
        F.array(*[f"x{i}" for i in range(len(CHEAP_FEATURES))]),
        (F.col("fidx") + 1).cast("int"),
    )
    in_ge = x_sel >= F.col("t")
    leaf_n = F.when(in_ge, F.col("n_ge")).otherwise(F.col("n_lt"))
    leaf_pos = F.when(in_ge, F.col("pos_ge")).otherwise(F.col("pos_lt"))
    # Intermediate aliases keep the div expression SQL-side integer
    # division (bit-exact), not a Python float divide.
    scored = hold.crossJoin(F.broadcast(best)).select(
        F.col(id_col),
        "label",
        leaf_n.alias("__leaf_n"),
        leaf_pos.alias("__leaf_pos"),
    )
    result = scored.select(
        F.col(id_col),
        "label",
        F.when(
            F.col("__leaf_n") > 0,
            F.expr("1000000 * __leaf_pos div __leaf_n") / F.lit(1e6),
        )
        .otherwise(F.lit(0.5))
        .alias("p_good"),
        F.when(
            (F.col("__leaf_n") > 0)
            & (2 * F.col("__leaf_pos") > F.col("__leaf_n")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pred"),
    ).localCheckpoint(eager=True)
    snapped.unpersist()
    return result


def quality_model_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Oracled audit of the (rows-only) distilled-gate holdout — the
    ``imputer_output_audit`` pattern (VERDICT r11 #1): the oracle
    computes, from the INPUT alone, what a correct holdout evaluation
    must produce — holdout row count, the teacher's positive-label count
    (the Gopher gate is SQL-expressible), every probability inside
    [0, 1], every prediction binary and consistent with the 0.5
    threshold on the UNROUNDED probability, and holdout accuracy at or
    above the 0.8 anchor floor. The Spark side measures the ACTUAL MLlib
    output, so a dropped holdout row, an out-of-range probability, an
    argmax/threshold disagreement, or an accuracy regression each flips
    the driver row red."""
    frame = quality_training_frame(docs, id_col, text_col).persist()
    train = frame.filter(F.col(id_col) % 10 < 8)
    hold = frame.filter(F.col(id_col) % 10 >= 8)
    model = train_quality_model(train, seed=seed)
    scored = model.transform(hold)
    prob = vector_to_array("probability")
    p_good = F.when(F.size(prob) >= 2, F.element_at(prob, 2)).otherwise(
        F.col("prediction").cast("double")
    )
    pred = F.col("prediction").cast("bigint")
    label = F.col("label").cast("bigint")
    audited = scored.select(
        label.alias("label"), p_good.alias("p_good"), pred.alias("pred")
    )
    n = F.count(F.lit(1))
    out = audited.agg(
        n.cast("long").alias("n_holdout"),
        F.sum("label").cast("long").alias("n_label_pos"),
        F.sum(
            ((F.col("p_good") >= 0.0) & (F.col("p_good") <= 1.0)).cast("long")
        ).alias("probs_in_unit_interval"),
        F.sum(F.col("pred").isin(0, 1).cast("long")).alias("preds_binary"),
        # Tie-tolerant (ADVICE r12): p_good is raw1/(raw0+raw1) after
        # floating-point division, so a holdout row where raw1 barely
        # exceeds raw0 can round to EXACTLY 0.5 — argmax says 1, the
        # strict > 0.5 rule says 0. At a tie either verdict is
        # argmax-consistent, so the check accepts both sides there.
        F.sum(
            (
                (
                    F.col("pred")
                    == F.when(F.col("p_good") > 0.5, F.lit(1)).otherwise(
                        F.lit(0)
                    )
                )
                | (F.col("p_good") == 0.5)
            ).cast("long")
        ).alias("preds_match_threshold"),
        (
            F.sum((F.col("pred") == F.col("label")).cast("long"))
            >= F.ceil(n * F.lit(0.8))
        ).alias("accuracy_ge_080"),
    ).localCheckpoint(eager=True)
    frame.unpersist()
    return out


def quality_model_rf_agreement_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Oracled agreement audit between the PRODUCTION RandomForest
    holdout and its engine-exact snapped-stump twin (VERDICT r13 #2 —
    the invariant-audit technique extended with the cross-model
    agreement floor that quality_model_audit cannot express): the
    oracle computes from the input alone the holdout row count and the
    teacher's positive-label count, and pins TRUE for what a correct RF
    run MUST satisfy — the per-doc inner join with the stump frame
    covers the whole holdout (a dropped row shrinks n_holdout below the
    oracle's count), both models see identical teacher labels, every RF
    verdict is threshold-consistent with its probability (0.5 ties
    accepted either way, ADVICE r12), RF accuracy vs the teacher meets
    the 0.8 anchor floor, and RF agrees with the driver-hashed stump on
    at least 80% of holdout docs (computable as an expectation because
    the stump side IS SQL — quality_model_holdout). Any violated
    invariant flips the driver row red; the raw per-doc RF frame stays
    registered as the anchored quality_model_holdout_rf_frame.

    The teacher pass (quality features + repetition signals + label
    join) is computed ONCE and shared between the RF and stump twins
    (optimization round 14 — the audit previously ran the full
    quality_training_frame pipeline twice, once inside each model
    path; at 100 TB that is a second full corpus scoring pass for
    identical values). Both sub-builders localCheckpoint their own
    outputs eagerly, so the shared cache is released before this
    function returns."""
    shared = quality_training_frame(docs, id_col, text_col).persist()
    rf = quality_model_scores(docs, id_col, text_col, seed=seed, frame=shared)
    st = quality_model_holdout_snapped(
        docs, id_col, text_col, frame=shared
    ).select(
        F.col(id_col),
        F.col("label").alias("__st_label"),
        F.col("pred").alias("__st_pred"),
    )
    shared.unpersist()
    j = rf.join(st, on=id_col, how="inner")
    n = F.count(F.lit(1))
    return j.agg(
        n.cast("long").alias("n_holdout"),
        F.sum("label").cast("long").alias("n_label_pos"),
        (
            F.min((F.col("label") == F.col("__st_label")).cast("long")) == 1
        ).alias("labels_agree"),
        (
            F.min(
                (
                    (
                        F.col("pred")
                        == F.when(
                            F.col("p_good") > 0.5, F.lit(1)
                        ).otherwise(F.lit(0))
                    )
                    | (F.col("p_good") == 0.5)
                ).cast("long")
            )
            == 1
        ).alias("preds_threshold_consistent"),
        (
            F.sum((F.col("pred") == F.col("label")).cast("long"))
            >= F.ceil(n * F.lit(0.8))
        ).alias("rf_accuracy_ge_080"),
        (
            F.sum((F.col("pred") == F.col("__st_pred")).cast("long"))
            >= F.ceil(n * F.lit(0.8))
        ).alias("stump_agreement_ge_080"),
    )
