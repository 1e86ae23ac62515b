"""Semantic invariants for the pipeline-ops reporting queries (round 6).

The DuckDB parity suite pins exact values; these tests pin the MEANING —
mass conservation, monotonicity, bounds — so a future refactor that
changes both engines in lockstep (and therefore still hash-matches)
cannot silently break the reports' semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.plans.queries import QUERIES
from scikit_learn_imputer_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs_total(spark, sf_smoke):
    d = load_table(spark, sf_smoke, "documents")
    return (
        d.count(),
        d.filter(F.col("doc_id") % 100 >= 2).count(),
    )


def test_filter_waterfall_conserves_corpus_mass(spark, sf_smoke, docs_total):
    rows = QUERIES["filter_waterfall"](spark, sf_smoke).collect()
    _, n_corpus = docs_total
    assert sum(r["n_docs"] for r in rows) == n_corpus
    names = {r["stage"] for r in rows}
    assert names <= {"lang", "quality", "gopher", "exact_dup", "decontam", "kept"}
    by_order = {r["stage_order"]: r["stage"] for r in rows}
    want = {1: "lang", 2: "quality", 3: "gopher", 4: "exact_dup",
            5: "decontam", 6: "kept"}
    assert all(want[k] == v for k, v in by_order.items())
    kept = [r for r in rows if r["stage"] == "kept"]
    assert kept and kept[0]["n_docs"] > 0


def test_corpus_holdout_split_conserves_and_balances(spark, sf_smoke, docs_total):
    rows = QUERIES["corpus_holdout_split"](spark, sf_smoke).collect()
    n_all, _ = docs_total
    assert sum(r["n_docs"] for r in rows) == n_all
    per_split = {}
    for r in rows:
        per_split[r["split"]] = per_split.get(r["split"], 0) + r["n_docs"]
    assert set(per_split) <= {"train", "val", "test"}
    # 98/1/1 split: train holds the bulk (binomial tail leaves wide margin)
    assert per_split["train"] / n_all > 0.9


def test_vocab_coverage_is_monotone_to_one(spark, sf_smoke):
    rows = sorted(
        QUERIES["vocab_coverage"](spark, sf_smoke).collect(),
        key=lambda r: r["rank"],
    )
    fracs = [r["cum_frac"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(fracs, fracs[1:]))
    assert abs(fracs[-1] - 1.0) < 1e-6
    freqs = [r["freq"] for r in rows]
    assert all(a >= b for a, b in zip(freqs, freqs[1:]))


def test_mixture_epoch_plan_caps_and_normalizes(spark, sf_smoke):
    rows = QUERIES["mixture_epoch_plan"](spark, sf_smoke).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r["capped_epochs"] <= 4.0 + 1e-9
        assert r["capped_epochs"] <= r["epochs"] + 1e-9
        assert r["achieved_tokens"] <= 4 * r["n_tokens"] + 1
    # constant-budget rebalance: targets sum back to the corpus total
    assert (
        abs(sum(r["target_tokens"] for r in rows)
            - sum(r["n_tokens"] for r in rows))
        <= len(rows)  # per-source rounding slack
    )


def test_lm_score_deciles_partition_and_order(spark, sf_smoke, docs_total):
    rows = sorted(
        QUERIES["lm_score_deciles"](spark, sf_smoke).collect(),
        key=lambda r: r["decile"],
    )
    n_all, _ = docs_total
    assert sum(r["n_docs"] for r in rows) == n_all
    assert [r["decile"] for r in rows] == list(range(1, len(rows) + 1))
    means = [r["mean_lm_score"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(means, means[1:]))
    for r in rows:
        assert r["min_lm_score"] <= r["mean_lm_score"] <= r["max_lm_score"]


def test_ngram_novelty_curve_monotone_in_n(spark, sf_smoke):
    rows = sorted(
        QUERIES["ngram_novelty_curve"](spark, sf_smoke).collect(),
        key=lambda r: r["n"],
    )
    assert [r["n"] for r in rows] == [1, 2, 3, 5, 8]
    # longer grams are rarer to repeat: duplicate mass falls with n
    dup = [r["dup_mass"] for r in rows]
    assert all(a >= b - 1e-12 for a, b in zip(dup, dup[1:]))
    for r in rows:
        assert 0.0 <= r["dup_mass"] < 1.0
        assert r["distinct_grams"] <= r["occurrences"]


def test_contamination_report_rates_bounded(spark, sf_smoke, docs_total):
    rows = QUERIES["contamination_report"](spark, sf_smoke).collect()
    _, n_corpus = docs_total
    assert sum(r["n_docs"] for r in rows) == n_corpus
    for r in rows:
        assert 0 <= r["n_contaminated"] <= r["n_docs"]
        assert abs(r["contam_rate"] - r["n_contaminated"] / r["n_docs"]) < 1e-6
