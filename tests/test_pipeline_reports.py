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


def _reference_bpe(word_freqs: dict[str, int], k: int):
    """Independent in-test BPE learner (Sennrich et al. 2016 learn_bpe,
    dict-of-word-counts form) used to golden-check the distributed one."""
    segs = {w: list(w) for w in word_freqs}
    out = []
    for rank in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for w in segs:
            s, merged, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(s[i])
                    i += 1
            segs[w] = merged
        out.append((rank, a, b, a + b, c))
    return out


def test_learn_bpe_merges_matches_reference_learner(spark):
    from scikit_learn_imputer_spark.functions.bpe import learn_bpe_merges

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "widest widest widest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _reference_bpe(freqs, 6)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_freq"])
        for r in learn_bpe_merges(docs, num_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want
    # best-pair frequency is non-increasing across ranks
    fs = [g[4] for g in got]
    assert all(a >= b for a, b in zip(fs, fs[1:]))
    # determinism across runs
    again = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_freq"])
        for r in learn_bpe_merges(docs, num_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    assert again == got


def test_learn_bpe_merges_early_stop_when_exhausted(spark):
    from scikit_learn_imputer_spark.functions.bpe import learn_bpe_merges

    docs = spark.createDataFrame([(0, "ab ab ab")], "doc_id bigint, text string")
    rows = learn_bpe_merges(docs, num_merges=10).collect()
    # 'ab' has exactly one merge; the loop must stop, not loop on nothing
    assert len(rows) == 1
    assert (rows[0]["lhs"], rows[0]["rhs"], rows[0]["merged"]) == ("a", "b", "ab")


def test_quality_model_holdout_rf_anchor(spark, sf_smoke):
    """ANCHOR for quality_model_holdout_rf_frame (rows-only in the
    driver gate): the production RandomForest distilled gate must actually
    track the expensive teacher gate on held-out docs, and be
    reproducible. Its SQL-expressible invariants are driver-hashed via
    the oracled quality_model_scores audit, and the per-doc scoring
    contract via the engine-exact stump twin (quality_model_holdout,
    driver-hashed)."""
    rows = QUERIES["quality_model_holdout_rf_frame"](spark, sf_smoke).collect()
    assert len(rows) > 0
    acc = sum(1 for r in rows if r["pred"] == r["label"]) / len(rows)
    assert acc >= 0.8, f"distilled gate accuracy {acc:.3f} below floor"
    for r in rows:
        assert 0.0 <= r["p_good"] <= 1.0
        assert r["doc_id"] % 10 >= 8  # holdout only
    again = QUERIES["quality_model_holdout_rf_frame"](spark, sf_smoke).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_ann_ivf_balance_mllib_anchor(spark, sf_smoke):
    """ANCHOR for ann_ivf_balance_mllib_hist (rows-only): cell mass conserves
    the corpus, bounds hold, and the seeded build reproduces. The
    engine-exact snapped twin (ann_ivf_balance) is driver-hashed."""
    rows = QUERIES["ann_ivf_balance_mllib_hist"](spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    n_vecs = load_table(spark, sf_smoke, "embeddings").count()
    assert r["n_vectors"] == n_vecs
    assert 1 <= r["cells_used"] <= r["nlist"]
    assert r["min_cell"] <= r["mean_cell"] <= r["max_cell"]
    assert r["imbalance"] >= 1.0
    assert 0.0 < r["max_cell_share"] <= 1.0
    again = QUERIES["ann_ivf_balance_mllib_hist"](spark, sf_smoke).collect()
    assert [tuple(x) for x in again] == [tuple(x) for x in rows]


def test_ivf_balance_snapped_matches_mllib_shape(spark, sf_smoke):
    """The snapped exact-integer twin must describe the SAME corpus as
    the MLlib build: identical n_vectors, same invariant bounds — and
    the snapped build must itself be deterministic."""
    rows = QUERIES["ann_ivf_balance"](spark, sf_smoke).collect()
    assert len(rows) == 1
    r = rows[0]
    n_vecs = load_table(spark, sf_smoke, "embeddings").count()
    assert r["n_vectors"] == n_vecs
    assert 1 <= r["cells_used"] <= r["nlist"] == 8
    assert r["min_cell"] <= r["mean_cell"] <= r["max_cell"]
    assert r["imbalance"] >= 1.0
    assert 0.0 < r["max_cell_share"] <= 1.0
    again = QUERIES["ann_ivf_balance"](spark, sf_smoke).collect()
    assert [tuple(x) for x in again] == [tuple(x) for x in rows]


def test_quality_model_degenerate_single_class_split(spark):
    """A train split whose teacher labels are all one class yields a
    length-1 RF probability vector; element_at(.., 2) would throw under
    ANSI mode without the size guard (ADVICE r6). All-short docs fail
    the Gopher n_tokens band, so every label is 0 and P(good) must
    equal the (all-zero) prediction."""
    from scikit_learn_imputer_spark.functions.quality_model import (
        quality_model_scores,
    )

    docs = spark.createDataFrame(
        [(i, "tiny doc only five words") for i in range(20)],
        "doc_id bigint, text string",
    )
    rows = quality_model_scores(docs).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["label"] == 0
        assert r["pred"] == 0
        assert r["p_good"] == 0.0


def test_bpe_budget_twins_keep_doc_membership(spark, sf_smoke):
    """The BPE budget twins must change token MASSES only: the holdout
    twin assigns every doc to the same (split, source) cell, and the
    mixture twin keeps weights identical (weights depend on sources,
    not the count unit)."""
    a = {
        (r["split"], r["source"]): r["n_docs"]
        for r in QUERIES["corpus_holdout_split"](spark, sf_smoke).collect()
    }
    b = {
        (r["split"], r["source"]): r["n_docs"]
        for r in QUERIES["corpus_holdout_split_bpe"](spark, sf_smoke).collect()
    }
    assert a == b

    wa = {
        r["source"]: r["weight"]
        for r in QUERIES["mixture_epoch_plan"](spark, sf_smoke).collect()
    }
    wb = {
        r["source"]: r["weight"]
        for r in QUERIES["mixture_epoch_plan_bpe"](spark, sf_smoke).collect()
    }
    assert wa == wb
    # and BPE masses are >= whitespace masses (1 token per word floor)
    na = {
        r["source"]: r["n_tokens"]
        for r in QUERIES["mixture_epoch_plan"](spark, sf_smoke).collect()
    }
    nb = {
        r["source"]: r["n_tokens"]
        for r in QUERIES["mixture_epoch_plan_bpe"](spark, sf_smoke).collect()
    }
    assert all(nb[s] >= na[s] for s in na)


def test_bpe_learned_vocab_roundtrip(spark):
    """Learn → derive vocab → count shares one artifact: the counting
    vocab equals the merge table's merged symbols, and the distributed
    count with it equals a sequential greedy reference word for word."""
    from scikit_learn_imputer_spark.functions.bpe import (
        bpe_token_counts,
        count_word_tokens,
        learn_bpe_merges,
        vocab_from_merges,
    )

    docs = spark.createDataFrame(
        [
            (0, "low lower lowest low low"),
            (1, "newer newest new low"),
            (2, "wider wide widest lower"),
        ],
        "doc_id bigint, text string",
    )
    merges = learn_bpe_merges(docs, num_merges=6)
    vocab = vocab_from_merges(merges)
    assert vocab == tuple(
        dict.fromkeys(
            r["merged"] for r in merges.orderBy("merge_rank").collect()
        )
    )
    assert 1 <= len(vocab) <= 6 and all(len(v) >= 2 for v in vocab)

    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, vocab=vocab).collect()
    }
    vs = frozenset(vocab)
    lens = tuple(sorted({len(v) for v in vocab}, reverse=True))
    for i, text in [(0, "low lower lowest low low"),
                    (1, "newer newest new low"),
                    (2, "wider wide widest lower")]:
        want = sum(count_word_tokens(w, vs, lens) for w in text.split())
        assert got[i] == want
        # learned subwords compress below pure char count, never below
        # one token per word
        assert len(text.split()) <= got[i] < len(text.replace(" ", ""))


def test_filter_waterfall_scrubbed_conserves_mass_and_stages(
    spark, sf_smoke, docs_total
):
    """Extended waterfall (VERDICT r7 #4): stage rows still partition
    the corpus docs; the kept-token-mass invariant extends across the
    scrub stage — scrubbed mass + sum(stage token masses) equals the
    ORIGINAL corpus token mass exactly."""
    rows = QUERIES["filter_waterfall_scrubbed"](spark, sf_smoke).collect()
    _, n_corpus = docs_total
    scrub = [r for r in rows if r["stage"] == "paragraph_scrub"]
    stages = [r for r in rows if r["stage"] != "paragraph_scrub"]
    assert len(scrub) == 1 and scrub[0]["stage_order"] == 0
    assert sum(r["n_docs"] for r in stages) == n_corpus
    want = {1: "lang", 2: "quality", 3: "gopher", 4: "lm_score",
            5: "exact_dup", 6: "decontam", 7: "kept"}
    assert all(want[r["stage_order"]] == r["stage"] for r in stages)

    d = load_table(spark, sf_smoke, "documents").filter(
        F.col("doc_id") % 100 >= 2
    )
    t = F.trim(F.col("text"))
    ntok = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    orig_mass = d.agg(F.sum(ntok)).collect()[0][0]
    assert scrub[0]["n_tokens"] + sum(r["n_tokens"] for r in stages) == orig_mass
    kept = [r for r in stages if r["stage"] == "kept"]
    assert kept and kept[0]["n_docs"] > 0
    # the model-score gate is a real stage on this corpus
    assert any(r["stage"] == "lm_score" and r["n_docs"] > 0 for r in stages)


def test_filter_waterfall_scrubbed_attributes_scrub_mass(spark):
    """On a corpus WITH duplicated paragraphs the scrub stage reports
    the removed mass, downstream stages see the scrubbed text, and the
    mass invariant holds (the synthetic driver corpus has no newlines,
    so this pins the non-degenerate path)."""
    import scikit_learn_imputer_spark.plans.queries as Q

    banner = "cookie banner accept all cookies now please"
    body_a = " ".join(f"alpha{i}" for i in range(40))
    body_b = " ".join(f"beta{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (102, "en", f"{banner}\n{body_a}", "a", 1),
            (103, "en", f"{banner}\n{body_b}", "a", 1),
            (104, "xx", "short non english text", "b", 1),
        ],
        "doc_id bigint, lang string, text string, source string, n_chars int",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(f"{tmp}/documents.parquet")
        rows = {r["stage"]: r for r in Q.QUERIES["filter_waterfall_scrubbed"](
            spark, tmp
        ).collect()}
    scrub = rows["paragraph_scrub"]
    assert scrub["n_docs"] == 2  # both banner carriers scrubbed
    assert scrub["n_tokens"] == 2 * len(banner.split())
    assert rows["lang"]["n_docs"] == 1  # doc 104
    total = sum(r["n_tokens"] for s, r in rows.items())
    orig = sum(len(t.split()) for t in [f"{banner}\n{body_a}",
                                        f"{banner}\n{body_b}",
                                        "short non english text"])
    assert total == orig


def test_filter_waterfall_exact_dup_stage_is_min_id_policy(spark):
    """Documented decision (VERDICT r7 #7): the waterfall's exact-dup
    stage keeps min-id — its drop count equals exact_dedup(keep='min')
    drops over the gate survivors on a corpus with real duplicates."""
    import tempfile

    import scikit_learn_imputer_spark.plans.queries as Q
    from scikit_learn_imputer_spark.dedup.exact import exact_dedup

    words = [
        "the", "quick", "brown", "fox", "jumps", "over", "a", "lazy",
        "dog", "while", "many", "other", "animals", "watch", "from",
        "the", "tall", "green", "grass", "beside", "a", "quiet", "river",
        "bank", "under", "bright", "morning", "sunlight", "and", "gentle",
        "breeze", "carrying", "distant", "sounds", "of", "village",
        "life", "toward", "them", "slowly",
    ]
    x = " ".join(words)
    y = " ".join(reversed(words))
    docs = spark.createDataFrame(
        [
            (1, "en", "benchmark holdout text nothing shared here at all", "b", 1),
            (110, "en", x, "a", 1),
            (111, "en", x, "a", 1),  # exact duplicate of 110
            (112, "en", y, "a", 1),
        ],
        "doc_id bigint, lang string, text string, source string, n_chars int",
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(f"{tmp}/documents.parquet")
        rows = {
            r["stage"]: r
            for r in Q.QUERIES["filter_waterfall"](spark, tmp).collect()
        }
    # all corpus docs pass the signal gates; only dedup drops
    for gate in ("lang", "quality", "gopher", "decontam"):
        assert gate not in rows, f"{gate} unexpectedly dropped docs: {rows}"
    assert rows["exact_dup"]["n_docs"] == 1
    assert rows["kept"]["n_docs"] == 2

    corpus = docs.filter(F.col("doc_id") >= 110)
    survivors = exact_dedup(corpus, keep="min")
    dropped = corpus.count() - survivors.count()
    assert rows["exact_dup"]["n_docs"] == dropped
    # and the min-id keeper is what survives
    assert {r["doc_id"] for r in survivors.collect()} == {110, 112}
