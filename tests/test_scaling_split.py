"""Scaling-law subset manifests and holdout-leakage audit semantics.

Value-vs-DuckDB checks live in test_oracle_parity.py; these pin the
operator INVARIANTS: subset nesting, full-fraction identity, grid
completeness, and leakage-rate bounds.
"""

from collections import defaultdict

from scikit_learn_imputer_spark.plans.queries import QUERIES
from scikit_learn_imputer_spark.sources.tables import load_table


def test_scaling_subsets_nested_and_complete(spark, sf_smoke):
    rows = QUERIES["scaling_law_subsets"](spark, sf_smoke).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    docs = load_table(spark, sf_smoke, "documents")
    n_sources = docs.select("source").distinct().count()
    # complete frac × source grid, zero rows included
    assert len(rows) == 4 * n_sources
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["frac"])
        assert [r["frac"] for r in rs] == [0.1, 0.25, 0.5, 1.0]
        # NESTED: monotone doc and token mass in the fraction
        for a, b in zip(rs, rs[1:]):
            assert a["n_docs"] <= b["n_docs"]
            assert a["n_tokens"] <= b["n_tokens"]
        # frac=1.0 is the whole source, so token_frac is exactly 1
        assert rs[-1]["token_frac"] == 1.0 or rs[-1]["n_tokens"] == 0
    # frac=1.0 doc counts reconcile with the raw table
    raw = {
        r["source"]: r["cnt"]
        for r in docs.groupBy("source").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    for src, rs in by_src.items():
        assert max(r["n_docs"] for r in rs) == raw[src]


def test_split_leakage_bounds_and_splits(spark, sf_smoke):
    rows = QUERIES["split_leakage_audit"](spark, sf_smoke).collect()
    got = {r["split"]: r for r in rows}
    assert set(got) <= {"val", "test"}
    for r in rows:
        assert 0 <= r["n_leaked"] <= r["n_docs"]
        assert abs(r["leak_rate"] - round(r["n_leaked"] / r["n_docs"], 6)) < 1e-9


def test_doremi_epoch_plan_invariants(spark, sf_smoke):
    rows = QUERIES["doremi_epoch_plan"](spark, sf_smoke).collect()
    assert rows
    # weights renormalize to 1 over the planned sources
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r["capped_epochs"] <= 4.0
        assert r["capped_epochs"] <= r["epochs"] + 1e-9
        assert r["achieved_tokens"] <= r["target_tokens"] or (
            r["epochs"] <= 4.0
        )
    # constant-budget plan: total target mass == corpus mass
    assert abs(
        sum(r["target_tokens"] for r in rows)
        - sum(r["n_tokens"] for r in rows)
    ) <= len(rows)  # per-source rounding slack


def test_dedup_method_agreement_counts_consistent(spark, sf_smoke):
    r = QUERIES["dedup_method_agreement"](spark, sf_smoke).collect()[0]
    assert r["n_both"] <= min(r["n_lexical"], r["n_semantic"])
    assert r["n_lexical_only"] == r["n_lexical"] - r["n_both"]
    assert r["n_semantic_only"] == r["n_semantic"] - r["n_both"]
    union = r["n_lexical"] + r["n_semantic"] - r["n_both"]
    if union:
        assert abs(r["pair_jaccard"] - round(r["n_both"] / union, 6)) < 1e-9
    else:
        assert r["pair_jaccard"] is None


def test_heavy_hitter_grams_ranked_and_bounded(spark, sf_smoke):
    rows = QUERIES["heavy_hitter_grams"](spark, sf_smoke).collect()
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        # counts non-increasing down the ranks; shares in (0, 1]
        for a, b in zip(rs, rs[1:]):
            assert a["n"] >= b["n"]
        assert sum(r["share"] for r in rs) <= 1.0 + 1e-9


def test_eval_set_manifest_stratified_and_leak_free(spark, sf_smoke):
    rows = QUERIES["eval_set_manifest"](spark, sf_smoke).collect()
    assert rows  # heldout pool is thin at smoke SF but never empty
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["rank"])
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # every picked doc is heldout and unleaked: cross-check against the
    # leakage audit's own pool arithmetic
    audit = {
        r["split"]: r
        for r in QUERIES["split_leakage_audit"](spark, sf_smoke).collect()
    }
    clean_pool = sum(r["n_docs"] - r["n_leaked"] for r in audit.values())
    assert len(rows) <= clean_pool


def test_quality_signal_corr_bounded(spark, sf_smoke):
    r = QUERIES["quality_signal_corr"](spark, sf_smoke).collect()[0]
    for k, v in r.asDict().items():
        assert v is not None and -1.0 <= v <= 1.0, (k, v)


def test_mixture_interleave_order_and_rates(spark, sf_smoke):
    rows = QUERIES["mixture_interleave"](spark, sf_smoke).collect()
    assert rows
    assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
    # virtual time nondecreasing down the schedule
    for a, b in zip(rows, rows[1:]):
        assert a["vtime"] <= b["vtime"] + 1e-12
    # stride property while no source is exhausted: in the prefix up to
    # virtual time T, each source contributes ~T * weight docs (±1)
    import collections

    docs = load_table(spark, sf_smoke, "documents")
    per_src = {
        r["source"]: r["cnt"]
        for r in docs.groupBy("source").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    weights = {s: int(s[3:]) + 1 for s in per_src}
    seen = collections.Counter()
    for r in rows:
        seen[r["source"]] += 1
        t = r["vtime"]
        for s, w in weights.items():
            if seen[s] < per_src[s]:  # source not exhausted yet
                assert abs(seen[s] - t * w) <= 1.0 + 1e-6, (s, seen[s], t)


def test_training_epoch_ledger_structure(spark, sf_smoke):
    rows = QUERIES["training_epoch_ledger"](spark, sf_smoke).collect()
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["epoch"])
        # contiguous epochs, at most one trailing partial
        assert [r["epoch"] for r in rs] == list(range(1, len(rs) + 1))
        kinds = [r["kind"] for r in rs]
        assert all(k == "full" for k in kinds[:-1])
        assert kinds[-1] in ("full", "partial")
        # a partial epoch is a strict subset of the source
        fulls = [r for r in rs if r["kind"] == "full"]
        if fulls and kinds[-1] == "partial":
            assert rs[-1]["planned_tokens"] <= fulls[0]["planned_tokens"]
            assert rs[-1]["n_docs"] <= fulls[0]["n_docs"]
        # epoch cap: never more than 4 full epochs + 1 partial
        assert len(fulls) <= 4


def test_training_epoch_ledger_budget_conserved(spark, sf_smoke):
    """Exact structural bound against mixture_epoch_plan: the ledger's
    per-source total is full_epochs × source mass plus a partial-epoch
    mass in [0, source mass] — doc-level threshold sampling means the
    partial mass is NOT frac × total (tiny smoke-SF strata deviate by
    whole documents), but it can never escape the epoch bracket."""
    ledger = QUERIES["training_epoch_ledger"](spark, sf_smoke).collect()
    plan = {
        r["source"]: r
        for r in QUERIES["mixture_epoch_plan"](spark, sf_smoke).collect()
    }
    got = defaultdict(int)
    for r in ledger:
        got[r["source"]] += r["planned_tokens"]
    import math

    for src, p in plan.items():
        full_e = math.floor(p["capped_epochs"])
        lo = full_e * p["n_tokens"]
        hi = lo + (p["n_tokens"] if p["capped_epochs"] > full_e else 0)
        assert lo <= got[src] <= hi, (src, got[src], lo, hi)


def test_decontam_method_agreement_consistent(spark, sf_smoke):
    r = QUERIES["decontam_method_agreement"](spark, sf_smoke).collect()[0]
    assert r["n_both"] <= min(r["n_dropped_word"], r["n_dropped_token"])
    assert r["n_word_only"] == r["n_dropped_word"] - r["n_both"]
    assert r["n_token_only"] == r["n_dropped_token"] - r["n_both"]
    assert r["n_dropped_word"] <= r["n_corpus"]
    assert r["n_dropped_token"] <= r["n_corpus"]


def test_near_dup_containment_semantics(spark):
    """Golden: a short doc fully embedded in a long one has Jaccard ~ 0
    but containment 1.0 — plus bound/tie-break invariants."""
    from scikit_learn_imputer_spark.dedup.ngram import (
        ngram_containment_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, short),
            (2, filler + " " + short + " " + filler),
            (3, "totally different words entirely here now"),
        ],
        "doc_id bigint, text string",
    )
    rows = ngram_containment_pairs(docs, n=5, threshold=0.9).collect()
    got = {(r["contained_id"], r["container_id"]): r for r in rows}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["containment"] == 1.0
    assert r["n_contained"] <= r["n_container"]
    assert not any(k for k in got if 3 in k)


def test_vocab_drift_invariants(spark, sf_smoke):
    r = QUERIES["vocab_drift"](spark, sf_smoke).collect()[0]
    assert r["n_shared"] <= min(r["n_merges_early"], r["n_merges_full"])
    assert 1 <= r["first_divergence"] <= 9
    if r["first_divergence"] == 9:
        # identical ordered tables through k=8 implies identical sets
        assert r["n_shared"] == r["n_merges_early"] == r["n_merges_full"]


def test_vocab_drift_identical_corpus_no_drift(spark):
    """Early == full corpus (all doc_id even) -> zero drift."""
    from scikit_learn_imputer_spark.plans.queries import QUERIES as Q
    import os, tempfile, shutil

    docs = spark.createDataFrame(
        [(2 * i, f"aa bb aa bb cc dd w{i % 3}") for i in range(12)],
        "doc_id bigint, text string",
    )
    tmp = tempfile.mkdtemp()
    try:
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        r = Q["vocab_drift"](spark, tmp).collect()[0]
        assert r["first_divergence"] == 9
        assert r["merge_jaccard"] == 1.0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_gram_df_spectrum_reconciles(spark, sf_smoke):
    rows = QUERIES["gram_df_spectrum"](spark, sf_smoke).collect()
    assert rows
    from scikit_learn_imputer_spark.dedup.ngram import char_ngrams

    docs = load_table(spark, sf_smoke, "documents")
    n_distinct = char_ngrams(docs, 3).select("gram").distinct().count()
    assert sum(r["n_grams"] for r in rows) == n_distinct
    assert abs(sum(r["pair_work_share"] for r in rows) - 1.0) < 1e-5
    for r in rows:
        # df_lo is the bucket's true lower bound: 2^bucket
        assert r["df_lo"] == 2 ** r["bucket"]
        assert r["pair_work"] >= 0


def test_containment_survivors_drop_exactly_contained(spark, sf_smoke):
    pairs = QUERIES["near_dup_containment"](spark, sf_smoke).collect()
    dropped = {r["contained_id"] for r in pairs}
    surv = {
        r["doc_id"]
        for r in QUERIES["containment_survivors"](spark, sf_smoke).collect()
    }
    total = load_table(spark, sf_smoke, "documents").count()
    assert surv.isdisjoint(dropped)
    assert len(surv) == total - len(dropped)


def test_store_purge_allows_resubmission(spark, sf_smoke, tmp_path):
    """THE functional point of takedown propagation into dedup history:
    after the purge, a deleted doc re-submits successfully; before the
    purge its own ghost fingerprint rejects it."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
        delete_from_fingerprint_store,
        incremental_dedup,
    )

    docs = load_table(spark, sf_smoke, "documents")
    victim = docs.orderBy("doc_id").limit(1)
    retained = docs.join(
        victim.select("doc_id"), on="doc_id", how="left_anti"
    )
    store = str(tmp_path / "fp")
    build_fingerprint_store(docs, store)
    # ghost rejects the re-submission
    assert incremental_dedup(victim, store).count() == 0
    delete_from_fingerprint_store(spark, store, victim, retained)
    # purged: the same content is accepted again
    assert incremental_dedup(victim, store).count() == 1


def test_store_purge_keeps_shared_content_fingerprint(spark, tmp_path):
    """A fingerprint held by BOTH a deleted and a retained doc must
    survive the purge (live content keeps its dedup protection)."""
    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
        delete_from_fingerprint_store,
        incremental_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "shared text body"), (2, "shared text body"), (3, "other")],
        "doc_id bigint, text string",
    )
    deleted = docs.filter("doc_id = 1")
    retained = docs.filter("doc_id != 1")
    store = str(tmp_path / "fp")
    build_fingerprint_store(docs, store)
    delete_from_fingerprint_store(spark, store, deleted, retained)
    # doc 2 still holds the content: a NEW duplicate must stay rejected
    dup = spark.createDataFrame(
        [(9, "shared text body")], "doc_id bigint, text string"
    )
    assert incremental_dedup(dup, store).count() == 0
    # genuinely-deleted content is gone
    assert spark.read.parquet(store).count() == 2


def test_stratified_quality_sample_decile_and_keep_contract(spark, sf_smoke):
    """Round-10 sampler: per-source deciles are balanced, the keep
    decision is exactly u(md5) < decile^2/100 per row, and the result is
    partitioning-independent."""
    import hashlib

    from scikit_learn_imputer_spark.operators.split import (
        stratified_quality_sample,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    out = stratified_quality_sample(docs).collect()
    assert len(out) == docs.count()
    per = {}
    for r in out:
        assert 1 <= r["decile"] <= 10
        u = int(
            hashlib.md5(f"strat:{r['doc_id']}".encode()).hexdigest()[:8], 16
        ) / 4294967296.0
        assert r["kept"] == (u < r["decile"] ** 2 / 100.0)
        per.setdefault((r["source"], r["decile"]), 0)
        per[(r["source"], r["decile"])] += 1
    # decile balance: within each source, decile occupancy is near-even
    # (exact lower-rank thresholds split +-1 around n/10; ties and the
    # +-1 index rounding skew a bit more at sf0.001's ~20-doc sources)
    srcs = {s for s, _ in per}
    for s in srcs:
        sizes = [per.get((s, d), 0) for d in range(1, 11)]
        assert all(v > 0 for v in sizes)
        assert max(sizes) <= 3 * min(sizes) + 2
    # partitioning independence
    again = {
        r["doc_id"]: (r["decile"], r["kept"])
        for r in stratified_quality_sample(docs.repartition(16)).collect()
    }
    assert again == {r["doc_id"]: (r["decile"], r["kept"]) for r in out}


def test_training_loader_funnel_stage_consistency(spark, sf_smoke):
    """Round-10 funnel capstone: stages shrink monotonically and the
    sequence/shard/worker units follow exactly from the mixture row's
    token mass (concat-and-cut closed form)."""
    from scikit_learn_imputer_spark.plans.queries import QUERIES

    rows = {
        r["stage"]: (r["stage_order"], r["n_docs"], r["n_tokens"], r["n_units"])
        for r in QUERIES["training_loader_funnel"](spark, sf_smoke).collect()
    }
    assert set(rows) == {
        "corpus", "stratified", "decontaminated", "mixture", "sequences",
        "shards", "workers",
    }
    c, s, m = rows["corpus"], rows["stratified"], rows["mixture"]
    d = rows["decontaminated"]
    assert c[1] >= s[1] >= d[1] >= m[1] > 0
    assert c[2] >= s[2] >= d[2] >= m[2] > 0
    # the decontam gate actually removes eval-contamination mass
    # (benchmark members sampled into the stratified set drop here)
    assert d[1] < s[1]
    nt = m[2]
    n_seqs = (nt - 1) // 512 + 1
    n_shards = (n_seqs - 1) // 16 + 1
    assert rows["sequences"][3] == n_seqs
    assert rows["shards"][3] == n_shards
    assert rows["workers"][3] == min(4, n_shards)
    # the stratified stage actually filters (keep rates < 1 for low
    # deciles) and the mixture stage actually filters further
    assert s[1] < c[1] and m[1] < d[1]


def test_funnel_budget_sweep_monotone_in_budget(spark, sf_smoke):
    """Round-10 sweep: budget-independent stages repeat identically per
    branch; the mixture stage grows monotonically with budget and the
    downstream unit counts follow the closed form."""
    from scikit_learn_imputer_spark.plans.queries import QUERIES

    rows = {
        (r["budget"], r["stage"]): (r["n_docs"], r["n_tokens"], r["n_units"])
        for r in QUERIES["funnel_budget_sweep"](spark, sf_smoke).collect()
    }
    budgets = (2000, 5000, 20000)
    assert len(rows) == 21
    for stage in ("corpus", "stratified", "decontaminated"):
        vals = {rows[(b, stage)] for b in budgets}
        assert len(vals) == 1  # budget-independent anchors
    mix = [rows[(b, "mixture")] for b in budgets]
    assert mix[0][0] <= mix[1][0] <= mix[2][0]
    assert mix[0][1] <= mix[1][1] <= mix[2][1]
    assert mix[0][1] < mix[2][1]  # the sweep actually moves
    for b in budgets:
        nt = rows[(b, "mixture")][1]
        n_seqs = (nt - 1) // 512 + 1 if nt else 0
        assert rows[(b, "sequences")][2] == n_seqs
        assert rows[(b, "shards")][2] == ((n_seqs - 1) // 16 + 1 if n_seqs else 0)
