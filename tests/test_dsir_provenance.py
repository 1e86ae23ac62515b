"""DSIR importance weighting (functions/dsir.py) and inverse token
provenance (operators/tokenized.py:token_position_lookup).

The value-vs-DuckDB checks live in test_oracle_parity.py; these tests
pin the operator SEMANTICS: target-domain uplift, resampling
determinism and bias, and the position-interval algebra of the lookup
against a brute-force reference.
"""

import math

import pytest
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.functions.dsir import (
    dsir_scores,
    gram_bucket_col,
    gumbel_topk,
)
from scikit_learn_imputer_spark.operators.tokenized import (
    token_position_lookup,
)

# Two clearly separated vocabularies: the "wiki" slice is the target
# domain, the "web" slice is off-domain, "mix" straddles.
DOCS = [
    (1, "wiki", "solar orbit planet astronomy telescope orbit planet"),
    (2, "wiki", "planet orbit solar telescope astronomy solar"),
    (3, "wiki", "astronomy telescope planet solar orbit"),
    (4, "web", "click buy cheap deal offer subscribe click buy"),
    (5, "web", "deal offer cheap subscribe buy click deal"),
    (6, "web", "subscribe offer click cheap buy deal"),
    (7, "mix", "planet deal orbit buy solar click"),
    (8, "mix", ""),
    (9, "mix", "   "),
]
SCHEMA = "doc_id bigint, source string, text string"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def test_dsir_target_domain_scores_highest(spark, docs):
    scored = dsir_scores(
        docs, target=F.col("source") == "wiki", n_buckets=64
    )
    rows = {r["doc_id"]: r for r in scored.collect()}
    # Blank docs have no grams and drop out.
    assert set(rows) == {1, 2, 3, 4, 5, 6, 7}
    wiki = [rows[i]["score"] for i in (1, 2, 3)]
    web = [rows[i]["score"] for i in (4, 5, 6)]
    mixed = rows[7]["score"]
    assert min(wiki) > mixed > max(web)
    # Scores are micro-snapped: score * 1e6 is integral on both engines.
    for r in rows.values():
        assert abs(r["score"] * 1e6 - round(r["score"] * 1e6)) < 1e-6
        assert r["n_grams"] > 0


def test_dsir_score_is_mean_bucket_log_ratio(spark, docs):
    """Hand-check one document against the published formula:
    score = mean over gram occurrences of ln(p_target / p_raw) with
    +1/(N+B) Laplace smoothing, micro-snapped."""
    B = 64
    occ = [
        (d, s, t)
        for d, s, txt in DOCS
        if txt.strip()
        for t in txt.strip().lower().split()
    ]
    bucket_df = spark.createDataFrame(
        [(g,) for g in sorted({t for _, _, t in occ})], "g string"
    ).select("g", gram_bucket_col(F.col("g"), B).alias("b"))
    b_of = {r["g"]: r["b"] for r in bucket_df.collect()}
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for _, s, t in occ:
        raw[b_of[t]] = raw.get(b_of[t], 0) + 1
        if s == "wiki":
            tgt[b_of[t]] = tgt.get(b_of[t], 0) + 1
    n_r, n_t = len(occ), sum(tgt.values())
    m = {
        b: round(
            math.log(
                ((tgt.get(b, 0) + 1) / (n_t + B))
                / ((raw[b] + 1) / (n_r + B))
            )
            * 1e6
        )
        for b in raw
    }
    grams_1 = [t for d, _, t in occ if d == 1]
    expect = round(sum(m[b_of[t]] for t in grams_1) / len(grams_1)) / 1e6
    got = (
        dsir_scores(docs, target=F.col("source") == "wiki", n_buckets=B)
        .filter(F.col("doc_id") == 1)
        .collect()[0]["score"]
    )
    assert got == pytest.approx(expect, abs=1e-9)


def test_gumbel_topk_deterministic_and_biased(spark, docs):
    scored = dsir_scores(
        docs, target=F.col("source") == "wiki", n_buckets=64
    )
    a = gumbel_topk(scored, k=4).collect()
    b = gumbel_topk(scored, k=4).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 4
    # Keys are returned in descending order and carry the score shift.
    keys = [r["sample_key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    # A different seed reshuffles the Gumbel noise (decoupled draws).
    c = gumbel_topk(scored, k=4, seed="other").collect()
    assert {r["doc_id"] for r in c} != set() # smoke: runs
    # Selection is biased toward the target domain: with a wide score
    # gap, all three wiki docs make a k=4 cut.
    assert {1, 2, 3} <= {r["doc_id"] for r in a}


def test_gram_bucket_range(spark):
    df = spark.createDataFrame(
        [(w,) for w in ["a", "b", "zz", "token", "café", "123"]], "g string"
    )
    rows = df.select(gram_bucket_col(F.col("g"), 16).alias("b")).collect()
    assert all(0 <= r["b"] < 16 for r in rows)


# --- token_position_lookup ------------------------------------------------


def _brute_force(counts, stride, seq_len):
    """Enumerate every stride multiple over each shard's concatenated
    token stream and resolve it to (doc, offsets) directly."""
    out = []
    by_shard: dict[str, list] = {}
    for doc_id, shard, n in counts:
        by_shard.setdefault(shard, []).append((doc_id, n))
    for shard, docs_ in by_shard.items():
        cum = 0
        for doc_id, n in sorted(docs_):
            for p in range(cum, cum + n):
                if p % stride == 0:
                    out.append(
                        (
                            shard,
                            p,
                            p // seq_len,
                            doc_id,
                            p - cum,
                            p % seq_len,
                        )
                    )
            cum += n
    return sorted(out)


def test_token_position_lookup_matches_brute_force(spark, docs):
    from scikit_learn_imputer_spark.functions.bpe import (
        DEFAULT_BPE_VOCAB,
        with_bpe_token_counts,
    )

    counts = [
        (r["doc_id"], r["source"], r["n_bpe_tokens"])
        for r in with_bpe_token_counts(
            docs, DEFAULT_BPE_VOCAB, "text"
        ).collect()
    ]
    for stride, seq_len in [(1, 4), (3, 4), (5, 8), (1000, 512)]:
        got = sorted(
            tuple(r)
            for r in token_position_lookup(
                docs, seq_len=seq_len, stride=stride
            ).collect()
        )
        assert got == _brute_force(counts, stride, seq_len), (
            f"stride={stride} seq_len={seq_len}"
        )


def test_token_position_lookup_counts_per_shard(spark, docs):
    """ceil(total/stride) positions per shard — the stride grid covers
    [0, total) exactly once."""
    from scikit_learn_imputer_spark.functions.bpe import (
        DEFAULT_BPE_VOCAB,
        with_bpe_token_counts,
    )

    totals: dict[str, int] = {}
    for r in with_bpe_token_counts(docs, DEFAULT_BPE_VOCAB, "text").collect():
        totals[r["source"]] = totals.get(r["source"], 0) + r["n_bpe_tokens"]
    stride = 7
    got = (
        token_position_lookup(docs, seq_len=16, stride=stride)
        .groupBy("source")
        .count()
        .collect()
    )
    expect = {
        s: -(-t // stride) for s, t in totals.items() if t > 0
    }
    assert {r["source"]: r["count"] for r in got} == expect


def test_token_position_lookup_validation(spark, docs):
    with pytest.raises(ValueError):
        token_position_lookup(docs, seq_len=0)
    with pytest.raises(ValueError):
        token_position_lookup(docs, stride=0)


def test_embedding_target_select(spark):
    import random

    from scikit_learn_imputer_spark.functions.dsir import (
        embedding_target_select,
    )

    rng = random.Random(7)
    rows = []
    # Cluster A around (1, 0, 0, ...), cluster B around (0, 1, 0, ...).
    for i in range(30):
        a = i < 15
        base = [1.0, 0.0] if a else [0.0, 1.0]
        vec = [
            base[0] + rng.uniform(-0.05, 0.05),
            base[1] + rng.uniform(-0.05, 0.05),
        ] + [rng.uniform(-0.05, 0.05) for _ in range(6)]
        rows.append((i, vec, 0 if a else 1))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    got = embedding_target_select(
        emb, target=F.col("label") == 0, k=15
    ).collect()
    # The 15 closest to the label-0 centroid ARE the label-0 cluster.
    assert sorted(r["vec_id"] for r in got) == list(range(15))
    assert all(r["cosine"] > 0.9 for r in got)
    # Deterministic across runs.
    again = embedding_target_select(emb, target=F.col("label") == 0, k=15)
    assert sorted(r["vec_id"] for r in again.collect()) == list(range(15))
    with pytest.raises(ValueError, match="target slice is empty"):
        embedding_target_select(emb, target=F.col("label") == 99, k=5)


def test_sequence_quality_weights_brute_force(spark, docs):
    from scikit_learn_imputer_spark.functions.bpe import (
        DEFAULT_BPE_VOCAB,
        with_bpe_token_counts,
    )
    from scikit_learn_imputer_spark.functions.text import quality_features
    from scikit_learn_imputer_spark.operators.tokenized import (
        sequence_quality_weights,
    )

    seq_len = 8
    feats = quality_features(
        with_bpe_token_counts(docs, DEFAULT_BPE_VOCAB, "text")
    ).collect()
    per_doc = {
        r["doc_id"]: (
            r["source"],
            r["n_bpe_tokens"],
            round(round(r["q_score"], 6) * 1e6),
        )
        for r in feats
    }
    # Brute-force: walk each shard's token stream, accumulate L*qm per seq.
    acc: dict = {}
    shards: dict = {}
    for d, (s, n, qm) in sorted(per_doc.items()):
        shards.setdefault(s, []).append((d, n, qm))
    for s, ds in shards.items():
        cum = 0
        for d, n, qm in ds:
            for p in range(cum, cum + n):
                key = (s, p // seq_len)
                a = acc.setdefault(key, [0, 0, set()])
                a[0] += 1
                a[1] += qm
                a[2].add(d)
            cum += n
    expect = {
        k: (len(v[2]), v[0], round(v[1] / v[0] / 1e6, 6))
        for k, v in acc.items()
    }
    got = {
        (r["source"], r["seq_id"]): (
            r["n_docs"],
            r["n_tokens"],
            r["weight"],
        )
        for r in sequence_quality_weights(docs, seq_len=seq_len).collect()
    }
    assert set(got) == set(expect)
    for k, (nd, nt, w) in expect.items():
        gd, gt, gw = got[k]
        assert (gd, gt) == (nd, nt), k
        # Engines round HALF_UP, Python rounds half-even: an exact
        # .5-micro boundary can land one full micro apart.
        assert abs(gw - w) <= 1.1e-6, k


def test_lsh_bucket_stats_invariants(spark, docs):
    from scikit_learn_imputer_spark.dedup.minhash import (
        band_buckets,
        lsh_bucket_stats,
        minhash_signatures,
    )

    K, bands = 8, 2
    stats = {
        r["band"]: r
        for r in lsh_bucket_stats(
            docs, num_hashes=K, bands=bands, shingle=3, hasher="md5"
        ).collect()
    }
    assert set(stats) == {0, 1}
    # Brute-force bucket sizes from the same banding primitive.
    sigs = minhash_signatures(docs, K, 3, hasher="md5")
    bb = band_buckets(sigs, K, bands).collect()
    sizes: dict = {}
    for r in bb:
        sizes.setdefault((r["band"], r["bucket"]), 0)
        sizes[(r["band"], r["bucket"])] += 1
    for b in (0, 1):
        ss = sorted(v for (bd, _), v in sizes.items() if bd == b)
        st = stats[b]
        assert st["n_buckets"] == len(ss)
        assert st["n_docs"] == sum(ss)
        assert st["max_bucket"] == max(ss)
        assert st["pairs_work"] == sum(s * (s - 1) // 2 for s in ss)
        # No bucket exceeds the threshold here -> fanout is bucket count.
        if st["heavy_buckets"] == 0:
            assert st["salt_fanout"] == st["n_buckets"]


def test_dsir_selection_drift_sums(spark, docs):
    """Shares sum to 1 on both axes, so drifts sum to ~0; the target
    domain drifts positive."""
    from scikit_learn_imputer_spark.plans.queries import QUERIES

    rows = QUERIES["dsir_selection_drift"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert sum(r["n_selected"] for r in rows) == 100
    assert abs(sum(r["drift"] for r in rows)) < 1e-4
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-4
    assert all(0 <= r["sel_share"] <= 1 for r in rows)
    # NOTE: on this synthetic corpus the sources are i.i.d. over a shared
    # vocabulary, so there is no domain signal and the drift is honest
    # sampling noise; the target-uplift behavior when signal EXISTS is
    # pinned by test_gumbel_topk_deterministic_and_biased above.


def test_dsir_dist_round_trip_and_validation(spark, docs, tmp_path):
    from scikit_learn_imputer_spark.functions.dsir import (
        dsir_dist,
        dsir_scores,
        dsir_scores_with_dist,
        load_dsir_dist,
        save_dsir_dist,
    )

    B = 32
    dist = dsir_dist(docs, target=F.col("source") == "wiki", n_buckets=B)
    rows = dist.collect()
    # Complete spine: one row per bucket, even for buckets unseen in
    # the fit corpus.
    assert len(rows) == B
    assert sorted(r["bucket"] for r in rows) == list(range(B))
    path = str(tmp_path / "dist")
    save_dsir_dist(dist, path)
    loaded = load_dsir_dist(spark, path)
    # Scoring from the store == scoring inline.
    direct = {
        (r["doc_id"], r["score"])
        for r in dsir_scores(
            docs, target=F.col("source") == "wiki", n_buckets=B
        ).collect()
    }
    stored = {
        (r["doc_id"], r["score"])
        for r in dsir_scores_with_dist(docs, loaded).collect()
    }
    assert direct == stored
    # A truncated store must fail loudly, not score silently wrong.
    bad = str(tmp_path / "bad")
    dist.filter(F.col("bucket") != 3).coalesce(1).write.parquet(bad)
    with pytest.raises(ValueError, match="corrupt"):
        load_dsir_dist(spark, bad)


def test_dsir_dist_scores_unseen_grams(spark, docs):
    """A dist fitted on one corpus scores a DIFFERENT corpus whose grams
    never appeared at fit time — unseen buckets carry the smoothed
    zero-count ratio instead of dropping the gram."""
    from scikit_learn_imputer_spark.functions.dsir import (
        dsir_dist,
        dsir_scores_with_dist,
    )

    dist = dsir_dist(docs, target=F.col("source") == "wiki", n_buckets=32)
    other = spark.createDataFrame(
        [(100, "new", "zzzz qqqq xxxx wwww vvvv")], SCHEMA
    )
    got = dsir_scores_with_dist(other, dist).collect()
    assert len(got) == 1
    assert got[0]["n_grams"] == 5  # nothing dropped


def test_stream_dsir_scores_match_batch(spark, docs, tmp_path):
    """Multi-micro-batch streaming scoring == inline batch scoring
    (stateless map-only per batch, so arrival order is irrelevant)."""
    from scikit_learn_imputer_spark.functions.dsir import (
        dsir_dist,
        dsir_scores,
        save_dsir_dist,
        stream_dsir_score_ingest,
    )

    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    dist_path = str(tmp_path / "dist")
    save_dsir_dist(
        dsir_dist(docs, target=F.col("source") == "wiki", n_buckets=32),
        dist_path,
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(*docs.columns)
    )
    out = str(tmp_path / "scores")
    q = stream_dsir_score_ingest(
        stream, dist_path, out, str(tmp_path / "ck")
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["doc_id"], r["n_grams"], r["score"])
        for r in spark.read.parquet(out).collect()
    }
    expect = {
        (r["doc_id"], r["n_grams"], r["score"])
        for r in dsir_scores(
            docs, target=F.col("source") == "wiki", n_buckets=32
        ).collect()
    }
    assert got == expect


class TestDoremiDomainWeights:
    """doremi_domain_weights: one EG step from the bigram-mass baseline
    — the semantics, not the DuckDB values (test_oracle_parity.py)."""

    @pytest.fixture(scope="class")
    def weights(self, spark):
        from scikit_learn_imputer_spark.functions.dsir import (
            doremi_domain_weights,
        )

        docs = spark.createDataFrame(DOCS, SCHEMA)
        rows = doremi_domain_weights(docs).collect()
        return {r["source"]: r for r in rows}

    def test_weights_normalized_and_positive(self, weights):
        assert weights  # empty/whitespace docs drop, sources remain
        total = sum(r["weight"] for r in weights.values())
        assert total == pytest.approx(1.0, abs=2e-6)
        assert all(r["weight"] > 0 for r in weights.values())

    def test_excess_nonnegative_and_not_all_boosted(self, weights):
        ex = {s: r["excess_nll"] for s, r in weights.items()}
        assert all(v >= 0 for v in ex.values())
        # the corpus mean sits inside the per-domain spread: at least
        # one domain is at-or-below average (excess clamps to 0)
        assert min(ex.values()) == 0

    def test_boost_ratio_monotone_in_excess(self, weights):
        # the EG step's guarantee is RELATIVE: weight/share (the boost
        # each domain gets from the baseline mixture, up to the common
        # normalizer) is strictly increasing in excess loss, and a
        # zero-excess domain never out-boosts one with excess
        by_excess = sorted(
            weights.values(), key=lambda r: r["excess_nll"]
        )
        ratios = [r["weight"] / r["bigram_share"] for r in by_excess]
        assert ratios == sorted(ratios)
        assert by_excess[0]["excess_nll"] == 0
        assert ratios[-1] > ratios[0]

    def test_eta_zero_recovers_baseline_shares(self, spark):
        from scikit_learn_imputer_spark.functions.dsir import (
            doremi_domain_weights,
        )

        docs = spark.createDataFrame(DOCS, SCHEMA)
        for r in doremi_domain_weights(docs, eta=0.0).collect():
            assert r["weight"] == pytest.approx(
                r["bigram_share"], abs=2e-6
            )

    def test_empty_docs_excluded_from_mass(self, weights):
        # the LM is CHAR-level (no trim, same as the bigram_lm_quality
        # oracle): doc 9 ("   ") yields space-bigrams and stays; only
        # doc 8 ("", zero chars) produces no bigrams and drops
        assert weights["mix"]["n_docs"] == 2
