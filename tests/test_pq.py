"""Product-quantization ANN (similarity/pq.py): codebook/encode shapes,
ADC recall floor, and the shortlist+re-rank production path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.similarity.knn import cosine_topk
from scikit_learn_imputer_spark.similarity.pq import (
    _subspaces,
    encode_pq,
    pq_topk,
    pq_topk_rerank,
    train_pq,
)


def test_subspaces_validate():
    assert _subspaces(64, 8) == [(i * 8, (i + 1) * 8) for i in range(8)]
    with pytest.raises(ValueError):
        _subspaces(64, 7)


@pytest.fixture(scope="module")
def pq_fixture(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = train_pq(emb, dim=64, m=8, k=64, max_iter=10)
    enc = encode_pq(emb, cb).persist()
    enc.count()
    return emb, cb, enc


def test_pq_codebook_and_codes_shapes(spark, pq_fixture):
    emb, cb, enc = pq_fixture
    assert len(cb) == 8 and all(len(sub) == 64 for sub in cb)
    assert all(len(c) == 8 for sub in cb for c in sub)
    rows = enc.collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r["pq_codes"]) == 8
        assert all(0 <= c < 64 for c in r["pq_codes"])


def test_pq_adc_scores_exact_when_reconstruction_lossless(spark):
    """When every corpus subvector IS a codebook centroid, ADC inner
    products equal exact inner products, so PQ ranking == brute force.
    Codebook passed directly (no KMeans) to isolate the scoring path."""
    rng = np.random.RandomState(7)
    m, k_cb, w = 4, 8, 4  # dim 16
    cb = rng.randn(m, k_cb, w).round(3)
    rows = []
    for i in range(40):
        picks = rng.randint(0, k_cb, size=m)
        vec = np.concatenate([cb[j, picks[j]] for j in range(m)])
        rows.append((i, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    enc = encode_pq(df, cb.tolist())
    queries = df.filter(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in pq_topk(enc, queries, cb.tolist(), k=5).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(df, queries, k=5).collect()
    }
    # cosine and unit-query IP rank identically only when corpus norms
    # are equal; compare against exact IP ranking computed locally.
    X = np.asarray([r[1] for r in rows])
    ids = np.asarray([r[0] for r in rows])
    for qid in range(3):
        q = X[qid] / np.linalg.norm(X[qid])
        s = X @ q
        mask = ids != qid
        order = sorted(zip(-s[mask], ids[mask]))
        expect = [int(i) for _, i in order[:5]]
        gotq = [got[(qid, r)] for r in range(1, 6)]
        assert gotq == expect, f"query {qid}: {gotq} != {expect}"
    assert len(want) == 15  # sanity: exact baseline produced full top-5


def test_pq_rerank_recall_floor_and_improvement(spark, pq_fixture):
    """Seeded KMeans + fixed data → deterministic recalls. Re-ranked
    recall must clear 0.8 and never fall below raw ADC recall."""
    emb, cb, enc = pq_fixture
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(enc, queries, cb, k=10).collect()
    }
    rer = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk_rerank(enc, emb, queries, cb, k=10, shortlist=50).collect()
    }
    r_adc = len(adc & exact) / len(exact)
    r_rer = len(rer & exact) / len(exact)
    assert r_rer >= 0.8, f"re-ranked recall {r_rer}"
    assert r_rer >= r_adc, f"re-rank made recall worse: {r_rer} < {r_adc}"


def test_pq_train_guards(spark):
    """Oversized training sets must be rejected with guidance (the
    guarded-collect contract), as must k > n."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="max_train_rows"):
        train_pq(emb, dim=64, m=4, k=8, max_train_rows=10)
    with pytest.raises(ValueError, match="< k"):
        train_pq(emb.limit(4), dim=64, m=4, k=8)


def test_ivfpq_recall_floor(spark, pq_fixture):
    """IVF x PQ: probing ALL cells must recover at least the pure-PQ
    re-rank floor; a partial probe still clears a lower floor. (With a
    FIXED shortlist, recall is not strictly monotone in nprobe — more
    candidates can crowd ADC-favored impostors into the shortlist — so
    the assertions are floors, not monotonicity.)"""
    from scikit_learn_imputer_spark.similarity.ivf import build_ivf_index
    from scikit_learn_imputer_spark.similarity.pq import ivfpq_topk

    emb, cb, enc = pq_fixture
    assigned, cents = build_ivf_index(
        emb, nlist=8, max_iter=8, init_mode="random", build_partitions=4
    )
    ae = assigned.select("vec_id", "cell").join(enc, "vec_id")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivfpq_topk(
                ae, emb, queries, cents, cb, k=10, nprobe=nprobe, shortlist=50
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_full, r_half = recall(8), recall(4)
    assigned.unpersist()
    assert r_full >= 0.7, f"full-probe recall {r_full}"
    assert r_half >= 0.4, f"half-probe recall {r_half}"


def test_pq_topk_tie_break_partitioning_invariant(spark):
    """ADVICE r5: duplicate vectors share PQ codes, so their ADC scores
    tie EXACTLY; the per-partition cut must agree with the global
    (score desc, neighbor_id asc) tie-break or ranked output depends on
    the partitioning. Plant many duplicates, small k, compare rankings
    across 1/4/16-partition layouts."""
    rng = np.random.RandomState(11)
    m, k_cb, w = 4, 8, 4
    cb = rng.randn(m, k_cb, w).round(3)
    base = np.concatenate([cb[j, 0] for j in range(m)])
    rows = [(i, [float(x) for x in base]) for i in range(30)]  # 30 exact dups
    other = np.concatenate([cb[j, 1] for j in range(m)])
    rows += [(100 + i, [float(x) for x in other]) for i in range(5)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") == 0)
    results = []
    for parts in (1, 4, 16):
        enc = encode_pq(df.repartition(parts), cb.tolist())
        got = [
            (r["rank"], r["neighbor_id"])
            for r in pq_topk(enc, queries, cb.tolist(), k=5)
            .orderBy("rank")
            .collect()
        ]
        results.append(got)
    assert results[0] == results[1] == results[2]
    # ... and the winner set is the lowest-id duplicates (global tie-break).
    assert [n for _, n in results[0]] == [1, 2, 3, 4, 5]
