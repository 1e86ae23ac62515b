"""IVF ANN tests: full-probe equals brute force; partial probe keeps high
top-1 recall on the real embeddings table."""

from pyspark.sql import functions as F

from scikit_learn_imputer_spark.similarity.ivf import (
    build_ivf_index,
    cosine_topk_ivf,
)
from scikit_learn_imputer_spark.similarity.knn import cosine_topk
from scikit_learn_imputer_spark.sources.tables import load_table


def test_ivf_full_probe_equals_brute_force(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    assigned, centroids = build_ivf_index(emb, nlist=4)
    ivf = cosine_topk_ivf(
        assigned, centroids, queries, k=5, nprobe=4
    )
    brute = cosine_topk(emb, queries, k=5)
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in ivf.collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in brute.collect()
    )
    assert got == want


def test_ivf_partial_probe_recall(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    assigned, centroids = build_ivf_index(emb, nlist=8)
    ivf = cosine_topk_ivf(assigned, centroids, queries, k=1, nprobe=4)
    brute = cosine_topk(emb, queries, k=1)
    got = {r["query_id"]: r["neighbor_id"] for r in ivf.collect()}
    want = {r["query_id"]: r["neighbor_id"] for r in brute.collect()}
    hits = sum(got.get(q) == n for q, n in want.items())
    assert hits >= 0.6 * len(want), f"top-1 recall too low: {hits}/{len(want)}"
