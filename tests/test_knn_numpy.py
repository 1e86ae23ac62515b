"""BLAS brute-force ANN path (similarity/knn.py:cosine_topk_numpy) must
return the same neighbors as the JVM expression path, with cosines equal up
to summation-order float noise."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from scikit_learn_imputer_spark.similarity.knn import cosine_topk, cosine_topk_numpy
from scikit_learn_imputer_spark.sources.tables import load_table


def _collect(df):
    return {
        (r["query_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in df.collect()
    }


def test_numpy_path_equals_expression_path(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    a = _collect(cosine_topk(emb, queries, k=5))
    b = _collect(cosine_topk_numpy(emb, queries, k=5))
    assert set(a) == set(b) and len(a) == 8 * 5
    for key in a:
        assert math.isclose(a[key][0], b[key][0], rel_tol=1e-9, abs_tol=1e-9)
        assert a[key][1] == b[key][1], (key, a[key], b[key])


def test_numpy_path_respects_k_larger_than_partition(spark, sf_smoke):
    """k larger than any single Arrow batch's contribution still returns
    the global top-k (per-batch candidates union correctly)."""
    emb = load_table(spark, sf_smoke, "embeddings").repartition(8)
    queries = emb.filter(F.col("vec_id") == 0)
    out = cosine_topk_numpy(emb, queries, k=25).collect()
    assert len(out) == 25
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, 26))
    cosines = [r["cosine"] for r in sorted(out, key=lambda r: r["rank"])]
    assert cosines == sorted(cosines, reverse=True)
