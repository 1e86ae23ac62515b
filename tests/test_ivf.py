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


def test_ivf_index_save_load_roundtrip_and_pruning(spark, sf_smoke, tmp_path):
    """Persisted IVF index: search results equal the in-memory index, and a
    cell probe prunes partitions at planning time (PartitionFilters on the
    cell directory column, not a post-scan row filter)."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.similarity.ivf import (
        build_ivf_index,
        cosine_topk_ivf,
        load_ivf_index,
        save_ivf_index,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    assigned, centroids = build_ivf_index(
        emb, nlist=4, max_iter=3, init_mode="random", build_partitions=4
    )
    queries = emb.filter(F.col("vec_id") < 3)
    mem = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_ivf(assigned, centroids, queries, k=5, nprobe=2).collect()
    }

    path = str(tmp_path / "ivf")
    save_ivf_index(assigned, centroids, path)
    loaded, loaded_centroids = load_ivf_index(spark, path)
    assert loaded_centroids == centroids
    disk = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_ivf(loaded, loaded_centroids, queries, k=5, nprobe=2).collect()
    }
    assert disk == mem

    plan = (
        loaded.filter(F.col("cell").isin([0, 1]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]
