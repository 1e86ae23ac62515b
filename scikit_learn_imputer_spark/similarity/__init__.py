from scikit_learn_imputer_spark.similarity.knn import cosine_topk, cosine_topk_lsh

__all__ = ["cosine_topk", "cosine_topk_lsh"]
