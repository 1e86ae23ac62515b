from scikit_learn_imputer_spark.similarity.knn import cosine_topk, cosine_topk_lsh
from scikit_learn_imputer_spark.similarity.pq import (
    encode_pq,
    ivfpq_topk,
    pq_topk,
    pq_topk_rerank,
    train_pq,
)
from scikit_learn_imputer_spark.similarity.quantize import (
    cosine_topk_int8,
    pack_int8,
    quantize_vec,
    unpack_int8,
)

__all__ = [
    "cosine_topk",
    "cosine_topk_lsh",
    "encode_pq",
    "ivfpq_topk",
    "pq_topk",
    "pq_topk_rerank",
    "train_pq",
    "cosine_topk_int8",
    "pack_int8",
    "quantize_vec",
    "unpack_int8",
]
