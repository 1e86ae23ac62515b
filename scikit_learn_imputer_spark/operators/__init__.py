from scikit_learn_imputer_spark.operators.chunking import chunk_documents, pack_sequences
from scikit_learn_imputer_spark.operators.missing import missing_indicator, missing_metrics
from scikit_learn_imputer_spark.operators.fill import ffill_bfill
from scikit_learn_imputer_spark.operators.encode import one_hot, label_encode, label_decode
from scikit_learn_imputer_spark.operators.scale import minmax_scale
from scikit_learn_imputer_spark.operators.update import scatter_update
from scikit_learn_imputer_spark.operators.split import split_exact, split_modulo

__all__ = [
    "chunk_documents",
    "pack_sequences",
    "missing_indicator",
    "missing_metrics",
    "ffill_bfill",
    "one_hot",
    "label_encode",
    "label_decode",
    "minmax_scale",
    "scatter_update",
    "split_exact",
    "split_modulo",
]
