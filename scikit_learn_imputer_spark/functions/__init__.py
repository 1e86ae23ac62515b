from scikit_learn_imputer_spark.functions.stats import (
    entropy_by_column,
    avg_rank,
    imputation_variance_long,
)
from scikit_learn_imputer_spark.functions.text import (
    token_count_col,
    quality_features,
    lang_id_col,
    fingerprint_col,
)

__all__ = [
    "entropy_by_column",
    "avg_rank",
    "imputation_variance_long",
    "token_count_col",
    "quality_features",
    "lang_id_col",
    "fingerprint_col",
]
