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
from scikit_learn_imputer_spark.functions.pii import scrub_pii, scrub_pii_col
from scikit_learn_imputer_spark.functions.lm import bigram_lm_scores, char_bigram_counts
from scikit_learn_imputer_spark.functions.skew import fan_out, salted_agg
from scikit_learn_imputer_spark.functions.bpe import (
    bpe_token_counts,
    learn_bpe_merges,
    vocab_from_merges,
    with_bpe_token_counts,
)
from scikit_learn_imputer_spark.functions.quality_model import (
    quality_model_scores,
    train_quality_model,
)
from scikit_learn_imputer_spark.functions.repetition import (
    repetition_signals,
)

__all__ = [
    "entropy_by_column",
    "avg_rank",
    "imputation_variance_long",
    "token_count_col",
    "quality_features",
    "lang_id_col",
    "fingerprint_col",
    "scrub_pii",
    "scrub_pii_col",
    "bigram_lm_scores",
    "char_bigram_counts",
    "fan_out",
    "salted_agg",
    "bpe_token_counts",
    "learn_bpe_merges",
    "vocab_from_merges",
    "with_bpe_token_counts",
    "quality_model_scores",
    "train_quality_model",
    "repetition_signals",
]
