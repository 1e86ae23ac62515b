from scikit_learn_imputer_spark.dedup.bloom import (
    bloom_bitmap,
    bloom_m_bits,
    bloom_hit_col,
    decontaminate_bloom,
)
from scikit_learn_imputer_spark.dedup.exact import (
    benchmark_gram_digests,
    decontaminate,
    decontaminate_ngram,
    exact_dedup,
    exact_dup_groups_quality,
    exact_dup_groups,
    stream_decontaminate_ingest,
)
from scikit_learn_imputer_spark.dedup.ngram import char_ngrams, ngram_jaccard_pairs
from scikit_learn_imputer_spark.dedup.minhash import minhash_signatures, minhash_candidate_pairs
from scikit_learn_imputer_spark.dedup.phash import phash_near_pairs, phash_signatures
from scikit_learn_imputer_spark.dedup.simhash import simhash_signatures, simhash_near_pairs
from scikit_learn_imputer_spark.dedup.spans import (
    boilerplate_grams,
    remove_boilerplate_spans,
    remove_exact_substrings,
    repeated_substring_spans,
)
from scikit_learn_imputer_spark.dedup.cluster import (
    cluster_survivors,
    connected_components,
)
from scikit_learn_imputer_spark.dedup.embedding import embedding_near_pairs
from scikit_learn_imputer_spark.dedup.paragraphs import (
    dedup_paragraphs,
    duplicated_paragraphs,
    paragraph_digests,
)
from scikit_learn_imputer_spark.dedup.incremental import (
    append_signatures,
    append_to_store,
    build_fingerprint_store,
    build_signature_store,
    compact_fingerprint_store,
    compact_signature_store,
    recover_compaction,
    incremental_dedup,
    incremental_dedup_and_commit,
    incremental_near_dedup,
    incremental_near_dedup_and_commit,
    stream_near_dedup_ingest,
)

__all__ = [
    "bloom_bitmap",
    "bloom_m_bits",
    "bloom_hit_col",
    "decontaminate_bloom",
    "append_signatures",
    "append_to_store",
    "build_fingerprint_store",
    "build_signature_store",
    "compact_fingerprint_store",
    "compact_signature_store",
    "recover_compaction",
    "incremental_dedup",
    "incremental_dedup_and_commit",
    "incremental_near_dedup",
    "incremental_near_dedup_and_commit",
    "stream_near_dedup_ingest",
    "benchmark_gram_digests",
    "decontaminate",
    "decontaminate_ngram",
    "exact_dedup",
    "exact_dup_groups_quality",
    "exact_dup_groups",
    "stream_decontaminate_ingest",
    "char_ngrams",
    "cluster_survivors",
    "dedup_paragraphs",
    "duplicated_paragraphs",
    "paragraph_digests",
    "connected_components",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "phash_signatures",
    "phash_near_pairs",
    "simhash_signatures",
    "simhash_near_pairs",
    "boilerplate_grams",
    "remove_boilerplate_spans",
    "remove_exact_substrings",
    "repeated_substring_spans",
    "embedding_near_pairs",
]
