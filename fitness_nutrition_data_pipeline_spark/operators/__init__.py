from fitness_nutrition_data_pipeline_spark.operators.asof import as_of_join
from fitness_nutrition_data_pipeline_spark.operators.dedup import (
    exact_dedup_summary,
    jaccard_on_adjacent_pairs,
    lsh_bands,
    lsh_buckets,
    lsh_dup_flags,
    minhash_signatures,
    simhash16,
)
from fitness_nutrition_data_pipeline_spark.operators.keys import assign_sequential_ids, with_order_index
from fitness_nutrition_data_pipeline_spark.operators.resolution import resolve_users
from fitness_nutrition_data_pipeline_spark.operators.similarity import (
    assign_centroids,
    brute_force_topk,
    cosine,
    ivf_probe_topk,
)
from fitness_nutrition_data_pipeline_spark.operators.text import (
    language_scores,
    quality_features,
    tfidf_scores,
    token_counts,
    whitespace_tokens,
    winnowing_fingerprint_summary,
    word_shingles,
)

__all__ = [
    "as_of_join",
    "assign_centroids",
    "assign_sequential_ids",
    "brute_force_topk",
    "cosine",
    "exact_dedup_summary",
    "ivf_probe_topk",
    "jaccard_on_adjacent_pairs",
    "language_scores",
    "lsh_bands",
    "lsh_buckets",
    "lsh_dup_flags",
    "minhash_signatures",
    "quality_features",
    "resolve_users",
    "simhash16",
    "tfidf_scores",
    "token_counts",
    "whitespace_tokens",
    "winnowing_fingerprint_summary",
    "with_order_index",
    "word_shingles",
]
