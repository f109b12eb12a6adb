from .asof import asof_join
from .dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    simhash_signatures,
    simhash_near_dup_pairs,
    ngram_jaccard_pairs,
    embedding_near_dup_pairs,
    decontaminate,
    line_dedup,
)
from .similarity import brute_force_topk, kmeans_clusters, lsh_topk
from .text import (
    text_stats,
    quality_score,
    language_id,
    doc_fingerprint,
)

__all__ = [
    "asof_join",
    "exact_dedup",
    "minhash_near_dup_pairs",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "embedding_near_dup_pairs",
    "decontaminate",
    "line_dedup",
    "brute_force_topk",
    "kmeans_clusters",
    "lsh_topk",
    "text_stats",
    "quality_score",
    "language_id",
    "doc_fingerprint",
]
