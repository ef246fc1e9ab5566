"""Training-data pipeline extensions beyond riot's own operator set:
dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding-cosine),
similarity search (brute-force + LSH), text analysis (lang-id, quality,
token stats, winnowing fingerprints), PII scrub + Unicode normalization,
multimodal binary-column stages, and event-time window operators
(tumbling/sliding aggregates, sessionization).
"""

from .analysis import (
    exact_quantiles,
    extract_json_int,
    fingerprint,
    hll_count,
    hot_ngrams,
    lang_id,
    quality_score,
    repetition_stats,
    token_stats,
    unigram_counts,
    unigram_logprob,
)
from .dedup import (
    contamination,
    dedup_clusters,
    dedup_filter,
    dedup_filter_by,
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
    exact_dedup,
    line_dedup,
    line_dedup_clean,
    minhash_lsh_exact_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .checkpoint import checkpointed_write, read_checkpointed
from .scrub import normalize_text, pii_scrub
from .joins import broadcast_join, hash_join
from .sampling import hash_sample, stratified_cap, token_budget_sample, top_k_per_group
from .multimodal import decode_media, make_fake_media, media_from_docs, resize_media
from .simsearch import build_ivf_index, knn_brute, knn_ivf, knn_ivf_query, knn_lsh
from .windows import (
    asof_attribution,
    sessionize,
    sliding_window_agg,
    top_keys_per_window,
    tumbling_window_agg,
)

__all__ = [
    "extract_json_int",
    "asof_attribution",
    "tumbling_window_agg",
    "sliding_window_agg",
    "sessionize",
    "top_keys_per_window",
    "token_stats",
    "quality_score",
    "pii_scrub",
    "normalize_text",
    "repetition_stats",
    "hot_ngrams",
    "hll_count",
    "exact_quantiles",
    "hash_sample",
    "stratified_cap",
    "token_budget_sample",
    "top_k_per_group",
    "broadcast_join",
    "hash_join",
    "checkpointed_write",
    "read_checkpointed",
    "lang_id",
    "fingerprint",
    "unigram_counts",
    "unigram_logprob",
    "exact_dedup",
    "line_dedup",
    "line_dedup_clean",
    "dedup_clusters",
    "dedup_filter",
    "dedup_filter_by",
    "ngram_jaccard_pairs",
    "contamination",
    "minhash_lsh_exact_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_dup_pairs",
    "embedding_dup_pairs_lsh",
    "knn_brute",
    "knn_ivf",
    "build_ivf_index",
    "knn_ivf_query",
    "knn_lsh",
    "decode_media",
    "resize_media",
    "make_fake_media",
    "media_from_docs",
]
