from metrics_advisor_spark.functions.text import (
    text_stats,
    token_count,
    lang_id,
    doc_fingerprint,
    tfidf_top_terms,
    bm25_search,
)
from metrics_advisor_spark.functions.corpus_api import Corpus
from metrics_advisor_spark.functions.dedup import (
    apply_pair_dedup,
    exact_dup_groups,
    hamming_pairs,
    hamming_pairs_blocked,
    shingle,
    jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
)
from metrics_advisor_spark.functions.similarity import (
    cosine_col,
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    srp_buckets,
    lsh_topk,
)
from metrics_advisor_spark.functions.multimodal import (
    attach_fake_payload,
    extract_media_meta,
    resize_media,
    sample_frames,
)

__all__ = [
    "Corpus",
    "tfidf_top_terms",
    "bm25_search",
    "text_stats",
    "token_count",
    "lang_id",
    "doc_fingerprint",
    "apply_pair_dedup",
    "exact_dup_groups",
    "hamming_pairs",
    "hamming_pairs_blocked",
    "shingle",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "cosine_col",
    "brute_force_topk",
    "embedding_near_dup_pairs",
    "ivf_topk",
    "srp_buckets",
    "lsh_topk",
    "attach_fake_payload",
    "extract_media_meta",
    "resize_media",
    "sample_frames",
]
