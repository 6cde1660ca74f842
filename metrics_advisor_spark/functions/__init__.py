from metrics_advisor_spark.functions.text import (
    text_stats,
    token_count,
    lang_id,
    doc_fingerprint,
)
from metrics_advisor_spark.functions.dedup import (
    exact_dup_groups,
    shingle,
    jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
)
from metrics_advisor_spark.functions.similarity import (
    cosine_col,
    brute_force_topk,
    srp_buckets,
    lsh_topk,
)

__all__ = [
    "text_stats",
    "token_count",
    "lang_id",
    "doc_fingerprint",
    "exact_dup_groups",
    "shingle",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "cosine_col",
    "brute_force_topk",
    "srp_buckets",
    "lsh_topk",
]
