from .dedup import (
    dedup_exact,
    minhash_near_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from .similarity import cosine, cosine_self_topk, embedding_near_dup_pairs, lsh_bucket_topk
from .upsert import incremental_upsert

__all__ = [
    "cosine",
    "cosine_self_topk",
    "dedup_exact",
    "embedding_near_dup_pairs",
    "incremental_upsert",
    "lsh_bucket_topk",
    "minhash_near_dup_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_dup_pairs",
]
