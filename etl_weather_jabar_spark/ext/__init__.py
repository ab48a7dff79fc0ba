from .dedup_text import (
    exact_dedup,
    jaccard_verify,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash64,
    simhash_candidates,
)
from .similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
    train_ivf_centroids,
)

__all__ = [
    "exact_dedup",
    "jaccard_verify",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash64",
    "simhash_candidates",
    "brute_force_topk",
    "ivf_topk",
    "lsh_bucketed_topk",
    "train_ivf_centroids",
]
