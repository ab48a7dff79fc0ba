from .dedup_text import (
    exact_dedup,
    jaccard_verify,
    lsh_band_buckets,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash64,
    simhash_candidates,
)
from .graph import connected_components, connected_components_star
from .similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
    train_ivf_centroids,
    train_ivf_centroids_cached,
)

__all__ = [
    "exact_dedup",
    "jaccard_verify",
    "lsh_band_buckets",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash64",
    "simhash_candidates",
    "connected_components",
    "connected_components_star",
    "brute_force_topk",
    "ivf_topk",
    "lsh_bucketed_topk",
    "train_ivf_centroids",
    "train_ivf_centroids_cached",
]
