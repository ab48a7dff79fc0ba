from .dedup_text import exact_dedup, minhash_signatures, minhash_lsh_candidates, simhash64
from .similarity import brute_force_topk, lsh_bucketed_topk

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash64",
    "brute_force_topk",
    "lsh_bucketed_topk",
]
