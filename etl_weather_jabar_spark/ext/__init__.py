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
from .quantize import dim_minmax, quantize_int8
from .sequencing import chunk_documents, pack_sequences
from .similarity import (
    brute_force_topk,
    ivf_topk,
    ivf_topk_indexed,
    load_ivf_centroids,
    lsh_bucketed_topk,
    save_ivf_index,
    train_ivf_centroids,
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
    "dim_minmax",
    "quantize_int8",
    "chunk_documents",
    "pack_sequences",
    "brute_force_topk",
    "ivf_topk",
    "ivf_topk_indexed",
    "load_ivf_centroids",
    "lsh_bucketed_topk",
    "save_ivf_index",
    "train_ivf_centroids",
]
