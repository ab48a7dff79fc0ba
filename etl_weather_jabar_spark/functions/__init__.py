from .datetimes import canonical_ts, to_canonical_string, zero_pad
from .weather import heat_index_c
from .hashing import hash64, md5_fingerprint
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "canonical_ts",
    "to_canonical_string",
    "zero_pad",
    "heat_index_c",
    "hash64",
    "md5_fingerprint",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
