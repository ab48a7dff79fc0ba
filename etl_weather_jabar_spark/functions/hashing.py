"""Cross-engine-stable hashing primitives.

The dedup/fingerprint extensions need hashes that are (a) computed JVM-side
(no Python UDFs in the hot path) and (b) reproducible outside Spark so the
DuckDB oracle can verify them. MD5 is bit-identical everywhere; we derive
64-bit integer hashes from its hex prefix (15 hex digits < 2^60, so the
bigint is always positive and exact in both engines).

``xxhash64``/``hash`` would be faster but are Spark-specific — used only
where no oracle crosses the boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint as hex (F12-adjacent;
    cross-engine: DuckDB md5() matches bit-for-bit)."""
    return F.md5(F.col(col) if isinstance(col, str) else col)


def hash64(col: Column, seed: int | None = None) -> Column:
    """Stable positive 64-bit hash via md5-hex-prefix. ``seed`` derives
    independent hash functions (for MinHash): h_i(x) = hash64(concat(x,':',i)).
    """
    base = col if seed is None else F.concat(col, F.lit(f":{seed}"))
    return F.conv(F.substring(F.md5(base), 1, 15), 16, 10).cast("bigint")
