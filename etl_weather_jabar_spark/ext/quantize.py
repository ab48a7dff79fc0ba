"""Scalar (int8) embedding quantization — the storage/serving compression
step of an embedding pipeline.

Not in the reference (SURVEY §2 has no vector types at all); this is a
north-star extension sibling of ext/similarity.py: uniform per-dimension
min/max quantization, the baseline every PQ/OPQ variant is measured
against.

    code(x, d)  = clamp(floor((x - mn_d) · 255 / (mx_d - mn_d)), 0, 255)
    dequant(c, d) = mn_d + (c · (mx_d - mn_d)) / 255

Determinism: every step is pure IEEE-754 double arithmetic (subtract,
multiply, divide, floor, min/max) — bit-identical across engines, so the
codes AND the per-element reconstruction errors are exactly reproducible
(the DuckDB oracle matches on raw values, no rounding slack). Error
SUMMARIES stick to max/count/integer totals; never a float sum, which is
accumulation-order-dependent.

Scale notes (100 TB): the flattened (vec, dim) stream is N·D rows but the
per-dimension stats aggregate is map-side combined down to D rows, which
broadcast back — one shuffle of D rows plus one narrow pass. The code
array re-assembly groups by vec_id (shuffle on the natural key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import spread


def dim_minmax(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (pos, mn, mx) over the corpus; pos is 1-based."""
    flat = spread(embeddings).select(
        F.posexplode(vec_col).alias("pos0", "v")
    )
    return (
        flat.select((F.col("pos0") + 1).alias("pos"), F.col("v").cast("double").alias("x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )


def quantize_int8(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stats: DataFrame | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (vector, dimension): the int8 code and the exact
    reconstruction error. Pass pre-trained ``stats`` (from
    :func:`dim_minmax`) to quantize new vectors against a frozen codebook;
    default trains on the input itself. ``carry_cols`` ride along
    unchanged (e.g. a label for per-class error reporting).

    Columns: ``id_col``, carry_cols, pos (1-based), x (double),
    code (0..255), abs_err (double, bit-exact). Constant dimensions
    (mx == mn) map to code 0 with zero error.
    """
    stats = dim_minmax(embeddings, vec_col) if stats is None else stats
    flat = spread(embeddings).select(
        id_col, *carry_cols, F.posexplode(vec_col).alias("pos0", "v")
    ).select(
        id_col,
        *carry_cols,
        (F.col("pos0") + 1).alias("pos"),
        F.col("v").cast("double").alias("x"),
    )
    j = flat.join(F.broadcast(stats), "pos")
    span = F.col("mx") - F.col("mn")
    code = F.when(
        span > 0,
        F.least(
            F.greatest(
                F.floor(((F.col("x") - F.col("mn")) * F.lit(255.0)) / span),
                F.lit(0),
            ),
            F.lit(255),
        ),
    ).otherwise(F.lit(0))
    j = j.withColumn("code", code.cast("int"))
    deq = F.col("mn") + (F.col("code").cast("double") * span) / F.lit(255.0)
    return j.withColumn("abs_err", F.abs(F.col("x") - deq)).select(
        id_col, *carry_cols, "pos", "x", "code", "abs_err"
    )
