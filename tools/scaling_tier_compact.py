"""Scaling probe: tiered VECTOR compaction is append-mass-sized, full
compaction is corpus-sized (round-8 order 5 — measured, not claimed).

Method: grow the committed base by replicating sf0.1 embeddings with id
offsets (1x / 4x / 16x); at every size land the SAME four fixed-size
append segments (1000 brand-new ids each, distinct id ranges), then
time on separate fresh indexes:

* ``tier``  — ``compact_vector_index(tier_size=3)``: merges the 3
  smallest append segments only. Expected FLAT across corpus growth
  (the base generation is never read or rewritten).
* ``full``  — ``compact_vector_index()``: rewrites (base ∪ appends).
  Expected to GROW with the corpus — the price tiering amortizes away
  on the continuous ingest cadence. (Multipliers start at 4x because
  below ~100k vectors BOTH modes are fixed-job-overhead-dominated and
  the contrast is invisible; the first probe run showed exactly that.)

The index build itself is O(corpus) by definition and stays out of the
timings. Run: python tools/scaling_tier_compact.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_weather_jabar_spark.ext.similarity import (  # noqa: E402
    append_to_vector_index,
    compact_vector_index,
    save_ivfpq_residual_index,
    train_ivf_centroids_exact,
)
from etl_weather_jabar_spark.session import get_spark  # noqa: E402
from etl_weather_jabar_spark.sources.parquet import load_table  # noqa: E402


def _build(spark, emb, cents, mult: int) -> str:
    rep = spark.range(mult).select((F.col("id") * 10_000_000).alias("off"))
    corpus = emb.crossJoin(rep).select(
        (F.col("vec_id") + F.col("off")).alias("vec_id"), "embedding"
    )
    idx = tempfile.mkdtemp(prefix=f"tiercmp_{mult}x_") + "/idx"
    save_ivfpq_residual_index(corpus, idx, cents)
    for b in range(4):
        batch = emb.where(F.col("vec_id") < 1000).select(
            (F.col("vec_id") + 9_000_000_000 + b * 1_000_000).alias("vec_id"),
            "embedding",
        )
        append_to_vector_index(batch, idx)
    return idx


def main() -> None:
    spark = get_spark("scaling-tier-compact")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    n0 = emb.count()
    cents = train_ivf_centroids_exact(emb, n_clusters=16, iters=0)
    print(f"base corpus {n0} vectors; 4 append segments x 1000 new ids")
    print(f"{'corpus':>8s} {'tier3_s':>8s} {'full_s':>8s}")
    for mult in (4, 64, 256):
        idx_t = _build(spark, emb, cents, mult)
        t0 = time.time()
        out = compact_vector_index(spark, idx_t, tier_size=3)
        t_tier = time.time() - t0
        assert "tier_" in out, out
        idx_f = _build(spark, emb, cents, mult)
        t0 = time.time()
        out = compact_vector_index(spark, idx_f)
        t_full = time.time() - t0
        assert "gens/" in out, out
        print(f"{mult:>7d}x {t_tier:8.2f} {t_full:8.2f}")


if __name__ == "__main__":
    main()
