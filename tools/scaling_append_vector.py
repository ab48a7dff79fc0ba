"""Append-cost-vs-corpus-size probe for the VECTOR index (round-7
symmetry of tools/scaling_append_bloom.py): the Bloom-gated
already-indexed check must keep `append_to_vector_index` cost FLAT as
the committed corpus grows — an all-new batch probes the merged
per-segment id Bloom (broadcast map, O(batch)) and never reads the
committed list ids; the encode itself is O(batch) by construction
(residual + PQ argmin against broadcast model state).

Method: grow the committed corpus by replicating sf0.1 embeddings with
id offsets (1x / 4x / 16x), then time appending the SAME fixed-size
batch of brand-new ids at each corpus size (median of 3). The index
build is out of scope (O(corpus) by definition); only the append is
timed. Run: python tools/scaling_append_vector.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_weather_jabar_spark.ext.similarity import (  # noqa: E402
    append_to_vector_index,
    save_ivfpq_residual_index,
    train_ivf_centroids_exact,
)
from etl_weather_jabar_spark.session import get_spark  # noqa: E402
from etl_weather_jabar_spark.sources.parquet import load_table  # noqa: E402


def main() -> None:
    spark = get_spark("scaling-append-vector")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    n0 = emb.count()
    batch = emb.where(F.col("vec_id") < 1000).select(
        (F.col("vec_id") + 900_000_000).alias("vec_id"), "embedding"
    )
    nb = batch.count()

    print(f"base corpus {n0} vectors; fixed append batch = {nb} new ids")
    # one model for every corpus size: centroids from the 1x corpus
    # (replicas share geometry, so the model is identical anyway and
    # training cost stays out of the probe)
    cents = train_ivf_centroids_exact(emb, n_clusters=16, iters=0)
    for mult in (1, 4, 16):
        rep = spark.range(mult).select(
            (F.col("id") * 10_000_000).alias("off")
        )
        corpus = emb.crossJoin(rep).select(
            (F.col("vec_id") + F.col("off")).alias("vec_id"), "embedding"
        )
        idx = tempfile.mkdtemp(prefix=f"apvec_{mult}x_") + "/idx"
        save_ivfpq_residual_index(corpus, idx, cents)
        # extra committed segments so the probe exercises the merged
        # (multi-segment) Bloom, not a single-segment special case
        for j in range(2):
            seg = emb.where(F.col("vec_id") < 500).select(
                (F.col("vec_id") + (800 + j) * 1_000_000).alias("vec_id"),
                "embedding",
            )
            append_to_vector_index(seg, idx)
        times = []
        for t in range(3):
            b = batch.select(
                (F.col("vec_id") + t * 100_000).alias("vec_id"),
                "embedding",
            )
            t0 = time.time()
            n = append_to_vector_index(b, idx)
            times.append(time.time() - t0)
            assert n == nb, (n, nb)
        times.sort()
        print(
            f"corpus {mult:>2}x ({mult * n0:>7} vectors): append({nb}) "
            f"median {times[1]:.2f}s  (runs: "
            + ", ".join(f"{x:.2f}" for x in times)
            + ")"
        )


if __name__ == "__main__":
    main()
