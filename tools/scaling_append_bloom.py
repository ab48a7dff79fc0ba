"""Append-cost-vs-corpus-size probe for the search index (round-6
verdict item 2 'done' criterion): the Bloom-gated replay/overlap check
must keep `append_to_search_index` cost FLAT as the committed corpus
grows — an all-new batch probes the merged per-segment id Bloom
(broadcast map, O(batch)) and never reads the committed doclens.

Method: grow the committed corpus by replicating sf0.1 documents with
id offsets (1x / 4x / 16x), then time appending the SAME fixed-size
batch of brand-new ids at each corpus size (median of 3). The index
build itself is out of scope (it is O(corpus) by definition); only the
append is timed. Run: python tools/scaling_append_bloom.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_weather_jabar_spark.ext.search import (  # noqa: E402
    append_to_search_index,
    save_search_index,
)
from etl_weather_jabar_spark.session import get_spark  # noqa: E402
from etl_weather_jabar_spark.sources.parquet import load_table  # noqa: E402


def main() -> None:
    spark = get_spark("scaling-append-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(
        spark, "/root/testdata/sf0.1", "documents"
    ).select("doc_id", "text")
    n0 = docs.count()
    batch = docs.where(F.col("doc_id") < 1000).select(
        (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
    )
    nb = batch.count()

    print(f"base corpus {n0} docs; fixed append batch = {nb} new ids")
    for mult in (1, 4, 16):
        rep = spark.range(mult).select(
            (F.col("id") * 10_000_000).alias("off")
        )
        corpus = docs.crossJoin(rep).select(
            (F.col("doc_id") + F.col("off")).alias("doc_id"), "text"
        )
        idx = tempfile.mkdtemp(prefix=f"apbloom_{mult}x_") + "/idx"
        save_search_index(corpus, idx)
        # extra committed segments so the probe exercises the merged
        # (multi-segment) Bloom, not a single-segment special case
        for j in range(2):
            seg = docs.where(F.col("doc_id") < 500).select(
                (F.col("doc_id") + (800 + j) * 1_000_000).alias("doc_id"),
                "text",
            )
            append_to_search_index(seg, idx)
        times = []
        for t in range(3):
            b = batch.select(
                (F.col("doc_id") + t * 100_000).alias("doc_id"), "text"
            )
            t0 = time.time()
            n = append_to_search_index(b, idx)
            times.append(time.time() - t0)
            assert n == nb, (n, nb)
        times.sort()
        print(
            f"corpus {mult:>2}x ({mult * n0:>6} docs): append({nb}) "
            f"median {times[1]:.2f}s  (runs: "
            + ", ".join(f"{x:.2f}" for x in times)
            + ")"
        )


if __name__ == "__main__":
    main()
