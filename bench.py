"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full computation, no driver
collect) after a warm-up pass that triggers JVM/codegen warm-up on a
trivial count.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from etl_weather_jabar_spark.queries import QUERIES  # noqa: E402
from etl_weather_jabar_spark.session import get_spark  # noqa: E402

# Headline set: the scan/agg spine, shuffle join, window dedup, grid join,
# tumbling windows, mode, plus the extension pipelines (text + vectors).
BENCH_QUERIES = [
    "pricing_summary",
    "order_lineitem_join_agg",
    "shipping_priority_topk",
    "local_supplier_volume",
    "recap_daily_agg",
    "dedup_keep_first",
    "grid_align_hours",
    "tumbling_window_10min",
    "dominant_mode",
    "window_stamped_flag",
    "broadcast_dim_join",
    "text_quality",
    "token_count_stats",
    "dedup_exact_docs",
    "ann_cosine_topk",
    "minhash_lsh_neardup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, parquet footers, codegen
    QUERIES["pricing_summary"](spark, sf_dir).count()

    # best-of-2 per query: first pass pays per-query codegen/JIT and any
    # host-noise spikes; min is the steady-state number a warmed cluster sees
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        runs = []
        for _ in range(2):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
