"""Scaling probe: blocking granularity IS record linkage's quadratic dial.

Measures candidate-pair counts and wall clock for three blocking designs
over the same corrupted-copy linkage task (queries.py::
record_linkage_customers semantics) at a given sf:

* nation-only blocking (coarse — the O(n²/|blocks|) trap),
* the shipped two-pass design (nation × balance-kiloband ∪ nation ×
  segment),
* a finer two-pass (nation × balance-band ∪ nation × segment).

The match SET is identical wherever blocking recall allows (the probe
prints matched-pair counts too), so the table isolates pure candidate-
generation cost. Run: python tools/scaling_linkage.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_weather_jabar_spark.functions.exact import floor_div  # noqa: E402
from etl_weather_jabar_spark.session import get_spark  # noqa: E402
from etl_weather_jabar_spark.sources.parquet import load_table  # noqa: E402


def frames(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    band = floor_div(cents, F.lit(10000).cast("bigint"))
    a = c.where(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("nat"),
        band.alias("a_band"),
        F.col("c_mktsegment").alias("a_seg"),
    )
    b = c.select(
        F.col("c_custkey").alias("b_key"),
        F.when(
            F.col("c_custkey") % 7 == 0,
            F.concat(F.col("c_name"), F.lit("~")),
        ).otherwise(F.col("c_name")).alias("b_name"),
        F.col("c_nationkey").alias("nat"),
        (band + F.when(F.col("c_custkey") % 3 == 0, 1).otherwise(0)).alias(
            "b_band"
        ),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
    )
    return a, b


def link(a, b, passes):
    cands = [p(a, b).select("a_key", "b_key") for p in passes]
    cand = cands[0]
    for c in cands[1:]:
        cand = cand.union(c)
    cand = cand.distinct()
    sc = (
        cand.join(a.drop("nat"), "a_key")
        .join(b.drop("nat"), "b_key")
        .select(
            "a_key",
            "b_key",
            (
                F.when(F.col("a_name") == F.col("b_name"), 24).otherwise(-8)
                + F.when(F.col("a_band") == F.col("b_band"), 6).otherwise(-4)
                + F.when(F.col("a_seg") == F.col("b_seg"), 5).otherwise(-3)
            ).cast("bigint").alias("weight"),
        )
        .where(F.col("weight") >= 15)
    )
    w = Window.partitionBy("a_key").orderBy(F.desc("weight"), F.col("b_key"))
    best = (
        sc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return cand, best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scaling-linkage")
    spark.sparkContext.setLogLevel("ERROR")
    a, b = frames(spark, sf_dir)

    ten = F.lit(10).cast("bigint")
    designs = {
        "nation-only (1 pass)": [
            lambda a, b: a.join(b, "nat"),
        ],
        "shipped: nat x kiloband + nat x segment": [
            lambda a, b: a.join(b, "nat").where(
                floor_div(F.col("a_band"), ten)
                == floor_div(F.col("b_band"), ten)
            ),
            lambda a, b: a.join(b, "nat").where(
                F.col("a_seg") == F.col("b_seg")
            ),
        ],
        "finer: nat x band + nat x segment": [
            lambda a, b: a.join(b, "nat").where(
                F.col("a_band") == F.col("b_band")
            ),
            lambda a, b: a.join(b, "nat").where(
                F.col("a_seg") == F.col("b_seg")
            ),
        ],
    }
    print(f"sf_dir={sf_dir}")
    print(f"{'design':44s} {'cands':>10s} {'matches':>8s} {'sec':>6s}")
    for name, passes in designs.items():
        best = None
        for _ in range(2):  # warm second run is the reported one
            t0 = time.time()
            cand, bestdf = link(a, b, passes)
            n_cand = cand.count()
            n_match = bestdf.count()
            dt = time.time() - t0
            best = (n_cand, n_match, dt) if best is None else (
                n_cand, n_match, min(best[2], dt)
            )
        print(f"{name:44s} {best[0]:10d} {best[1]:8d} {best[2]:6.2f}")


if __name__ == "__main__":
    main()
