"""Standardization and Misra-Gries heavy-hitter operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_jabar_spark.ext.heavy_hitters import heavy_hitters
from etl_weather_jabar_spark.operators.aggregates import standardize


def test_standardize_zero_mean_unit_variance(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)] + [("flat", 5.0)] * 10,
        ["k", "x"],
    )
    out = standardize(df, ["k"], F.round(F.col("x") * 100).cast("bigint")).collect()
    g = [r["z"] for r in out if r["k"] == "g"]
    assert abs(sum(g)) < 1e-9
    assert abs(sum(z * z for z in g) / len(g) - 1.0) < 1e-9
    assert all(r["z"] == 0.0 for r in out if r["k"] == "flat")  # zero variance


def test_heavy_hitters_within_mg_bound(spark):
    # skewed stream: two heavy keys + a long unique tail, forced through
    # several partitions so the mergeable-summaries path actually merges
    rows = (
        [("hot1",)] * 600
        + [("hot2",)] * 300
        + [(f"tail{i}",) for i in range(2000)]
    )
    df = spark.createDataFrame(rows, ["v"]).repartition(8)
    n, k = len(rows), 50
    est = {r["v"]: r["est"] for r in heavy_hitters(df, "v", k).collect()}
    # every key with true count > n/k must survive; estimates are lower
    # bounds within n/k of truth
    for key, true in (("hot1", 600), ("hot2", 300)):
        assert key in est, key
        assert true - n // k <= est[key] <= true
    assert all(e <= 600 for e in est.values())


def test_heavy_hitters_exact_when_k_exceeds_cardinality(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, ["v"]
    )
    est = {r["v"]: r["est"] for r in heavy_hitters(df, "v", 100).collect()}
    assert est == {"a": 5, "b": 3, "c": 2}  # no pruning -> exact counts
