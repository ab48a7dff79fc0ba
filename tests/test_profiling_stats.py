"""Profiling / statistics operators: single-pass profile, histogram,
weighted sampling, dyadic EWMA, winsorization."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_weather_jabar_spark.ext.profiling import profile_columns
from etl_weather_jabar_spark.ext.sampling import weighted_sample
from etl_weather_jabar_spark.ext.timeseries import dyadic_ewma
from etl_weather_jabar_spark.operators.aggregates import (
    equi_width_histogram,
    winsorize,
)
from etl_weather_jabar_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_profile_columns_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")],
        ["k", "s"],
    )
    out = {
        r["column"]: r
        for r in profile_columns(
            df, [("k", F.col("k")), ("s", F.col("s"))]
        ).collect()
    }
    k, s = out["k"], out["s"]
    assert k["n_rows"] == 4 and k["n_nulls"] == 1 and k["n_distinct"] == 2
    assert k["min_s"] == "1" and k["max_s"] == "2"
    assert s["n_nulls"] == 1 and s["n_distinct"] == 2
    assert s["min_s"] == "a" and s["max_s"] == "b"


def test_profile_columns_plan_shape(spark):
    """N columns' stats must NOT scan once per column, and must never
    sort the data: the stats half is one plain aggregate, the distinct
    half a two-level HASH aggregation over narrow pairs (the earlier
    single-scan Expand form forced SortAggregate over (N+1)× wide rows —
    measured 4× slower at sf0.1, and a full-data sort at 100 TB). Two
    column-pruned scans total, zero sorts."""
    orders = load_table(spark, SF, "orders")
    out = profile_columns(
        orders,
        [("o_orderkey", F.col("o_orderkey")), ("o_orderstatus", F.col("o_orderstatus"))],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2
    # no physical Sort node anywhere (a grouping-key-less SortAggregate
    # for the string min/max buffers is fine — it streams, nothing sorts)
    import re

    assert not re.search(r"[+:]- Sort \[", plan)
    assert "HashAggregate" in plan
    # both scans are column-pruned to just the profiled columns
    for rs in [
        seg.split("ReadSchema:")[1].split("\n")[0]
        for seg in plan.split("FileScan")[1:]
    ]:
        assert "o_orderkey" in rs and "o_totalprice" not in rs
    assert out.count() == 2


def test_equi_width_histogram_floors_negatives(spark):
    df = spark.createDataFrame(
        [(-7,), (-1,), (0,), (3,), (5,), (12,)], ["u"]
    )
    out = {
        r["bin"]: (r["bin_lo_units"], r["n"])
        for r in equi_width_histogram(df, F.col("u"), 5).collect()
    }
    # floor(-7/5) = -2 (true bin, not truncation toward zero)
    assert out == {-2: (-10, 1), -1: (-5, 1), 0: (0, 2), 1: (5, 1), 2: (10, 1)}


def test_equi_width_histogram_partial_agg(spark):
    orders = load_table(spark, SF, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    plan = (
        equi_width_histogram(orders, cents, 50000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_weighted_sample_matches_python_model(spark):
    """The sample is exactly the top-k rows by the documented integer
    priority — reproducible outside Spark from row content alone."""
    rows = [(i, (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = [
        r["id"]
        for r in weighted_sample(df, "id", F.col("w"), 20, tiebreak="id").collect()
    ]

    def pri(i, w):
        h = hashlib.md5(f"{i}:wsample".encode()).hexdigest()
        return (w * 2**32) // (int(h[:8], 16) + 1)

    expect = sorted(rows, key=lambda t: (-pri(*t), t[0]))[:20]
    assert sorted(got) == sorted(i for i, _ in expect)


def test_weighted_sample_plan_is_top_k(spark):
    df = load_table(spark, SF, "documents")
    out = weighted_sample(df, "doc_id", F.col("n_chars"), 10, tiebreak="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # heaps + merge, no global sort


def test_dyadic_ewma_known_series(spark):
    df = spark.createDataFrame(
        [("u", 1, 100), ("u", 2, 200), ("u", 3, 400)], ["k", "t", "u_units"]
    )
    out = {
        r["t"]: (r["ewma_units"], r["n_window"])
        for r in dyadic_ewma(
            df, "k", [F.col("t")], F.col("u_units").cast("bigint")
        ).collect()
    }
    # n=1: 100 | n=2: (1*100+2*200)/3 = 166.67 → 167 | n=3: (100+400+1600)/7 = 300
    assert out == {1: (100, 1), 2: (167, 2), 3: (300, 3)}


def test_dyadic_ewma_window_caps_at_depth(spark):
    df = spark.createDataFrame(
        [("u", t, 10) for t in range(12)], ["k", "t", "u_units"]
    )
    rows = dyadic_ewma(
        df, "k", [F.col("t")], F.col("u_units").cast("bigint"), depth=4
    ).collect()
    assert max(r["n_window"] for r in rows) == 4
    assert all(r["ewma_units"] == 10 for r in rows)  # constant in, constant out


def test_winsorize_clips_to_interpolated_bounds(spark):
    df = spark.createDataFrame([("g", i) for i in range(1, 101)], ["k", "u"])
    out = winsorize(df, ["k"], F.col("u").cast("bigint"), out_col="w")
    vals = {r["u"]: r["w"] for r in out.collect()}
    # percentile(0.05) of 1..100 = 1 + 0.05*99 = 5.95; p95 = 95.05
    assert vals[1] == 5.95 and vals[3] == 5.95
    assert vals[100] == 95.05 and vals[97] == 95.05
    assert vals[50] == 50.0


def test_winsorize_approx_close_to_exact(spark):
    """The t-digest scale path lands within one unit of the exact bounds
    on a smooth distribution."""
    df = spark.createDataFrame([("g", i) for i in range(1, 1001)], ["k", "u"])
    exact = winsorize(df, ["k"], F.col("u").cast("bigint"), out_col="w")
    approx = winsorize(
        df, ["k"], F.col("u").cast("bigint"), out_col="w", approx=True
    )
    e = {r["u"]: r["w"] for r in exact.collect()}
    a = {r["u"]: r["w"] for r in approx.collect()}
    assert all(abs(e[u] - a[u]) <= 1.0 for u in e)


def test_winsorize_broadcasts_bounds(spark):
    ev = load_table(spark, SF, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    plan = (
        winsorize(ev, ["event_type"], cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # bounds join never shuffles the facts


def test_profile_columns_distinct_matches_typed_count_for_signed_zero(spark):
    """-0.0 and 0.0 are ONE value to a typed count_distinct (Spark
    normalizes signed zeros in grouping keys) — the profile's shared
    string-pair encoding must agree, not split them into "-0.0"/"0.0";
    NaN stays a single distinct value."""
    df = spark.createDataFrame(
        [(0.0,), (-0.0,), (1.5,), (float("nan",),)], ["x"]
    )
    typed = df.agg(F.count_distinct("x")).collect()[0][0]
    prof = profile_columns(df, [("x", F.col("x"))]).collect()[0]
    assert prof["n_distinct"] == typed
