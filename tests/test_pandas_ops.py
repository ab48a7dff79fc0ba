"""Cogrouped applyInPandas + Python UDTF escape-hatch surfaces.

Each Python-side operator is asserted EQUAL to a native DataFrame plan on
the same input — the escape hatches are pinned without being load-bearing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_weather_jabar_spark.ext.pandas_ops import (
    reconcile_order_totals,
    reconcile_order_totals_native,
    register_chunk_udtf,
)
from etl_weather_jabar_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def _degraded_inputs(spark):
    # drop some headers (→ orphan_lines) and some lines (→ no_lines)
    orders = load_table(spark, SF_DIR, "orders").where(
        F.col("o_orderkey") % 7 != 0
    )
    lineitem = load_table(spark, SF_DIR, "lineitem").where(
        F.col("l_orderkey") % 5 != 0
    )
    return orders, lineitem


def test_cogroup_reconcile_matches_native_join(spark):
    orders, lineitem = _degraded_inputs(spark)
    via_pandas = {
        r["o_orderkey"]: (
            r["header_cents"],
            r["lines_cents"],
            r["delta_cents"],
            r["n_lines"],
            r["status"],
        )
        for r in reconcile_order_totals(orders, lineitem).collect()
    }
    via_native = {
        r["o_orderkey"]: (
            r["header_cents"],
            r["lines_cents"],
            r["delta_cents"],
            r["n_lines"],
            r["status"],
        )
        for r in reconcile_order_totals_native(orders, lineitem).collect()
    }
    assert via_pandas == via_native
    statuses = {s for (*_, s) in via_pandas.values()}
    # the degraded inputs must actually exercise all classification arms
    assert {"orphan_lines", "no_lines"} <= statuses


def test_cogroup_reconcile_tolerance_gate(spark):
    orders = spark.createDataFrame(
        [(1, 10.00), (2, 10.00)], ["o_orderkey", "o_totalprice"]
    )
    lineitem = spark.createDataFrame(
        [(1, 9.99), (2, 9.00)], ["l_orderkey", "l_extendedprice"]
    )
    out = {
        r["o_orderkey"]: r["status"]
        for r in reconcile_order_totals(
            orders, lineitem, tol_cents=5
        ).collect()
    }
    assert out == {1: "match", 2: "mismatch"}


def test_chunk_udtf_spans(spark):
    register_chunk_udtf(spark)
    rows = spark.sql("SELECT * FROM chunk_spans(300, 120, 30)").collect()
    assert [(r["chunk_start"], r["chunk_end"]) for r in rows] == [
        (0, 120),
        (90, 210),
        (180, 300),
    ]
    # short doc: single whole-doc chunk; degenerate args: no rows
    assert [
        (r["chunk_start"], r["chunk_end"])
        for r in spark.sql("SELECT * FROM chunk_spans(50, 120, 30)").collect()
    ] == [(0, 50)]
    assert spark.sql("SELECT * FROM chunk_spans(50, 0, 0)").count() == 0


def test_chunk_udtf_lateral_per_row(spark):
    register_chunk_udtf(spark)
    spark.createDataFrame(
        [(1, 200), (2, 90)], ["doc_id", "n_chars"]
    ).createOrReplaceTempView("docs_len")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.chunk_start, s.chunk_end
        FROM docs_len d, LATERAL chunk_spans(d.n_chars, 120, 30) s
        ORDER BY d.doc_id, s.chunk_start
        """
    ).collect()
    assert [(r["doc_id"], r["chunk_start"], r["chunk_end"]) for r in rows] == [
        (1, 0, 120),
        (1, 90, 200),
        (2, 0, 90),
    ]


def test_groupwise_ols_matches_column_form_exactly(spark):
    """The grouped-map python OLS (arbitrary-precision ints in the
    worker) must reproduce the pure-Column regression_surface
    bit-identically — the escape-hatch-pinned-to-native-twin pattern."""
    from etl_weather_jabar_spark.ext.pandas_ops import groupwise_ols
    from etl_weather_jabar_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    native = {
        r["l_returnflag"]: (
            r["n_rows"], r["slope_dollars_per_qty"], r["intercept_dollars"]
        )
        for r in QUERIES["regression_surface"](spark, sf).collect()
    }
    li = load_table(spark, sf, "lineitem")
    via_pandas = {
        r["l_returnflag"]: (
            r["n_rows"], r["slope_dollars_per_qty"], r["intercept_dollars"]
        )
        for r in groupwise_ols(
            li,
            "l_returnflag",
            F.col("l_quantity"),
            F.round(F.col("l_extendedprice") * 100),
        ).collect()
    }
    assert via_pandas == native and len(native) == 3


def test_asof_join_pandas_matches_native(spark):
    """pd.merge_asof per cogroup must equal the union+running-last native
    as-of join on the same click/purchase shape, including the tolerance
    cutoff."""
    from etl_weather_jabar_spark.ext.pandas_ops import asof_join_pandas
    from etl_weather_jabar_spark.operators.joins import asof_join_backward

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    for tol in (None, 3600):
        native = asof_join_backward(
            purchases, clicks, ["user_id"], "p_ts", "c_ts",
            right_cols=["c_id"], tolerance_seconds=tol,
        ).select("user_id", "p_id", "c_id")
        via_pandas = asof_join_pandas(
            purchases, clicks, "user_id", "p_ts", "c_ts", ["c_id"],
            tolerance_seconds=tol,
        ).select("user_id", "p_id", "c_id")
        a = sorted(map(tuple, native.collect()))
        b = sorted(map(tuple, via_pandas.collect()))
        assert a == b and len(a) > 0, (tol, len(a), len(b))


def test_asof_join_pandas_nearest_direction(spark):
    """direction='nearest' (no native twin) against a hand-computed
    fixture: each left ts matches the closest right ts either side."""
    from datetime import datetime as dt

    from etl_weather_jabar_spark.ext.pandas_ops import asof_join_pandas

    left = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10, 0), 100), (1, dt(2024, 1, 1, 10, 59), 101)],
        ["k", "lts", "lid"],
    )
    right = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 9, 50), 7), (1, dt(2024, 1, 1, 11, 0), 8)],
        ["k", "rts", "rid"],
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join_pandas(
            left, right, "k", "lts", "rts", ["rid"], direction="nearest"
        ).collect()
    }
    # 10:00 is nearer 9:50 (10m) than 11:00 (60m); 10:59 nearer 11:00 (1m)
    assert got == {100: 7, 101: 8}
