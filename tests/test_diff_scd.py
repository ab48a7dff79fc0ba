"""Snapshot diff and SCD2 assembly operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_jabar_spark.operators.diff import snapshot_diff
from etl_weather_jabar_spark.operators.scd import scd2_from_changes


def test_snapshot_diff_classifies_and_names_columns(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 25), (4, "d", 40), (5, "e", 50)],
        ["k", "s", "v"],
    )
    out = {
        r["k"]: (r["change_type"], sorted(r["changed_cols"]))
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert out == {
        2: ("changed", ["s", "v"]),
        3: ("removed", []),
        4: ("changed", ["s"]),  # NULL -> 'd' is a change (null-safe)
        5: ("added", []),
    }  # k=1 unchanged and filtered out


def test_snapshot_diff_keep_unchanged(spark):
    old = spark.createDataFrame([(1, "a")], ["k", "s"])
    new = spark.createDataFrame([(1, "a")], ["k", "s"])
    rows = snapshot_diff(old, new, ["k"], ["s"], keep_unchanged=True).collect()
    assert [(r["k"], r["change_type"]) for r in rows] == [(1, "unchanged")]


def test_scd2_collapses_runs_and_closes_intervals(spark):
    df = spark.createDataFrame(
        [
            ("u", 1, "A"), ("u", 2, "A"), ("u", 3, "B"), ("u", 4, "A"),
            ("v", 1, "X"),
        ],
        ["k", "t", "status"],
    )
    rows = scd2_from_changes(df, "k", [F.col("t")], ["status"]).collect()
    got = sorted(
        (r["k"], r["status"], r["valid_from_0"], r["valid_to_0"], r["is_current"])
        for r in rows
    )
    assert got == [
        ("u", "A", 1, 3, False),   # run A@1-2 closed by B@3
        ("u", "A", 4, None, True), # A returns: a NEW version, not a merge
        ("u", "B", 3, 4, False),
        ("v", "X", 1, None, True),
    ]


def test_scd2_single_sort_two_windows(spark):
    """Both window passes share one partitioning+ordering — the plan must
    contain exactly one exchange for the key partitioning."""
    df = spark.createDataFrame(
        [("u", 1, 2, "A")], ["k", "t", "tb", "status"]
    )
    out = scd2_from_changes(df, "k", [F.col("t"), F.col("tb")], ["status"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_apply_cdc_upsert_delete_resurrect(spark):
    from etl_weather_jabar_spark.operators.diff import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "s"]
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 1, "U"),   # plain update
            (3, None, 1, "D"),   # delete
            (5, "e", 1, "U"),    # insert (absent from base)
            (4, None, 1, "D"),   # delete...
            (4, "d2", 2, "U"),   # ...then resurrect at a later seq
            (9, None, 3, "D"),   # delete of a key that never existed: no-op
        ],
        ["k", "s", "seq", "op"],
    )
    out = {
        r["k"]: (r["s"], r["seq"])
        for r in apply_cdc(base, changes, ["k"]).collect()
    }
    assert out == {
        1: ("a", 0),   # untouched base row carries seq 0
        2: ("b2", 1),
        4: ("d2", 2),
        5: ("e", 1),
    }


def test_apply_cdc_keep_last_within_key(spark):
    from etl_weather_jabar_spark.operators.diff import apply_cdc

    base = spark.createDataFrame([(1, "x")], ["k", "s"])
    changes = spark.createDataFrame(
        [(1, "v1", 1, "U"), (1, "v3", 3, "U"), (1, "v2", 2, "U")],
        ["k", "s", "seq", "op"],
    )
    rows = apply_cdc(base, changes, ["k"]).collect()
    assert [(r["k"], r["s"], r["seq"]) for r in rows] == [(1, "v3", 3)]
