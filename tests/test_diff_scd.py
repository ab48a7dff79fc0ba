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


def test_apply_cdc_joined_equals_union_form(spark):
    from etl_weather_jabar_spark.operators.diff import apply_cdc, apply_cdc_joined

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "s"]
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 1, "U"),
            (3, None, 1, "D"),
            (5, "e", 1, "U"),
            (4, None, 1, "D"),
            (4, "d2", 2, "U"),
            (9, None, 3, "D"),
        ],
        ["k", "s", "seq", "op"],
    )
    a = {(r["k"], r["s"], r["seq"]) for r in apply_cdc(base, changes, ["k"]).collect()}
    b = {
        (r["k"], r["s"], r["seq"])
        for r in apply_cdc_joined(base, changes, ["k"]).collect()
    }
    assert a == b


def test_apply_cdc_joined_bucketed_base_no_base_shuffle(spark):
    """With the base written bucketed on the key, the joined CDC form must
    shuffle ONLY the change log: exactly one Exchange in the plan, and it
    sits on the changes side."""
    from etl_weather_jabar_spark.operators.diff import apply_cdc_joined
    from etl_weather_jabar_spark.sinks import write_bucketed
    from etl_weather_jabar_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    base = (
        load_table(spark, sf, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("price"),
        )
    )
    changes = (
        load_table(spark, sf, "orders")
        .where(F.col("o_orderkey") % 5 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") + 1.0).alias("price"),
            F.lit(1).cast("bigint").alias("seq"),
            F.lit("U").alias("op"),
        )
    )
    write_bucketed(base, "b_cdc_base", ["k"], 4, sort_cols=["k"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = apply_cdc_joined(spark.table("b_cdc_base"), changes, ["k"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # the surviving exchange must not be feeding off the bucketed table
        assert out.count() == base.count()  # pure updates: same row count
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_cdc_base")


def test_hash_range_reconcile_localizes_and_clears(spark):
    """Identical tables produce NO disagreeing buckets; a single-row
    value edit flips exactly one bucket; a dropped row flips exactly
    one bucket (count mismatch)."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.operators.diff import hash_range_reconcile

    base = spark.range(500).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 100).alias("v"),
    )
    assert hash_range_reconcile(base, base, ["k"], ["v"], 32).count() == 0

    edited = base.withColumn(
        "v", F.when(F.col("k") == 123, F.lit(999)).otherwise(F.col("v"))
    )
    d1 = hash_range_reconcile(base, edited, ["k"], ["v"], 32).collect()
    assert len(d1) == 1 and d1[0]["n_l"] == d1[0]["n_r"]

    dropped = base.where(F.col("k") != 77)
    d2 = hash_range_reconcile(base, dropped, ["k"], ["v"], 32).collect()
    assert len(d2) == 1 and d2[0]["n_l"] == d2[0]["n_r"] + 1


def test_hash_range_reconcile_unambiguous_serialization(spark):
    """Field framing: a delimiter inside a value must not shift field
    boundaries, and NULL placement matters — ('a|b','c') vs ('a','b|c')
    and (NULL,'x') vs ('x',NULL) are all detected as drift."""
    from etl_weather_jabar_spark.operators.diff import hash_range_reconcile

    schema = "k INT, v1 STRING, v2 STRING"
    l1 = spark.createDataFrame([(1, "a|b", "c")], schema)
    r1 = spark.createDataFrame([(1, "a", "b|c")], schema)
    assert hash_range_reconcile(l1, r1, ["k"], ["v1", "v2"], 8).count() == 1

    l2 = spark.createDataFrame([(1, None, "x")], schema)
    r2 = spark.createDataFrame([(1, "x", None)], schema)
    assert hash_range_reconcile(l2, r2, ["k"], ["v1", "v2"], 8).count() == 1

    assert hash_range_reconcile(l1, l1, ["k"], ["v1", "v2"], 8).count() == 0
