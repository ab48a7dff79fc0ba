"""Incremental materialized-view maintenance (ext/matview.py)."""

import pyspark.sql.functions as F
import pytest

from etl_weather_jabar_spark.ext.matview import (
    build_agg_view,
    delta_agg,
    merge_view,
)


def _view_dict(df):
    return {
        r["k"]: (r["n_rows"], r["cents"]) for r in df.collect()
    }


def test_incremental_equals_recompute_with_group_death(spark):
    """Counting algorithm: inserts/deletes fold into the view; a group
    whose maintained count reaches zero disappears, exactly as a full
    recompute would drop it."""
    base = spark.createDataFrame(
        [("a", 100), ("a", 250), ("b", 40), ("c", 7)], ["k", "c_"]
    ).select("k", F.col("c_").cast("bigint").alias("c_"))
    view0 = build_agg_view(base, ["k"], measures={"cents": F.col("c_")})
    assert _view_dict(view0) == {"a": (2, 350), "b": (1, 40), "c": (1, 7)}

    changes = spark.createDataFrame(
        [
            ("a", 9, "I"),          # new a-row
            ("b", 40, "D"),         # kills group b entirely
            ("c", 7, "D"),
            ("c", 5, "I"),          # c replaced
            ("d", 1, "I"),          # brand-new group
        ],
        ["k", "c_", "op"],
    ).select("k", F.col("c_").cast("bigint").alias("c_"), "op")
    delta = delta_agg(changes, ["k"], measures={"cents": F.col("c_")})
    maintained = merge_view(view0, delta, ["k"])

    final_base = spark.createDataFrame(
        [("a", 100), ("a", 250), ("a", 9), ("c", 5), ("d", 1)], ["k", "c_"]
    ).select("k", F.col("c_").cast("bigint").alias("c_"))
    recomputed = build_agg_view(
        final_base, ["k"], measures={"cents": F.col("c_")}
    )
    assert _view_dict(maintained) == _view_dict(recomputed)
    assert "b" not in _view_dict(maintained)


def test_repeated_maintenance_is_exact(spark):
    """Many rounds of +x/−x churn leave integer-unit sums exactly equal
    to the recompute (the float-drift hazard the integer state avoids)."""
    base = spark.createDataFrame([("a", 333), ("b", 101)], ["k", "c_"])
    base = base.select("k", F.col("c_").cast("bigint").alias("c_"))
    view = build_agg_view(base, ["k"], measures={"cents": F.col("c_")})
    for i in range(5):
        ch = spark.createDataFrame(
            [("a", 333, "I"), ("a", 333, "D"), ("b", 1, "I")],
            ["k", "c_", "op"],
        ).select("k", F.col("c_").cast("bigint").alias("c_"), "op")
        view = merge_view(
            view, delta_agg(ch, ["k"], measures={"cents": F.col("c_")}), ["k"]
        )
    assert _view_dict(view) == {"a": (1, 333), "b": (6, 106)}
