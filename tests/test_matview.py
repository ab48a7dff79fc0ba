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


def test_streaming_materialized_view_maintenance(spark, tmp_path):
    """Streaming MV: each micro-batch of I/D changes folds into a
    snapshot-persisted aggregate view via delta_agg + merge_view inside
    foreachBatch — after two batches the view equals a full recompute of
    the surviving rows (the streaming twin of incremental_agg_view)."""
    import json as _json
    import os

    from etl_weather_jabar_spark.snapshots import (
        snapshot_read,
        snapshot_write,
    )

    landing = str(tmp_path / "in")
    view_tbl = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    schema = "k STRING, c_ LONG, op STRING"

    def commit(batch, batch_id):
        delta = delta_agg(batch, ["k"], measures={"cents": F.col("c_")})
        try:
            cur = snapshot_read(spark, view_tbl)
        except FileNotFoundError:
            cur = delta.limit(0)
        snapshot_write(
            merge_view(cur, delta, ["k"]), view_tbl, mode="overwrite"
        )

    def run():
        q = (
            spark.readStream.schema(schema).json(landing)
            .writeStream.foreachBatch(commit)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [("a", 100, "I"), ("a", 250, "I"), ("b", 40, "I")]
    with open(f"{landing}/b1.json", "w") as f:
        f.write("\n".join(
            _json.dumps({"k": k, "c_": c, "op": o}) for k, c, o in b1
        ))
    run()
    b2 = [("b", 40, "D"), ("a", 9, "I"), ("c", 7, "I")]
    with open(f"{landing}/b2.json", "w") as f:
        f.write("\n".join(
            _json.dumps({"k": k, "c_": c, "op": o}) for k, c, o in b2
        ))
    run()

    got = _view_dict(snapshot_read(spark, view_tbl))
    assert got == {"a": (3, 359), "c": (1, 7)}  # group b died


def test_merge_view_negative_count_raises(spark):
    """ADVICE r3: a change feed that deletes from a group the view never
    counted drives the maintained count negative — merge_view must fail
    loudly instead of silently dropping the pending deletes (a later
    insert would otherwise resurrect the group with an overstated
    count)."""
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    view = spark.createDataFrame(
        [("a", 1, 100)], "k STRING, n_rows BIGINT, cents BIGINT"
    )
    bad_delta = spark.createDataFrame(
        [("ghost", -2, -50)], "k STRING, n_rows BIGINT, cents BIGINT"
    )
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException, Exception)) as e:
        merge_view(view, bad_delta, ["k"]).collect()
    assert "negative" in str(e.value)

    # the guard does NOT fire on a consistent feed (count reaches 0 → drop)
    ok_delta = spark.createDataFrame(
        [("a", -1, -100)], "k STRING, n_rows BIGINT, cents BIGINT"
    )
    assert merge_view(view, ok_delta, ["k"]).count() == 0


def test_idempotent_view_commit_skips_replayed_batch(spark, tmp_path):
    """ADVICE r3: a retried foreachBatch micro-batch (same batch_id) must
    NOT double-apply its delta; a new batch_id still applies."""
    from etl_weather_jabar_spark.ext.matview import idempotent_view_commit
    from etl_weather_jabar_spark.snapshots import snapshot_read

    tbl = str(tmp_path / "view")
    b0 = spark.createDataFrame(
        [("a", 100, "I"), ("a", 50, "I"), ("b", 7, "I")],
        "k STRING, c_ LONG, op STRING",
    )
    assert idempotent_view_commit(
        spark, tbl, b0, 0, ["k"], measures={"cents": F.col("c_")}
    )
    first = _view_dict(snapshot_read(spark, tbl))
    assert first == {"a": (2, 150), "b": (1, 7)}

    # replay of batch 0 (at-least-once retry): skipped, state unchanged
    assert not idempotent_view_commit(
        spark, tbl, b0, 0, ["k"], measures={"cents": F.col("c_")}
    )
    assert _view_dict(snapshot_read(spark, tbl)) == first

    # a genuinely new batch id still applies
    b1 = spark.createDataFrame(
        [("b", 7, "D"), ("c", 1, "I")], "k STRING, c_ LONG, op STRING"
    )
    assert idempotent_view_commit(
        spark, tbl, b1, 1, ["k"], measures={"cents": F.col("c_")}
    )
    assert _view_dict(snapshot_read(spark, tbl)) == {"a": (2, 150), "c": (1, 1)}
