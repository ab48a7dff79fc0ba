"""TransformWithState running totals + multi-format sink roundtrips."""

from __future__ import annotations

import os

import pytest

from etl_weather_jabar_spark.sinks import read_table_fmt, write_table
from etl_weather_jabar_spark.sources.parquet import load_table
from etl_weather_jabar_spark.streaming.transform_state import (
    running_totals_stream,
)

SF = "/root/testdata/sf0.001"

try:  # TransformWithState's driver worker needs protobuf (see module doc)
    from google.protobuf import descriptor  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False


@pytest.mark.skipif(
    not HAS_PROTOBUF,
    reason="google.protobuf not in container; TransformWithState driver "
    "worker cannot start (module doc). applyInPandasWithState is the "
    "tested stateful path.",
)
def test_running_totals_transform_with_state(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    # two micro-batches (maxFilesPerTrigger=1) prove state carries across
    # batches, not just within one
    with open(f"{src}/a.csv", "w") as f:
        f.write("1,10.00\n1,5.50\n2,1.25")
    with open(f"{src}/b.csv", "w") as f:
        f.write("1,4.50\n3,2.00")
    stream = (
        spark.readStream.schema("user_id LONG, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    out = running_totals_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(240)
    finally:
        q.stop()
    rows = spark.sql("select * from running_totals_test").collect()
    # the running pair is monotone per user — the max is the final state
    # (collect order across micro-batches is not guaranteed)
    last: dict[int, tuple[int, int]] = {}
    for r in rows:
        pair = (r["n_events"], r["total_cents"])
        if r["user_id"] not in last or pair > last[r["user_id"]]:
            last[r["user_id"]] = pair
    assert last[1] == (3, 2000)  # 10.00 + 5.50 + 4.50 across two batches
    assert last[2] == (1, 125)
    assert last[3] == (1, 200)
    # user 1 must have been emitted in both micro-batches
    assert len([r for r in rows if r["user_id"] == 1]) == 2


def test_write_read_roundtrip_orc_json_csv(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    expect = sorted(
        (r["o_orderkey"], r["o_orderstatus"], round(r["o_totalprice"], 2))
        for r in orders.collect()
    )
    for fmt in ("orc", "json", "csv"):
        path = str(tmp_path / fmt)
        write_table(orders, path, fmt)
        back = read_table_fmt(
            spark,
            path,
            fmt,
            schema="o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE",
        )
        got = sorted(
            (r["o_orderkey"], r["o_orderstatus"], round(r["o_totalprice"], 2))
            for r in back.collect()
        )
        assert got == expect, fmt


def test_read_table_fmt_rejects_unknown_format(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        write_table(load_table(spark, SF, "region"), str(tmp_path / "x"), "avro")
