"""Deterministic sampling operators (ext/sampling.py): rate accuracy,
rerun/append stability, stratum isolation, and the rate-1.0 hex edge."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_weather_jabar_spark.ext.sampling import (
    _hex_thresh,
    hash_split,
    split_sql,
    stratified_hash_sample,
)


def test_hex_thresh_edges():
    assert _hex_thresh(0.0) == "00"
    assert _hex_thresh(0.5) == "80"
    # 1.0 must sort above every 2-char hex bucket ('100' would not)
    assert _hex_thresh(1.0) > "ff"
    assert _hex_thresh(0.999) != "100"


def test_hash_split_proportions_and_python_parity(spark):
    df = spark.range(4000).withColumnRenamed("id", "k")
    out = hash_split(df, "k").groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 4000 - 0.8) < 0.03
    assert abs(counts["val"] / 4000 - 0.1) < 0.02
    # bit-parity with a pure-Python reimplementation (what the oracle runs)
    rows = hash_split(df, "k").where(F.col("k") < 50).collect()
    for r in rows:
        b = hashlib.md5(f"{r['k']}:split".encode()).hexdigest()[:2]
        want = "train" if b < _hex_thresh(0.8) else ("val" if b < _hex_thresh(0.9) else "test")
        assert r["split"] == want


def test_hash_split_append_stable(spark):
    """Adding rows never moves existing rows between splits."""
    small = hash_split(spark.range(100).withColumnRenamed("id", "k"), "k")
    big = hash_split(spark.range(1000).withColumnRenamed("id", "k"), "k")
    merged = small.alias("a").join(big.alias("b"), "k").where(
        F.col("a.split") != F.col("b.split")
    )
    assert merged.count() == 0


def test_hash_split_validates_rates(spark):
    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        hash_split(df, "k", train=0.9, val=0.2)
    with pytest.raises(ValueError):
        hash_split(df, "k", train=0.0)


def test_stratified_sample_rates_and_isolation(spark):
    df = spark.range(6000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )
    kept = stratified_hash_sample(df, "k", "lang", {"en": 0.25})
    got = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    n_en, n_de = 2000, 4000
    assert abs(got["en"] / n_en - 0.25) < 0.05
    assert got["de"] == n_de  # default rate 1.0 keeps every row
    # rate 0 drops the stratum entirely
    none = stratified_hash_sample(df, "k", "lang", {"en": 0.0})
    assert none.where(F.col("lang") == "en").count() == 0


def test_split_sql_matches_spark(spark):
    """The DuckDB-side CASE expression reproduces the Spark assignment."""
    import duckdb

    pdf = hash_split(spark.range(300).withColumnRenamed("id", "k"), "k").toPandas()
    con = duckdb.connect()
    con.register("split_parity", pdf)
    mism = con.execute(
        f"SELECT count(*) FROM split_parity WHERE split <> ({split_sql('k')})"
    ).fetchone()[0]
    assert mism == 0


def test_mixture_resample_hits_target_proportions(spark):
    from etl_weather_jabar_spark.ext.sampling import mixture_resample

    # 3 strata x 90 rows each; weights 2:1:default(1) => sum_w = 4,
    # T = min(90*4/2, 90*4/1, 90*4/1) = 180; k = (w*T)//4 = 90, 45, 45
    rows = [(i, f"s{i % 3}") for i in range(270)]
    df = spark.createDataFrame(rows, ["id", "src"])
    kept = mixture_resample(df, "src", {"s0": 2, "s1": 1}, "id")
    counts = {
        r["src"]: r["n"]
        for r in kept.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"s0": 90, "s1": 45, "s2": 45}


def test_mixture_resample_deterministic_and_append_stable(spark):
    from etl_weather_jabar_spark.ext.sampling import mixture_resample

    rows = [(i, f"s{i % 2}") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "src"])
    w = {"s0": 1, "s1": 1}
    a = {r["id"] for r in mixture_resample(df, "src", w, "id").collect()}
    b = {r["id"] for r in mixture_resample(df, "src", w, "id").collect()}
    assert a == b and len(a) == 100  # balanced strata: nothing dropped
    # growing one stratum never evicts rows previously kept from it when
    # its cap also grows: check subset relation on the shared prefix
    rows2 = rows + [(i, "s0") for i in range(100, 140)]
    df2 = spark.createDataFrame(rows2, ["id", "src"])
    kept2 = {
        r["id"]
        for r in mixture_resample(df2, "src", w, "id").collect()
        if r["src"] == "s1"
    }
    kept1 = {r for r in a if r % 2 == 1}
    # s1 unchanged (still 50 rows, cap still 50): identical kept set
    assert kept2 == kept1


def test_mixture_resample_rejects_bad_weights(spark):
    from etl_weather_jabar_spark.ext.sampling import mixture_resample

    df = spark.createDataFrame([(1, "a")], ["id", "src"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_resample(df, "src", {"a": 0}, "id")
