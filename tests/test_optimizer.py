"""Optimizer-behavior evidence: the Catalyst features the 100 TB story
leans on, asserted against real plans — dynamic partition pruning, table
statistics driving join strategy, and nested-struct schema pruning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_jabar_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Fact partitioned by year joined to a filtered tiny dim on the
    partition column: the scan must carry a dynamicpruning subquery, so
    at 100 TB only the matching partitions are read — the runtime
    analogue of static partition pruning, and the reason partition
    columns should be join keys."""
    li = load_table(spark, SF_DIR, "lineitem").withColumn(
        "yr", F.year("l_shipdate")
    )
    path = str(tmp_path / "fact")
    li.write.partitionBy("yr").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(1996, "pick"), (1997, "pick"), (1998, "skip")], ["yr", "tag"]
    )
    q = (
        fact.join(dim, "yr")
        .where(F.col("tag") == "pick")
        .groupBy("yr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "dynamicpruning" in _plan(q).lower(), _plan(q)
    got = {r["yr"] for r in q.collect()}
    assert got <= {1996, 1997} and got  # 1998 partition pruned at runtime


def test_table_statistics_drive_broadcast_choice(spark):
    """ANALYZE TABLE statistics feed the planner's size estimates: a
    saved small table with computed stats broadcasts WITHOUT a hint.
    This is how a production catalog avoids hand-hinting every dim join."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    small = load_table(spark, SF_DIR, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    li.createOrReplaceTempView("fact_v")
    small.write.mode("overwrite").saveAsTable("dim_stats_t")
    try:
        spark.sql("ANALYZE TABLE dim_stats_t COMPUTE STATISTICS")
        desc = spark.sql("DESCRIBE EXTENDED dim_stats_t").collect()
        stats = {r["col_name"]: r["data_type"] for r in desc}
        assert "Statistics" in stats  # sizeInBytes (+rowCount) recorded
        joined = spark.table("fact_v").join(
            spark.table("dim_stats_t"),
            F.col("l_orderkey") % 100 == F.col("s_suppkey"),
        )
        assert "BroadcastHashJoin" in _plan(joined), _plan(joined)
    finally:
        spark.sql("DROP TABLE IF EXISTS dim_stats_t")


def test_nested_schema_pruning_reads_one_field(spark, tmp_path):
    """Selecting one field of a struct column must prune the parquet
    ReadSchema to that field — a wide metadata struct costs nothing
    unless touched (how the multimodal tables keep decode metadata
    beside payloads for free)."""
    df = spark.range(100).select(
        F.col("id"),
        F.struct(
            (F.col("id") % 7).alias("keep_me"),
            F.concat(F.lit("x" * 50), F.col("id").cast("string")).alias(
                "heavy_payload_field"
            ),
        ).alias("meta"),
    )
    path = str(tmp_path / "nested")
    df.write.parquet(path)
    q = spark.read.parquet(path).select(
        "id", F.col("meta.keep_me").alias("k")
    )
    plan = _plan(q)
    read_schema = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "keep_me" in read_schema
    assert "heavy_payload_field" not in read_schema, read_schema
    assert q.where(F.col("k") == 3).count() > 0


def test_runtime_bloom_filter_join_pruning(spark, tmp_path):
    """Runtime bloom-filter join pruning (Spark 3.3+): a selective filter
    on one join side injects a bloom-filter semi-filter into the OTHER
    side's scan, so at 100 TB the big probe side drops non-matching rows
    before the shuffle. Thresholds are sized for clusters (10 GB scan
    floor), so the test lowers them to make the optimization observable
    on test data — the assertion is the mechanism, not the defaults."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, SF_DIR, "orders")
    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    li.write.parquet(fact_p)
    o.select("o_orderkey", "o_orderpriority").write.parquet(dim_p)
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # force a shuffle join: broadcast joins don't need the bloom filter
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        q = fact.join(dim, fact.l_orderkey == dim.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(q).lower()
        assert "bloomfilter" in plan or "might_contain" in plan, plan[:2000]
        rows = q.collect()
        assert len(rows) == 1 and rows[0]["n"] > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_split_fires(spark, tmp_path):
    """AQE skew-join handling: a heavily skewed join key must be split at
    runtime — the final adaptive plan marks SortMergeJoin(skew=true) with
    an 'AQEShuffleRead coalesced and skewed' on the hot side — instead of
    one reducer dragging the stage. Thresholds lowered to make the
    cluster-sized defaults observable on test data; rows padded so the
    hot partition clears the byte threshold."""
    import random

    rng = random.Random(5)
    # 95% of left rows share one key; right side is uniform
    left_rows = [
        (0 if rng.random() < 0.95 else rng.randrange(200), i, "x" * 50)
        for i in range(200_000)
    ]
    right_rows = [(k, f"d{k}") for k in range(200)]
    lp = str(tmp_path / "l")
    rp = str(tmp_path / "r")
    spark.createDataFrame(left_rows, ["k", "v", "pad"]).repartition(8).write.parquet(lp)
    spark.createDataFrame(right_rows, ["k", "d"]).write.parquet(rp)
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.join.preferSortMergeJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # the bare join: a downstream hash-partitioned agg would let AQE
        # decline the split (it would force an extra exchange); the split
        # decision is what this test pins
        q = spark.read.parquet(lp).join(spark.read.parquet(rp), "k")
        assert len(q.collect()) == 200_000  # executes q's own plan
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan  # AQEShuffleRead marks the split read
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
