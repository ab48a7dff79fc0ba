"""Partition-shape helpers.

Spark sizes scan partitions by BYTES (``spark.sql.files.maxPartitionBytes``,
default 128 MB), which is right for IO-bound plans but wrong for CPU-dense
narrow transforms over small-but-heavy rows: a 2 MB parquet of documents is
ONE split, so tokenize/shingle/hash pipelines run on one core of 32.
``spread`` fixes exactly that case and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Ensure at least ``target`` (default: cluster parallelism) partitions
    before a CPU-dense narrow stage (shingling, hashing, vector math).

    No-op when the input already has enough splits — the 100 TB case, where
    the scan yields thousands of partitions — so it never adds a shuffle at
    scale; it only unlocks idle cores on small inputs.
    """
    sc = df.sparkSession.sparkContext
    tgt = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < tgt:
        return df.repartition(tgt)
    return df
