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


def _morton_interleave(bucket_exprs: list[str], bits: int, shl, shr) -> str:
    """Bit-interleave expression over pre-bucketed [0, 2^bits) columns.
    ``shl(x, n)`` / ``shr(x, n)`` render the engine's shift syntax, so one
    generator serves Spark SQL (shiftleft/shiftright) and DuckDB (<< >>)."""
    d = len(bucket_exprs)
    terms = []
    for i in range(bits):
        for j, b in enumerate(bucket_exprs):
            terms.append(shl(f"({shr(b, i)} & 1)", i * d + j))
    return "(" + " | ".join(terms) + ")"


def morton_sql_spark(bucket_exprs: list[str], bits: int) -> str:
    return _morton_interleave(
        bucket_exprs,
        bits,
        lambda x, n: f"shiftleft({x}, {n})",
        lambda x, n: f"shiftright({x}, {n})",
    )


def morton_sql_duckdb(bucket_exprs: list[str], bits: int) -> str:
    return _morton_interleave(
        bucket_exprs,
        bits,
        lambda x, n: f"(({x}) << {n})",
        lambda x, n: f"(({x}) >> {n})",
    )


def zorder_key(
    df: "DataFrame",
    cols: list[str],
    *,
    bits: int = 8,
    out_col: str = "zkey",
) -> "DataFrame":
    """Z-order (Morton) clustering key over 2+ integral columns — the
    multi-dimensional data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER):
    sort-by-zkey places rows close in EVERY dimension into the same file,
    so min/max file statistics prune scans on any of the columns, not just
    the leading sort key.

    Each column is min/max-scaled to a ``bits``-bit bucket in exact bigint
    arithmetic (one tiny bounds aggregate broadcast back — same pattern as
    mixture_resample's caps), then bucket bits are interleaved JVM-side.
    The physical write is ``repartitionByRange(out_col)`` +
    ``sortWithinPartitions(out_col)``: one shuffle, clustered files.
    Deterministic given the data (bounds are data-derived; freeze them for
    append-stable layouts).
    """
    from pyspark.sql import functions as F

    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit in a bigint")
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("bigint")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("bigint")).alias(f"__hi_{c}"))
    bounds = df.agg(*aggs)
    d = df.crossJoin(F.broadcast(bounds))
    bucket_exprs = [
        f"(((CAST(`{c}` AS BIGINT) - `__lo_{c}`) * {2 ** bits})"
        f" DIV (`__hi_{c}` - `__lo_{c}` + 1))"
        for c in cols
    ]
    z = morton_sql_spark(bucket_exprs, bits)
    return d.withColumn(out_col, F.expr(z).cast("bigint")).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )
