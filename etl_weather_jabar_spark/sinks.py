"""Sinks: append, keyed-dedup append, partition-overwrite upsert.

Maps the reference's Mongo write modes (SURVEY §2.1 S5-S8):

* ``insert_one/insert_many``            → :func:`append`
* unique index + duplicate-key-tolerant
  insert (transform_raw_weather.py:62-76,107-111, ST4) → :func:`append_dedup_keyed`
* ``update_one($set) else insert_one``
  keyed upsert (daily_compile_weather.py:136-142, S6)  → :func:`upsert_by_partition`
* ``delete_many({})`` truncate (init_master_location.py:20, S8) → :func:`overwrite`

Spark has no unique constraints, so uniqueness is enforced *on write*
(dedup against both the incoming batch and the existing sink contents) —
an anti-join, never a driver-side ``$nin`` list (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def overwrite(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


# Formats beyond parquet (SURVEY §2.1 S3: the reference also moves JSON
# between stages; ORC is Spark's other native columnar format). Parquet
# stays the default everywhere — these exist so a reference user's JSON
# hand-offs and any ORC estate keep working unchanged.
_FORMATS = ("parquet", "orc", "json", "csv")


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", *, mode: str = "overwrite"
) -> None:
    """Write in any supported format. JSON/CSV are row formats: no column
    pruning, no predicate pushdown, heavier bytes — interchange only,
    never the analytical store."""
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    w.save(path)


def read_table_fmt(spark, path: str, fmt: str = "parquet", schema=None) -> DataFrame:
    """Read any supported format. Pass an explicit ``schema`` for the row
    formats — schema inference costs an extra full scan AND degrades
    types (JSON has no timestamp/decimal; CSV has no types at all), the
    same trap sources/jsonsrc.py documents for the reference's inputs."""
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("json", "csv"):
        r = r.option("inferSchema", True)
    if fmt == "csv":
        r = r.option("header", True)
    return r.load(path)


def append_dedup_keyed(
    df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str = "_id",
) -> None:
    """Append only rows whose key is new — the unique-index semantic (ST4).

    Within the incoming batch, keep-first by ``order_col`` (matches the
    reference's insertion-order survivor, transform_raw_weather.py:92-97);
    against the existing sink, left-anti on the key columns.

    Scale: the anti-join's build side is only the key columns of the sink
    (column-pruned scan); at 100 TB the sink should be partitioned by a
    time column so the anti-join probes only the affected partitions.
    """
    from .operators.dedup import dedupe_keep_first

    batch = dedupe_keep_first(df, keys, order_by=[order_col])
    spark = df.sparkSession
    try:
        existing = spark.read.parquet(path).select(*keys)
    except Exception:  # first write: sink does not exist yet
        batch.write.mode("append").parquet(path)
        return
    batch.join(existing, on=keys, how="left_anti").write.mode("append").parquet(path)


def upsert_by_partition(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dedup_keys: list[str] | None = None,
) -> None:
    """Idempotent keyed upsert via dynamic partition overwrite (S6).

    The reference upserts Gold docs keyed (date, location_id)
    (daily_compile_weather.py:136-142). Here: partition by ``date`` and
    dynamically overwrite only the partitions present in ``df`` — replaying a
    day is idempotent. Granularity is the partition (date), coarser than the
    reference's (date, location) key; ``dedup_keys`` guarantees one row per
    key within the rewritten partition (documented divergence, SURVEY §7.2).
    """
    out = df.dropDuplicates(dedup_keys) if dedup_keys else df
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def quarantine_split(
    df: DataFrame, good_predicate, quarantine_path: str | None = None
) -> DataFrame:
    """P10 error-row rejection (fetch_weather.py:60-62,131-133): rows failing
    the predicate go to a quarantine sink (if given); clean rows flow on."""
    bad = df.where(~good_predicate)
    if quarantine_path is not None:
        bad.write.mode("append").parquet(quarantine_path)
    return df.where(good_predicate)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the co-located-join layout.

    Bucketing hash-partitions rows into ``num_buckets`` files per partition
    at WRITE time; two tables bucketed on the same key with the same count
    join with NO shuffle on either side (Spark trusts the on-disk hash
    layout), and ``sort_cols`` pre-sorts within buckets so even the sort of
    a sort-merge join is free. This is the Spark answer to the reference's
    unique indexes (SURVEY §2.1 S9) for the read path, and the single
    biggest shuffle saver for repeated fact⋈fact joins at 100 TB: pay one
    shuffle at write, join for free forever after.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def compact(
    spark,
    path: str,
    target_file_mb: int = 128,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files sized
    for efficient scans, returning the new file count.

    Micro-batch sinks (the reference appends 27 docs every 10 minutes —
    SURVEY §2.1 S5) accrete thousands of KB-sized files; at 100 TB that
    means listing/open overhead dominating scan time and task counts in
    the millions. Compaction reads the dataset once, coalesces to
    ceil(bytes / target) files (repartition — a shuffle — when partition
    columns are given, so each output partition dir gets its own right-
    sized files), and atomically replaces via overwrite. Run it as the
    maintenance companion of append sinks, off the query path.
    """
    import math
    import os

    size = 0
    for root, _dirs, files in os.walk(path):
        size += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.repartition(n_files, *partition_cols) if partition_cols else df.coalesce(n_files)
    tmp = path.rstrip("/") + ".compact.tmp"
    w = out.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def optimize_zorder(
    spark,
    path: str,
    zorder_cols: list[str],
    n_files: int = 8,
    bits: int = 8,
    bounds_path: str | None = None,
) -> int:
    """OPTIMIZE-style table maintenance: rewrite a parquet dataset
    Z-order-clustered on ``zorder_cols`` into ``n_files`` right-sized
    files (compaction + multi-dimensional clustering in one pass — the
    Delta/Iceberg ``OPTIMIZE ... ZORDER BY`` shape).

    Plan: compute the Morton key (operators/partitioning.py::zorder_key),
    ``repartitionByRange`` on it (range partitioner samples split points
    → balanced files), sort within partitions, drop the key, atomically
    swap via the same tmp-rename as :func:`compact`. After the rewrite
    every file's min/max stats are narrow in EVERY z-ordered column, so
    scans filtering on any of them skip most files — the test measures
    exactly that via the `_metadata` file column.

    With ``bounds_path`` the layout is APPEND-STABLE: the first OPTIMIZE
    computes the per-column min/max and persists it there; every later
    OPTIMIZE (and :func:`append_zordered`) reuses the frozen bounds, so a
    value buckets identically across rewrites and incremental appends —
    re-clustering never reshuffles rows merely because the corpus
    min/max drifted.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    from .operators.partitioning import (
        compute_zorder_bounds,
        load_zorder_bounds,
        save_zorder_bounds,
        zorder_key,
    )

    df = spark.read.parquet(path)
    bounds = None
    if bounds_path is not None:
        try:
            bounds = load_zorder_bounds(spark, bounds_path)
        except Exception:
            bounds = compute_zorder_bounds(df, zorder_cols)
            save_zorder_bounds(spark, bounds, bounds_path)
    z = zorder_key(df, zorder_cols, bits=bits, bounds=bounds)
    tmp = path.rstrip("/") + ".zorder.tmp"
    (
        z.repartitionByRange(n_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def append_zordered(
    df,
    path: str,
    zorder_cols: list[str],
    bounds_path: str,
    n_files: int = 1,
    bits: int = 8,
) -> None:
    """Incremental write into a z-ordered table WITHOUT a full rewrite:
    cluster the new batch by the table's FROZEN bounds (``bounds_path``
    from :func:`optimize_zorder`) and append. Because the bucketing is
    bounds-stable, the new files' min/max stats line up with the existing
    layout — pruning quality degrades only with file count, which the
    periodic :func:`compact` / :func:`optimize_zorder` pass restores.
    Out-of-range values clamp into edge buckets (stats remain valid).
    """
    from pyspark.sql import functions as F

    from .operators.partitioning import load_zorder_bounds, zorder_key

    bounds = load_zorder_bounds(df.sparkSession, bounds_path)
    z = zorder_key(df, zorder_cols, bits=bits, bounds=bounds)
    (
        z.repartitionByRange(n_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("append")
        .parquet(path)
    )
