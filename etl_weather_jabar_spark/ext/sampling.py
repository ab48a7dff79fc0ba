"""Deterministic, reproducible sampling for training-data pipelines.

A 100 TB corpus job cannot use ``df.sample()`` for train/test assignment:
the split must be (a) stable across reruns and cluster sizes, (b) a pure
per-row function (no shuffle, no state), and (c) auditable outside Spark.
Both operators here key every decision off an md5 of the row's stable id —
a narrow, JVM-side projection that composes with any downstream plan and
reproduces bit-for-bit in DuckDB/Python for verification.

Hex-prefix comparison gives the rate arithmetic: the first two md5 hex
chars are uniform over 256 buckets, so ``prefix < '<hh>'`` keeps exactly
int('<hh>', 16)/256 of rows in expectation, with membership decided by
content, not by RNG state. (Reference parity: the reference has no
sampling at all — this is a driver-mandated training-pipeline extension;
closest analogue is its hash-keyed dedup, transform_raw_weather.py:78-97.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, salt: str) -> Column:
    """Uniform 2-hex-char bucket ('00'..'ff') from a salted md5 of the key.

    The salt derives independent assignments from the same key (the split
    salt must differ from any sampling salt, or the two decisions
    correlate).
    """
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 2)


def _hex_thresh(rate: float) -> str:
    """Rate → 2-hex-char exclusive upper bound for the bucket comparison.

    Rate 1.0 would format as '100', which sorts BELOW 'ff' lexicographically
    ('1' < 'f') and would drop most rows — so full-keep returns a sentinel
    above every hex pair instead.
    """
    n = round(rate * 256)
    return "zz" if n >= 256 else format(n, "02x")


def hash_split(
    df: DataFrame,
    key: str | Column,
    *,
    salt: str = "split",
    train: float = 0.8,
    val: float = 0.1,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to train/val/test by hashed key — deterministic,
    shuffle-free, and stable under appends (new rows never move old rows
    between splits, unlike any fraction-of-count scheme).

    Rates are quantized to 1/256 (the two-hex-char resolution); the test
    share is the remainder.
    """
    if not 0 < train < 1 or val < 0 or train + val >= 1:
        raise ValueError("need 0 < train, 0 <= val, train + val < 1")
    key_col = F.col(key) if isinstance(key, str) else key
    b = _bucket(key_col, salt)
    t_hi = _hex_thresh(train)
    v_hi = _hex_thresh(train + val)
    assign = (
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out_col, assign)


def stratified_hash_sample(
    df: DataFrame,
    key: str | Column,
    stratum: str,
    rates: dict[str, float],
    *,
    salt: str = "sample",
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep a per-stratum fraction of rows, decided by hashed key — the
    deterministic form of ``sampleBy`` for corpus rebalancing (downsample
    the dominant language/source, keep the rare ones whole).

    ``rates`` maps stratum value → keep fraction (quantized to 1/256).
    A pure filter: no shuffle, pushes down past joins on the same table.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    b = _bucket(key_col, salt)
    thresh = F.lit(_hex_thresh(default_rate))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum) == value, F.lit(_hex_thresh(rate))
        ).otherwise(thresh)
    return df.where(b < thresh)


def weighted_sample(
    df: DataFrame,
    key: str | Column,
    weight_units: Column,
    k: int,
    *,
    salt: str = "wsample",
    tiebreak: str | Column | None = None,
) -> DataFrame:
    """Deterministic weight-proportional sample of ``k`` rows (priority
    sampling, Duffield/Lund/Thorup): each row gets priority ``w / u`` for a
    content-hashed uniform ``u``; the top-k priorities form the sample.
    Heavier rows are proportionally more likely in, yet membership is a
    pure function of content — stable across reruns and cluster layouts.

    The priority is computed as ``(w << 32) // u`` in exact integer
    arithmetic (``u`` = 32 bits of the salted md5, never zero), so any
    engine reproduces the exact same sample. ``weight_units`` must be a
    positive bigint with ``w < 2**20`` (keeps every intermediate under
    2**53, where the floor-division identity below is exact); scale
    accordingly. Top-k compiles to TakeOrderedAndProject (per-partition
    heaps + single merge — no global sort at 100 TB).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    tb = key_col if tiebreak is None else (
        F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    )
    a = weight_units.cast("bigint") * F.lit(2**32).cast("bigint")
    # exact floor division: (a - a mod u) / u — numerator and quotient both
    # < 2**53, so the double division is exact (same identity as
    # queries._half_up_div)
    priority = ((a - F.pmod(a, u)) / u).cast("bigint")
    return (
        df.withColumn("priority_units", priority)
        .orderBy(F.col("priority_units").desc(), tb)
        .limit(k)
    )


def weighted_sample_sql(
    key_expr: str, weight_expr: str, k: int, *, salt: str = "wsample"
) -> str:
    """DuckDB twin of :func:`weighted_sample`'s priority + order clause —
    returns the ``ORDER BY``-ready priority expression (exact integers)."""
    u = (
        f"(CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'), 1, 8) "
        f"AS BIGINT) + 1)"
    )
    return f"(CAST({weight_expr} AS BIGINT) * {2**32}) // {u}"


def split_sql(key_expr: str, *, salt: str = "split", train: float = 0.8, val: float = 0.1) -> str:
    """The DuckDB-equivalent CASE expression for :func:`hash_split` —
    letting the oracle (or any SQL engine) reproduce the assignment."""
    t_hi = _hex_thresh(train)
    v_hi = _hex_thresh(train + val)
    b = f"substr(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'), 1, 2)"
    return (
        f"CASE WHEN {b} < '{t_hi}' THEN 'train' "
        f"WHEN {b} < '{v_hi}' THEN 'val' ELSE 'test' END"
    )


def shuffle_shards(
    df: DataFrame,
    key: str | Column,
    n_shards: int,
    *,
    salt: str = "shard",
    out_col: str = "shard",
    hash_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic global shuffle + sharding for training exports: every
    row gets a shard id and a within-shard sort key, both pure functions of
    its stable id. Training runs want corpus order decorrelated from
    ingest order (adjacent crawl pages in one batch bias SGD), but
    ``orderBy(rand())`` is neither reproducible nor append-stable — this
    is, and any engine can audit the assignment from content alone.

    shard  = first 15 md5 hex digits (60 bits, fits bigint) mod n_shards;
    rank   = the full 32-hex digest — sorting a shard by it yields the
             same pseudo-random permutation on every run.

    The physical write is ``.repartition(n_shards, col(out_col))
    .sortWithinPartitions(hash_col)`` — one shuffle, each output file one
    shard, intra-file order deterministic. (Reference parity: none — the
    reference has no export path; driver-mandated training-pipeline
    extension alongside :func:`hash_split`.)
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key_col = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt)))
    num = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    return df.withColumn(hash_col, h).withColumn(
        out_col, F.pmod(num, F.lit(n_shards)).cast("int")
    )


def mixture_resample(
    df: DataFrame,
    stratum: str,
    weights: dict[str, int],
    key: str | Column,
    *,
    default_weight: int = 1,
    salt: str = "mixture",
) -> DataFrame:
    """Deterministic domain-mixture resampling: downsample strata so the
    kept corpus matches target proportions ``weights`` (integer weights;
    share of stratum s = w_s / Σw) — the domain-reweighting step in front
    of every large pretraining run (web vs books vs code mixing).

    The largest feasible corpus honoring the proportions without
    upsampling is T = min_s floor(n_s · Σw / w_s); each stratum keeps its
    first k_s = floor(w_s · T / Σw) rows in salted-md5 order (content-
    addressed, so the kept set is stable across reruns and engines —
    ties on the hash broken by the key itself).

    Plan shape: a tiny per-stratum count aggregate (rows = #strata) joined
    back broadcast, plus one rank window partitioned by stratum. The
    window is the only data-sized shuffle; at 100 TB with skewed strata
    the rank-within-stratum can swap in windows.scalable rank, same
    contract. All arithmetic is exact bigint (n·Σw stays far below 2^63).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    w_expr = F.lit(default_weight)
    for value, w in sorted(weights.items()):
        if w < 1:
            raise ValueError("weights must be positive integers")
        w_expr = F.when(F.col(stratum) == value, F.lit(w)).otherwise(w_expr)
    tagged = df.withColumn("__w", w_expr.cast("bigint"))
    stats = tagged.groupBy(stratum, "__w").agg(F.count(F.lit(1)).alias("__n"))
    # Σw must cover strata present in the data (declared or default)
    sum_w = stats.agg(F.sum("__w").alias("sw"))
    from pyspark.sql import Window

    wall = Window.partitionBy()
    def _floordiv(a, b):
        # exact bigint floor division over the full range (decimal divide —
        # a double '/' is only exact below 2^53)
        return (
            (a - F.pmod(a, b)).cast("decimal(38,0)") / b.cast("decimal(38,0)")
        ).cast("bigint")

    caps = (
        stats.crossJoin(F.broadcast(sum_w))
        .withColumn(
            "__t",
            F.min(
                _floordiv(F.col("__n") * F.col("sw"), F.col("__w"))
            ).over(wall),
        )
        .withColumn("__k", _floordiv(F.col("__w") * F.col("__t"), F.col("sw")))
        .select(stratum, "__k")
    )
    h = F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt)))
    wrank = Window.partitionBy(stratum).orderBy(h.asc(), key_col.asc())
    return (
        tagged.drop("__w")
        .withColumn("__rank", F.row_number().over(wrank))
        .join(F.broadcast(caps), on=stratum)
        .where(F.col("__rank") <= F.col("__k"))
        .drop("__rank", "__k")
    )


def shards_sql(key_expr: str, n_shards: int, *, salt: str = "shard") -> tuple[str, str]:
    """DuckDB twin of :func:`shuffle_shards` — (shard_expr, rank_expr)."""
    h = f"md5(CAST({key_expr} AS VARCHAR) || ':{salt}')"
    shard = f"CAST(CAST('0x' || substr({h}, 1, 15) AS BIGINT) % {n_shards} AS INTEGER)"
    return shard, h
