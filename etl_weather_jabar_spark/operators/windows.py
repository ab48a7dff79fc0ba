"""Window-function operators (SURVEY §2.5 W1-W2).

The reference has no window engine; these are its two windowed-in-disguise
computations, generalized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_first_rank(
    df: DataFrame, keys: list[str], order_by: list[str], rank_col: str = "rn"
) -> DataFrame:
    """W1: row_number over (partition by keys order by order_by)
    (transform_raw_weather.py:92-97's ids[1:] delete, as a rank)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    return df.withColumn(rank_col, F.row_number().over(w))


def stamp_group_flag(
    df: DataFrame, keys: list[str], flag: Column, flag_col: str
) -> DataFrame:
    """W2: a group-level boolean stamped on every member row — the reference's
    ``full_recap`` = "hour 23 present in this (date, location)"
    (daily_compile_weather.py:114-115,70)."""
    w = Window.partitionBy(*keys)
    return df.withColumn(flag_col, F.max(flag).over(w))


def _range_bucketed(
    df: DataFrame, order_cols: list[str], n: int
) -> DataFrame | None:
    """Assign an ordered range-bucket id ``__part`` computed FROM THE DATA
    (sampled quantile bounds of the leading order column), then ONE
    ``repartition(n, "__part")`` + local sort.

    Why not ``repartitionByRange`` + ``spark_partition_id()``: a window
    over the physical partition id needs ClusteredDistribution(__part),
    which RangePartitioning does not satisfy, so Catalyst inserts a
    SECOND full exchange + re-sort before the local window — at 100 TB
    that doubles the job's shuffle volume. A bucket id derived from the
    data makes the hash repartition itself the satisfying distribution:
    one shuffle, one sort (plan-asserted in tests).

    Bucket monotonicity is the only correctness requirement: bucket(x) ≤
    bucket(y) whenever x ≤ y in the total order. Counting strictly-smaller
    bounds of the LEADING column guarantees it (rows tying on the leading
    column stay in one bucket; bound quality affects only balance, never
    ranks; NULLs compare to bucket 0 = NULLS FIRST; NaN > all bounds =
    last bucket, matching Spark's sort order). Returns None when the
    leading column is non-numeric (approxQuantile cannot sample it) —
    callers fall back to the two-exchange form.
    """
    from pyspark.sql.types import NumericType

    first = order_cols[0]
    if n < 2:  # single bucket: nothing to split (and no quantiles to ask)
        return None
    if first not in df.columns or not isinstance(
        df.schema[first].dataType, NumericType
    ):
        return None
    from ..planmode import is_plan_only

    if is_plan_only():
        # representative bounds without the approxQuantile JOB: the plan
        # shape (bucket expr → one hash repartition → local sort) is
        # identical for any bound values; only balance would differ
        bounds = [float(i) for i in range(1, n)]
    else:
        qs = [i / n for i in range(1, n)]
        bounds = sorted(set(df.stat.approxQuantile(first, qs, 0.01)))
    if not bounds:
        return None  # empty input (or all-null col): nothing to split
    barr = F.array(*[F.lit(b) for b in bounds])
    bucket = F.size(F.filter(barr, lambda b: b < F.col(first)))
    return (
        df.withColumn("__part", bucket)
        .repartition(len(bounds) + 1, "__part")
        .sortWithinPartitions("__part", *order_cols)
    )


def global_rank_scalable(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    materialize: bool = True,
    reliable: bool = False,
) -> DataFrame:
    """Global row_number over a total order WITHOUT a single-reducer sort.

    ``Window.orderBy(...)`` with no partitionBy funnels every row through
    one task — the classic 100 TB cliff. This is the two-phase form:

    1. ordered range buckets (:func:`_range_bucketed`: data-derived bucket
       id → ONE shuffle + ONE local sort; falls back to
       ``repartitionByRange`` + ``spark_partition_id`` — two exchanges —
       when the leading order column is non-numeric);
    2. per-partition local ``row_number`` + the cumulative row count of all
       earlier buckets, added back via a broadcast join on bucket id (the
       count aggregation reuses the bucket exchange — ReusedExchange).

    The only driver-side data is the sampled split bounds and one row
    count per bucket. ``order_cols`` must be a TOTAL order (add a unique
    id as the last column) or ranks of ties are placement-dependent.

    ``materialize`` (optimization round 8): the input is consumed by at
    least TWO actions — the approxQuantile bound-sampling job and the
    ranked plan itself (``scalable_ntile`` adds a third, the total
    count) — so by default the input is checkpointed ONCE at entry
    instead of re-executing its whole upstream per consumer (for
    ppl_bucket_split the upstream is the full bigram-LM scoring
    pipeline: measured 6.6 s → ~2 s at sf0.1). Callers that already
    materialized the frame pass ``materialize=False``; identity in
    plan-only mode, like every checkpoint. ``reliable=True`` switches
    the materialization to a DISK_ONLY persist with lineage kept
    (planmode.checkpoint) — the shape for a CORPUS-sized input on a
    real cluster, where an unreplicated localCheckpoint block lost with
    its executor would kill the query (round-8 advisor).
    """
    from ..planmode import checkpoint

    if materialize:
        df = checkpoint(df, reliable=reliable)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    parted = _range_bucketed(df, order_cols, n)
    if parted is None:
        parted = (
            df.repartitionByRange(n, *cols)
            .sortWithinPartitions(*cols)
            .withColumn("__part", F.spark_partition_id())
        )
    # local rank FIRST (distribution + ordering already satisfied: no new
    # exchange, no new sort), broadcast offsets joined after
    w_local = Window.partitionBy("__part").orderBy(*cols)
    local = parted.withColumn("__lr", F.row_number().over(w_local))
    counts = parted.groupBy("__part").count()
    # cumulative count EXCLUSIVE of the current bucket, WITHOUT a Window:
    # even over this |buckets|-row frame an unpartitioned Window trips
    # Spark's single-partition WindowExec warning, so the exclusive
    # prefix sum is a strict-< triangular broadcast self-join instead
    # (|buckets|² pairs of longs — driver-tiny at any realistic bucket
    # count, and the plan carries zero Window operators)
    earlier = counts.select(
        F.col("__part").alias("__p2"), F.col("count").alias("__c2")
    )
    offsets = (
        counts.join(
            F.broadcast(earlier), F.col("__p2") < F.col("__part"), "left"
        )
        .groupBy("__part")
        .agg(F.coalesce(F.sum("__c2"), F.lit(0)).alias("__off"))
    )
    return (
        local.join(F.broadcast(offsets), on="__part")
        .withColumn(rank_col, F.col("__lr") + F.col("__off"))
        .drop("__part", "__off", "__lr")
    )


def scalable_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str | list[str],
    out_col: str | list[str] = "prefix_sum",
    exclusive: bool = False,
    num_partitions: int | None = None,
    materialize: bool = True,
    reliable: bool = False,
) -> DataFrame:
    """Global running sum of ``value_col`` over a total order WITHOUT the
    single-reducer global window — same two-phase shape as
    :func:`global_rank_scalable`:

    1. range-partition + sort within partitions on ``order_cols``;
    2. per-partition totals → exclusive offsets (|partitions| rows, tiny),
       broadcast back; running sum = local window cumsum + offset.

    ``exclusive=True`` yields the sum of all STRICTLY-earlier rows (0 for
    the first row) — the form sequence packing needs. ``order_cols`` must
    be a total order or the cumsum is placement-dependent. Uses the same
    one-shuffle ordered bucketing as :func:`global_rank_scalable`
    (:func:`_range_bucketed`), falling back to two exchanges for
    non-numeric leading order columns.

    ``value_col``/``out_col`` accept LISTS to carry several measures
    through ONE bucketing: a multi-measure CDF (e.g. the two-sample KS
    statistic) pays one quantile sample, one shuffle, and one sort
    instead of chaining a full pass per measure.

    The cross-bucket offsets are summed UNORDERED (triangular join, not
    an ordered Window) — exact for integer/decimal measures (every
    engine call site); double measures could differ in the last ulp
    from a sequential sum and belong in integer units first anyway.
    """
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    ocols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(vcols) != len(ocols):
        raise ValueError("value_col and out_col lengths differ")
    # out_cols must not collide: a duplicate out_col, or an out_col equal
    # to a value/order column, would be overwritten mid-loop and the
    # exclusive-mode subtraction F.col(v) would read the replaced column
    if len(set(ocols)) != len(ocols):
        raise ValueError(f"scalable_prefix_sum: duplicate out_cols {ocols}")
    clash = set(ocols) & (set(vcols) | set(order_cols))
    if clash:
        raise ValueError(
            f"scalable_prefix_sum: out_cols collide with value/order cols: "
            f"{sorted(clash)}"
        )
    from ..planmode import checkpoint

    # same two-consumer shape as global_rank_scalable (quantile sampling
    # + the main plan): materialize the input once by default;
    # reliable=True for corpus-sized inputs (see global_rank_scalable)
    if materialize:
        df = checkpoint(df, reliable=reliable)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    parted = _range_bucketed(df, order_cols, n)
    if parted is None:
        parted = (
            df.repartitionByRange(n, *cols)
            .sortWithinPartitions(*cols)
            .withColumn("__part", F.spark_partition_id())
        )
    sums = parted.groupBy("__part").agg(
        *[F.sum(v).alias(f"__s{i}") for i, v in enumerate(vcols)]
    )
    # exclusive prefix totals per bucket WITHOUT a Window (same strict-<
    # triangular broadcast self-join as global_rank_scalable: no
    # single-partition WindowExec, identical arithmetic)
    earlier = sums.select(
        F.col("__part").alias("__p2"),
        *[F.col(f"__s{i}").alias(f"__t{i}") for i in range(len(vcols))],
    )
    offsets = (
        sums.join(
            F.broadcast(earlier), F.col("__p2") < F.col("__part"), "left"
        )
        .groupBy("__part")
        .agg(
            *[
                F.coalesce(F.sum(f"__t{i}"), F.lit(0)).alias(f"__off{i}")
                for i in range(len(vcols))
            ]
        )
    )
    # local cumsum BEFORE the join (distribution + ordering satisfied on
    # parted directly: no extra exchange or sort), offsets added after
    w_local = (
        Window.partitionBy("__part")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parted
    for i, v in enumerate(vcols):
        local = local.withColumn(f"__run{i}", F.sum(v).over(w_local))
    out = local.join(F.broadcast(offsets), on="__part")
    drops = ["__part"]
    for i, (v, oc) in enumerate(zip(vcols, ocols)):
        run = F.col(f"__run{i}") + F.col(f"__off{i}")
        if exclusive:
            run = run - F.col(v)
        out = out.withColumn(oc, run)
        drops += [f"__off{i}", f"__run{i}"]
    return out.drop(*drops)


def scalable_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
    keep_rank_col: str | None = None,
    materialize: bool = True,
    reliable: bool = False,
) -> DataFrame:
    """Global ``ntile(n)`` without the single-reducer sort, via
    :func:`global_rank_scalable` + the exact SQL tile arithmetic.

    SQL ntile semantics: with total rows T, q = T//n, r = T%n, the first r
    tiles hold q+1 rows and the rest q. Closed form from the global rank —
    the only extra job is one count. Same total-order requirement on
    ``order_cols`` as the rank. ``keep_rank_col`` retains the global rank
    under that name, from which the other distribution functions derive
    for free on a TOTAL order (no ties): cume_dist = rank/T,
    percent_rank = (rank-1)/(T-1)."""
    from ..planmode import checkpoint, is_plan_only

    # ntile consumes the input THREE times (quantile sampling, the ranked
    # plan, and the total count): materialize once here and tell the rank
    # helper not to re-checkpoint
    if materialize:
        df = checkpoint(df, reliable=reliable)
    ranked = global_rank_scalable(
        df, order_cols, "__grank", num_partitions, materialize=False
    )
    # plan-only mode never runs jobs: a representative total keeps the
    # tile arithmetic shape without a count action. max(100, n) so the
    # audited plan always takes the GENERAL q >= 1 tile branch — with a
    # bare 100 a call with n > 100 tiles would audit the degenerate
    # tile == rank branch, a different plan shape than what executes
    # (round-8 advisor).
    total = max(100, n) if is_plan_only() else df.count()
    q, r = divmod(total, n)
    rank = F.col("__grank")
    if q == 0:
        # fewer rows than tiles: tile == rank (SQL behavior)
        out = ranked.withColumn(tile_col, rank.cast("int"))
    else:
        big = r * (q + 1)  # rows living in the (q+1)-sized tiles
        tile = F.when(
            rank <= F.lit(big), F.ceil(rank / F.lit(q + 1))
        ).otherwise(F.lit(r) + F.ceil((rank - F.lit(big)) / F.lit(q)))
        out = ranked.withColumn(tile_col, tile.cast("int"))
    if keep_rank_col is not None:
        return out.withColumnRenamed("__grank", keep_rank_col)
    return out.drop("__grank")


def exact_rank_rows(
    df: DataFrame,
    order_cols: list[str],
    ranks: list[int],
    sort_budget: int = 200_000,
) -> list:
    """EXACT rows at the given global 1-based ranks of the total order
    ``order_cols`` — distributed selection, no global sort:

    1. sampled quantile bounds on the leading order column narrow each
       target rank to ONE bucket (a histogram aggregate whose shuffle is
       bucket-count-sized);
    2. only target buckets are touched further; a bucket above
       ``sort_budget`` rows is re-split recursively (finer quantiles;
       when the leading column is single-valued in the bucket the NEXT
       order column takes over — the total order guarantees progress);
    3. a bucket within budget is sorted once and answers all its targets
       (narrow projection: only ``order_cols`` ride the jobs).

    Driver cost: one ≤ sort_budget narrow collect per leaf bucket +
    bucket histograms; ``sort_budget`` is the memory/exchange dial at
    100 TB. Selection jobs run OUTSIDE the caller's plan (like
    approxQuantile), so operators built on the returned boundary rows —
    :func:`ntile_by_boundaries` — add ZERO exchanges to the data path.
    Ranks must be within [1, |df|]; ``order_cols`` must be a total order
    with numeric columns (quantile sampling).
    """
    sub = df.select(*order_cols)
    want = sorted({int(k) for k in ranks})
    if not want:
        return []
    found: dict[int, tuple] = {}

    def solve(part: DataFrame, targets: list[int], col_idx: int) -> None:
        # targets are 1-based ranks WITHIN part, paired with their
        # global rank for the output dict
        cnt = part.count()
        if cnt <= sort_budget or col_idx >= len(order_cols):
            # the guard must fire BEFORE the collect: an un-splittable
            # leaf above budget means order_cols is not a usable total
            # order, and pulling it to the driver first would be the
            # exact oversized pull the budget exists to prevent
            if cnt > sort_budget:
                raise ValueError(
                    "exact_rank_rows: order_cols is not a usable total "
                    f"order ({cnt} indistinguishable rows exceed "
                    f"sort_budget={sort_budget})"
                )
            rows = part.orderBy(*[F.col(c) for c in order_cols]).collect()
            for lr, gr in targets:
                found[gr] = tuple(rows[lr - 1])
            return
        lead = order_cols[col_idx]
        n_b = max(8, part.sparkSession.sparkContext.defaultParallelism)
        qs = [i / n_b for i in range(1, n_b)]
        bounds = sorted(set(part.stat.approxQuantile(lead, qs, 0.01)))
        if not bounds:
            solve(part, list(targets), col_idx + 1)
            return
        barr = F.array(*[F.lit(b) for b in bounds])
        bexp = F.size(F.filter(barr, lambda b: b < F.col(lead)))
        hist = {
            r["__b"]: r["c"]
            for r in part.groupBy(bexp.alias("__b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        cum, starts = 0, {}
        for b in sorted(hist):
            starts[b] = cum
            cum += hist[b]
        by_bucket: dict[int, list[tuple[int, int]]] = {}
        for lr, gr in targets:
            for b in sorted(hist):
                if lr <= starts[b] + hist[b]:
                    by_bucket.setdefault(b, []).append((lr - starts[b], gr))
                    break
        single = len(hist) == 1
        for b, tg in by_bucket.items():
            child = part.where(bexp == F.lit(b))
            # a split that didn't split (all rows one bucket) means the
            # leading column is effectively constant here → next column
            solve(child, tg, col_idx + 1 if single else col_idx)

    solve(sub, [(k, k) for k in want], 0)
    return [found[int(k)] for k in ranks]


def ntile_by_boundaries(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    tile_col: str = "tile",
    total: int | None = None,
    sort_budget: int = 200_000,
) -> DataFrame:
    """Global ``ntile(n)`` as a PURE COLUMN EXPRESSION — zero exchanges
    in the caller's plan (round-5 verdict item 6; the form
    rfm_segment_counts uses so its three differently-ordered quartiles
    add no shuffle at all, where even the two-phase
    :func:`scalable_ntile` pays one exchange per measure).

    SQL ntile semantics (first ``T % n`` tiles hold ``T//n + 1`` rows)
    fix the n−1 boundary RANKS up front; :func:`exact_rank_rows` selects
    those boundary rows exactly, and the tile of any row is then
    ``1 + #{boundaries strictly below it}`` in the total order — a
    lexicographic comparison against n−1 row literals. Selection jobs
    run outside the plan, like approxQuantile (placeholder boundaries in
    plan-only mode — the expression shape is identical for any values).
    ``order_cols`` must be a total order; pass ``total`` to share one
    count across measures."""
    from ..planmode import is_plan_only

    if is_plan_only():
        tile = F.lit(1)
        for j in range(1, n):
            cond = F.lit(False)
            for i in range(len(order_cols) - 1, -1, -1):
                c = F.col(order_cols[i])
                cond = (c > F.lit(j)) | ((c == F.lit(j)) & cond)
            tile = tile + cond.cast("int")
        return df.withColumn(tile_col, tile.cast("int"))
    T = total if total is not None else df.count()
    if T == 0:
        return df.withColumn(tile_col, F.lit(None).cast("int"))
    q, r = divmod(T, n)
    if q == 0:
        # fewer rows than tiles: tile == rank (SQL behavior) — tiny input,
        # the two-phase rank is already cheap
        return scalable_ntile(df, order_cols, n, tile_col)
    sizes = [q + 1 if j < r else q for j in range(n)]
    b_ranks, cum = [], 0
    for s in sizes[:-1]:
        cum += s
        b_ranks.append(cum)
    brows = exact_rank_rows(df, order_cols, b_ranks, sort_budget)

    def after(brow) -> F.Column:
        # strictly-greater lexicographic compare against the boundary
        # row with SQL sort semantics: NULLS FIRST (a NULL cell is
        # smaller than every value, equal to another NULL). A naive
        # (c > v) comparison returns NULL for NULL cells and would
        # poison the tile into NULL where native ntile assigns tile 1.
        cond = F.lit(False)
        for i in range(len(order_cols) - 1, -1, -1):
            c = F.col(order_cols[i])
            v = brow[i]
            if v is None:
                gt = c.isNotNull()  # any value > NULL
                eq = c.isNull()
            else:
                gt = F.coalesce(c > F.lit(v), F.lit(False))  # NULL ≯ v
                eq = c.eqNullSafe(F.lit(v))
            cond = gt | (eq & cond)
        return cond

    tile = F.lit(1)
    for brow in brows:
        tile = tile + after(brow).cast("int")
    return df.withColumn(tile_col, tile.cast("int"))


def scalable_topk_per_group(
    df: DataFrame,
    keys: list[str],
    order_by: list,
    k: int,
    *,
    salt_by: list[str] | None = None,
    buckets: int = 32,
    rank_col: str = "rnk",
) -> DataFrame:
    """Per-group top-k that survives a skewed group — the two-phase form
    of ``row_number().over(partitionBy(keys))``.

    A single window sends EVERY row of a group through one reducer; one
    viral key at 100 TB makes that a straggler. Phase 1 salts the
    partition with a hash of the order columns (``buckets`` ways) and
    keeps a local top-k per (key, salt) — the survivor set is ≤ buckets·k
    rows per group however large the group. Phase 2 re-ranks only the
    survivors on the true key. Both phases are plain windows; the result
    is EXACTLY the plain window's (order must be total — include a unique
    tiebreaker, same contract as keep_first_rank).

    ``salt_by`` names the plain columns hashed into the salt (default: the
    string entries of ``order_by``); it must spread rows WITHIN a group —
    the unique tiebreaker column is the safe choice. Sort-order
    expressions (``.desc()``) can't be hashed, hence the separate knob.
    """
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    salt_cols = salt_by or [c for c in order_by if isinstance(c, str)]
    if not salt_cols:
        raise ValueError("salt_by required when order_by has no plain names")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    w_local = Window.partitionBy(*keys, "__salt").orderBy(*order_cols)
    w_final = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__salt", salt)
        .withColumn("__lr", F.row_number().over(w_local))
        .where(F.col("__lr") <= k)
        .withColumn(rank_col, F.row_number().over(w_final))
        .where(F.col(rank_col) <= k)
        .drop("__salt", "__lr")
    )
