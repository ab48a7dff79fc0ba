"""Join operators (SURVEY §2.3 J1-J4).

Every join here is written so Catalyst picks the right physical strategy:

* J1 dimension lookups get an explicit ``F.broadcast`` hint (27-row dim in
  the reference; any dim ≪ executor memory at 100 TB).
* J2/J3 incremental anti-joins are ``left_anti`` — never a collected id list
  shipped back into a predicate (the reference's ``$nin`` anti-pattern,
  SURVEY §4.2).
* J4 grid alignment generates the dimension WITH Spark (``sequence`` +
  ``explode``) so the grid side is tiny and broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """J1: broadcast lookup join against a small dimension
    (daily_compile_weather.py:25-30 builds a dict; :132 probes it)."""
    return fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], how)


def broadcast_if_small(
    df: DataFrame, *, max_rows: int = 2_000_000, persist: bool = False
) -> DataFrame:
    """Broadcast hint GUARDED by a bounded size probe (round-5 verdict
    item 7): vocabulary-bounded frames (unigram counts, BPE symbol
    tables) are broadcast-sized for every real corpus, but "bounded by
    the vocabulary" is not "bounded, period" — a web-scale token
    universe (OCR noise, URLs, code) can grow past driver memory, and
    an unconditional ``F.broadcast`` would then OOM the DRIVER, the one
    component a 1000-executor job cannot lose.

    The probe is ``limit(max_rows + 1).count()`` — one bounded extra
    job over the (already partial-aggregated) frame, never a collect.
    At or under ``max_rows`` (default 2M rows ≈ tens of MB serialized:
    comfortably under a 1-2 GB driver budget, far over any natural
    language's vocabulary) the hint is applied; past it the frame is
    returned unhinted and Catalyst plans a shuffle join — same results,
    certified by the adversarial-conf oracle pass which disables
    broadcast entirely.

    ``persist=True`` caches the frame (MEMORY_AND_DISK, evictable)
    before probing — for vocabularies with EXPENSIVE lineage (a trained
    BPE symbol table) where re-running the training chain for the probe
    would double the query; cheap one-scan counts skip it. No explicit
    unpersist: the frame is query-local, so the ContextCleaner reclaims
    the blocks once the driver garbage-collects the DataFrame.

    Plan-only mode applies the hint without probing (no jobs at
    construction — the audited plan keeps its intended shape).
    """
    from ..planmode import is_plan_only

    if is_plan_only():
        return F.broadcast(df)
    if persist:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if df.limit(max_rows + 1).count() <= max_rows:
        return F.broadcast(df)
    return df


def anti_join_unprocessed(
    raw: DataFrame, processed: DataFrame, on: str | list[str] = "_id"
) -> DataFrame:
    """J2: incremental "unprocessed rows" anti-join
    (dags/spark/transform_raw_weather.py:89-91 does this with $nin)."""
    keys = [on] if isinstance(on, str) else on
    return raw.join(processed.select(*keys), on=keys, how="left_anti")


def anti_join_composite(
    incoming: DataFrame, existing: DataFrame, keys: list[str]
) -> DataFrame:
    """J3: late-data dedup on fetch — skip rows whose (location_id, time)
    already landed (fetch_weather.py:100-106 builds a {loc: [times]} map;
    :76-77 probes it)."""
    return incoming.join(existing.select(*keys), on=keys, how="left_anti")


def minute_grid(spark, start: int = 0, stop: int = 50, step: int = 10) -> DataFrame:
    """The generated 6-slot 10-minute dimension (daily_compile_weather.py:36).
    ``sequence``+``explode`` keeps generation distributed and the result tiny.
    """
    return spark.range(1).select(
        F.explode(F.sequence(F.lit(start), F.lit(stop), F.lit(step))).alias("m")
    ).select(F.format_string("%02d", F.col("m")).alias("minute"))


def salted_join(
    fact: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: split each hot join key across ``buckets``
    sub-keys.

    The fact side gets a deterministic per-row salt (hash of ALL its columns
    mod buckets — uniform even when the join key itself is degenerate); the
    other side is replicated once per salt value. Join runs on
    (key…, salt), so a key holding 30% of the fact lands on ``buckets``
    reducers instead of one.

    When to reach for this at 100 TB: AQE's skew-join split
    (spark.sql.adaptive.skewJoin) already rebalances sort-merge joins at
    runtime — prefer it. Salting is for the cases AQE can't touch: the
    replicated side too big to broadcast but needed on every salt, skewed
    LEFT joins where the hot key must stay together downstream, or engines/
    paths with AQE off. Cost: other side inflated ×buckets — keep it the
    small side.

    Result equals ``fact.join(other, on, how)`` row-for-row (verified in
    tests); only the physical key space changes. Supports inner/left —
    fact-side-preserving joins where replication can't invent matches.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(buckets))
    fact_s = fact.withColumn("__salt", salt)
    other_s = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return fact_s.join(other_s, on=[*on, "__salt"], how=how).drop("__salt")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right row
    (per ``on`` keys) with ``right_ts <= left_ts``.

    Spark has no ASOF JOIN; the scalable form is union both sides + one
    running ``last(..., ignorenulls)`` window per carried column — ONE
    shuffle on the key, no per-row range scan, no candidate explosion, any
    key cardinality. At equal timestamps the right row sorts first, so a
    same-instant match counts. ``tolerance_seconds`` nulls out matches
    older than the window (pandas merge_asof semantics).
    """
    carried = right_cols or [c for c in right.columns if c not in (*on, right_ts)]
    l_tag = left.withColumn("__is_left", F.lit(True)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_tag = (
        right.select(*on, right_ts, *carried)
        .withColumn("__is_left", F.lit(False))
        .withColumn("__ts", F.col(right_ts))
    )
    both = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = both
    src = F.when(~F.col("__is_left"), F.col("__ts"))
    out = out.withColumn("__asof_ts", F.last(src, ignorenulls=True).over(w))
    for c in carried:
        out = out.withColumn(
            c,
            F.last(F.when(~F.col("__is_left"), F.col(c)), ignorenulls=True).over(w),
        )
    out = out.where(F.col("__is_left"))
    if tolerance_seconds is not None:
        fresh = (
            F.col("__ts").cast("timestamp").cast("long")
            - F.col("__asof_ts").cast("timestamp").cast("long")
            <= tolerance_seconds
        )
        for c in carried:
            out = out.withColumn(c, F.when(fresh, F.col(c)))
        out = out.withColumn("__asof_ts", F.when(fresh, F.col("__asof_ts")))
    return out.withColumnRenamed("__asof_ts", "asof_ts").drop(
        "__is_left", "__ts"
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row (per
    ``on`` keys) with ``right_ts >= left_ts`` — the mirror of
    :func:`asof_join_backward` ("what happened next"), same scalable
    shape: union + one running ``first(..., ignorenulls)`` over the
    forward frame, ONE shuffle on the key. Left rows sort before right
    rows at equal timestamps, so a same-instant match counts.
    ``tolerance_seconds`` nulls out matches further ahead than the
    window."""
    carried = right_cols or [c for c in right.columns if c not in (*on, right_ts)]
    l_tag = left.withColumn("__is_left", F.lit(True)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_tag = (
        right.select(*on, right_ts, *carried)
        .withColumn("__is_left", F.lit(False))
        .withColumn("__ts", F.col(right_ts))
    )
    both = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = both
    src = F.when(~F.col("__is_left"), F.col("__ts"))
    out = out.withColumn("__asof_ts", F.first(src, ignorenulls=True).over(w))
    for c in carried:
        out = out.withColumn(
            c,
            F.first(F.when(~F.col("__is_left"), F.col(c)), ignorenulls=True).over(w),
        )
    out = out.where(F.col("__is_left"))
    if tolerance_seconds is not None:
        fresh = (
            F.col("__asof_ts").cast("timestamp").cast("long")
            - F.col("__ts").cast("timestamp").cast("long")
            <= tolerance_seconds
        )
        for c in carried:
            out = out.withColumn(c, F.when(fresh, F.col(c)))
        out = out.withColumn("__asof_ts", F.when(fresh, F.col("__asof_ts")))
    return out.withColumnRenamed("__asof_ts", "asof_ts").drop(
        "__is_left", "__ts"
    )


def range_join_bucketed(
    fact: DataFrame,
    intervals: DataFrame,
    fact_day: str,
    start_day: str,
    end_day_excl: str,
    bucket_days: int = 7,
) -> DataFrame:
    """Range (interval) join as a bucketed equi-join.

    Spark plans a raw ``f.ts >= i.start AND f.ts < i.end`` join as
    BroadcastNestedLoop (fine only while one side broadcasts). The scalable
    form: quantize time into ``bucket_days`` buckets, explode each interval
    over the buckets it touches, equi-join fact.bucket == interval.bucket
    (hash join, uniform keys), then apply the exact range predicate.
    Each fact row joins at most the intervals overlapping its bucket —
    replication factor = avg interval span / bucket size + 1.

    All three day columns are integer day numbers (e.g. ``datediff`` from
    epoch); ``end_day_excl`` is exclusive.
    """
    i_b = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_day) / bucket_days),
                F.floor((F.col(end_day_excl) - 1) / bucket_days),
            )
        ),
    )
    f_b = fact.withColumn("__bucket", F.floor(F.col(fact_day) / bucket_days))
    return (
        f_b.join(i_b, on="__bucket")
        .where(
            (F.col(fact_day) >= F.col(start_day))
            & (F.col(fact_day) < F.col(end_day_excl))
        )
        .drop("__bucket")
    )


def grid_align(
    obs: DataFrame,
    grid: DataFrame,
    group_keys: list[str],
    grid_key: str = "minute",
) -> DataFrame:
    """J4: left-join observations onto the fixed grid so missing slots become
    all-null rows (daily_compile_weather.py:34-58 does this with a linear
    ``next()`` scan per slot — O(slots×rows); this is the hash-join form).

    The grid side is ``group_keys × grid`` built by cross-joining the distinct
    group keys (small: dates × locations) with the 6-row grid, then
    broadcast-left-joined by Catalyst (both sides of the key space are
    derived from ``obs`` so no skew surprises).
    """
    keys = obs.select(*group_keys).distinct()
    full = keys.crossJoin(F.broadcast(grid))
    return full.join(obs, on=[*group_keys, grid_key], how="left")


def nearest_station(
    points: DataFrame,
    stations: DataFrame,
    point_cols: tuple[str, str, str] = ("point_id", "lat", "lon"),
    station_cols: tuple[str, str, str] = ("station_id", "lat", "lon"),
) -> DataFrame:
    """Nearest-station assignment: each point gets the closest station by
    great-circle distance — the weather-engine op implied by the
    reference's 27-station location dimension (master_location.json:
    observations belong to their nearest regency station).

    Shape for scale: the station dimension is dim-sized (27 rows for
    Jabar; thousands at worst) → broadcast cross join, then ONE
    aggregation takes min(struct(distance, station_id, …)) per point —
    struct ordering makes the tie-break total (equal distances → lowest
    station id), and the winning station's fields ride in the struct so
    no join-back is needed. |points| × |stations| narrow rows, all
    codegen'd trig, no shuffle except the final per-point agg — and that
    agg combines map-side. A true ANN index (IVF over unit vectors) only
    pays off when stations stop fitting in a broadcast.
    """
    pid, plat, plon = point_cols
    sid, slat, slon = station_cols
    from ..functions.weather import haversine_km

    s = stations.select(
        F.col(sid).alias("__sid"),
        F.col(slat).alias("__slat"),
        F.col(slon).alias("__slon"),
    )
    d = points.crossJoin(F.broadcast(s)).withColumn(
        "__dist",
        haversine_km(
            F.col(plat), F.col(plon), F.col("__slat"), F.col("__slon")
        ),
    )
    best = F.min(
        F.struct(
            F.col("__dist").alias("d"),
            F.col("__sid").alias("s"),
        )
    ).alias("b")
    return (
        d.groupBy(pid)
        .agg(best)
        .select(
            pid,
            F.col("b.s").alias("nearest_station_id"),
            F.round(F.col("b.d"), 6).alias("distance_km"),
        )
    )


def radius_join_gridded(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str, str],
    right_cols: tuple[str, str, str],
    radius: int,
) -> DataFrame:
    """Spatial radius join for BIG × BIG inputs: all (left, right) pairs
    within ``radius`` in planar integer coordinates, without the O(n·m)
    cross join Spark would otherwise plan for the distance predicate.

    Grid bucketing: cell side = ``radius``; the left point keeps its one
    cell, every right point is EXPLODED to its 3×3 neighbor cells, and
    the join is a plain equi-join on (cx, cy) + the exact integer
    distance filter. Completeness: |dx| ≤ r and |dy| ≤ r imply the two
    cells differ by at most 1 per axis, so the neighbor expansion covers
    every qualifying pair; each candidate appears exactly once (the left
    cell is unique, and one right copy lands in it), so no distinct is
    needed. Grid cells of hash-spread points are uniform → no skew; a
    dim-sized right side broadcasts automatically (the complement of
    :func:`nearest_station`'s broadcast-cross-join, which stops working
    when neither side is dim-sized). Integer arithmetic end to end —
    reproducible on any engine, no trig ulps on the boundary.

    Returns (left id, right id, d2) with d2 = squared distance ≤ r².
    """
    lid, lx, ly = left_cols
    rid, rx, ry = right_cols
    if lid == rid:
        raise ValueError("left and right id columns must have distinct names")
    r = F.lit(radius)
    # coordinates re-aliased per side: the sides may share column names
    lcell = left.select(
        F.col(lid),
        F.col(lx).alias("__lx"),
        F.col(ly).alias("__ly"),
        F.floor(F.col(lx) / r).cast("long").alias("__cx"),
        F.floor(F.col(ly) / r).cast("long").alias("__cy"),
    )
    rcell = (
        right.select(
            F.col(rid), F.col(rx).alias("__rx"), F.col(ry).alias("__ry")
        )
        .withColumn("__ox", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__oy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            rid, "__rx", "__ry",
            (F.floor(F.col("__rx") / r) + F.col("__ox"))
            .cast("long").alias("__cx"),
            (F.floor(F.col("__ry") / r) + F.col("__oy"))
            .cast("long").alias("__cy"),
        )
    )
    dx = F.col("__lx") - F.col("__rx")
    dy = F.col("__ly") - F.col("__ry")
    d2 = (dx * dx + dy * dy).alias("d2")
    return (
        lcell.join(rcell, on=["__cx", "__cy"])
        .select(F.col(lid), F.col(rid), d2)
        .where(F.col("d2") <= F.lit(radius * radius))
    )
