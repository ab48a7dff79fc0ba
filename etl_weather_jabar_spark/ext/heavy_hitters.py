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
