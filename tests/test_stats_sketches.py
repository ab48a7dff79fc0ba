"""Standardization and Misra-Gries heavy-hitter operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_jabar_spark.ext.heavy_hitters import heavy_hitters
from etl_weather_jabar_spark.operators.aggregates import standardize


def test_standardize_zero_mean_unit_variance(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)] + [("flat", 5.0)] * 10,
        ["k", "x"],
    )
    out = standardize(df, ["k"], F.round(F.col("x") * 100).cast("bigint")).collect()
    g = [r["z"] for r in out if r["k"] == "g"]
    assert abs(sum(g)) < 1e-9
    assert abs(sum(z * z for z in g) / len(g) - 1.0) < 1e-9
    assert all(r["z"] == 0.0 for r in out if r["k"] == "flat")  # zero variance


def test_heavy_hitters_within_mg_bound(spark):
    # skewed stream: two heavy keys + a long unique tail, forced through
    # several partitions so the mergeable-summaries path actually merges
    rows = (
        [("hot1",)] * 600
        + [("hot2",)] * 300
        + [(f"tail{i}",) for i in range(2000)]
    )
    df = spark.createDataFrame(rows, ["v"]).repartition(8)
    n, k = len(rows), 50
    est = {r["v"]: r["est"] for r in heavy_hitters(df, "v", k).collect()}
    # every key with true count > n/k must survive; estimates are lower
    # bounds within n/k of truth
    for key, true in (("hot1", 600), ("hot2", 300)):
        assert key in est, key
        assert true - n // k <= est[key] <= true
    assert all(e <= 600 for e in est.values())


def test_heavy_hitters_exact_when_k_exceeds_cardinality(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, ["v"]
    )
    est = {r["v"]: r["est"] for r in heavy_hitters(df, "v", 100).collect()}
    assert est == {"a": 5, "b": 3, "c": 2}  # no pruning -> exact counts


def test_theta_sketch_setops_within_error(spark):
    """Theta-sketch union/intersection/difference estimates stay within
    a few percent of exact at this cardinality (exact below the sketch's
    nominal entries, so estimates should be EXACT here)."""
    from etl_weather_jabar_spark.queries import QUERIES

    r = QUERIES["theta_sketch_setops_users"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert r["clickers"] > 0 and r["purchasers"] > 0
    # below nominal entries (4096) theta sketches are exact
    exact_union = (
        r["clickers"] + r["purchasers"] - r["exact_intersection"]
    )
    assert r["est_union"] == exact_union
    assert r["est_intersection"] == r["exact_intersection"]
    assert r["est_click_only"] == r["clickers"] - r["exact_intersection"]


def test_approx_top_k_matches_exact_heavy_hitters(spark):
    """approx_top_k (Spark 4): with maxItemsTracked well above the true
    vocabulary's heavy tail, the top-k items and counts are exact —
    cross-checked against the plain groupBy."""
    from etl_weather_jabar_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
    ).where(F.col("t") != "")
    exact = {
        r["t"]: r["n"]
        for r in toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("t"))
        .limit(5)
        .collect()
    }
    toks.createOrReplaceTempView("__toks_atk")
    got = {
        row["item"]: row["count"]
        for row in spark.sql(
            "SELECT approx_top_k(t, 5, 100000) AS tk FROM __toks_atk"
        ).collect()[0]["tk"]
    }
    assert got == exact


def test_approx_topk_rollup_equals_exact(spark):
    """The per-source accumulate → combine rollup returns the same top
    tokens and counts as a flat exact groupBy at this vocabulary size."""
    from etl_weather_jabar_spark.queries import QUERIES
    from etl_weather_jabar_spark.sources.parquet import load_table

    got = {
        r["token"]: r["n"]
        for r in QUERIES["approx_topk_rollup_tokens"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    exact_all = {
        r["t"]: r["n"]
        for r in docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
        )
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # ties at the rank-10 boundary make the exact MEMBER set ambiguous;
    # what must hold: 10 items, every reported count is the true count,
    # and the count profile equals the exact top-10 count profile
    assert len(got) == 10
    assert all(exact_all[t] == n for t, n in got.items())
    top_counts = sorted(exact_all.values(), reverse=True)[:10]
    assert sorted(got.values(), reverse=True) == top_counts


def test_count_min_sketch_overestimates_and_merges(spark):
    """CMS invariants: estimate ≥ true count for EVERY key (not just
    the probed top-k), the build matches an exact python replay, and
    counters are mergeable (sketch(A ∪ B) = sketch(A) + sketch(B))."""
    import hashlib

    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.heavy_hitters import (
        cms_estimate,
        count_min_sketch,
    )

    rows = [("tok%d" % (i % 37),) for i in range(1000)] + [("hot",)] * 300
    df = spark.createDataFrame(rows, ["w"])
    sketch = count_min_sketch(df, "w", depth=4, width=64)
    got = {
        (r["r"], r["slot"]): r["c"] for r in sketch.collect()
    }

    # python replay
    from collections import Counter

    truth = Counter(w for (w,) in rows)
    want: dict[tuple[int, int], int] = {}
    for w, n in truth.items():
        for r in range(4):
            slot = (
                int(hashlib.md5(f"{w}:cms{r}".encode()).hexdigest()[:8], 16)
                % 64
            )
            want[(r, slot)] = want.get((r, slot), 0) + n
    assert got == want

    # overestimate for every key
    keys = df.select("w").distinct()
    est = {
        r["w"]: r["cms_n"]
        for r in cms_estimate(sketch, keys, "w", depth=4, width=64).collect()
    }
    for w, n in truth.items():
        assert est[w] >= n

    # mergeability: counters of two halves add to the full sketch
    a = spark.createDataFrame(rows[:600], ["w"])
    b = spark.createDataFrame(rows[600:], ["w"])
    merged = (
        count_min_sketch(a, "w", depth=4, width=64)
        .unionByName(count_min_sketch(b, "w", depth=4, width=64))
        .groupBy("r", "slot")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    got_merged = {(r["r"], r["slot"]): r["c"] for r in merged.collect()}
    assert got_merged == got


def test_bloom_filter_no_false_negatives_and_mergeable(spark):
    """Every built key probes positive (no false negatives — the Bloom
    guarantee); unseen keys mostly probe negative at this load factor;
    OR-merging two filters equals building over the union."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.heavy_hitters import (
        bloom_build,
        bloom_probe,
    )

    a = spark.createDataFrame(
        [(f"mem{i}",) for i in range(50)], ["k"]
    )
    b = spark.createDataFrame(
        [(f"oth{i}",) for i in range(50)], ["k"]
    )
    fresh = spark.createDataFrame(
        [(f"new{i}",) for i in range(200)], ["k"]
    )

    fa = bloom_build(a, "k")
    got = {
        r["k"]: r["bloom_member"]
        for r in bloom_probe(fa, a.unionByName(fresh), "k").collect()
    }
    assert all(got[f"mem{i}"] == 1 for i in range(50))  # no FNs
    fp = sum(got[f"new{i}"] for i in range(200))
    # 50 keys × 3 hashes in 1020 bits → expected fp ≈ (1-e^-0.147)³ ≈ 0.26%
    assert fp <= 10

    # mergeability: OR of lane bitmaps == filter of the union
    fb = bloom_build(b, "k")
    merged = (
        fa.unionByName(fb)
        .groupBy("lane")
        .agg(F.expr("bit_or(bits)").cast("bigint").alias("bits"))
    )
    direct = bloom_build(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_member_expr_equals_relational_probe(spark):
    """The zero-shuffle Column-conjunction membership test agrees with
    the relational ``bloom_probe`` on EVERY key (members and
    non-members) — same bit contract, so the fast path is certified
    against the reference path. Its plan must be a bare Scan→Filter:
    no exchange of any kind."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.heavy_hitters import (
        bloom_build,
        bloom_dense_lanes,
        bloom_member_expr,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"mem{i}",) for i in range(60)], ["k"]
    )
    universe = spark.createDataFrame(
        [(f"mem{i}",) for i in range(60)]
        + [(f"new{i}",) for i in range(300)],
        ["k"],
    )
    filt = bloom_build(members, "k")
    ref = {
        r["k"]: r["bloom_member"]
        for r in bloom_probe(filt, universe, "k").collect()
    }
    lanes = bloom_dense_lanes(filt, 1020)
    fast = universe.select(
        "k", bloom_member_expr(F.col("k"), lanes).cast("int").alias("m")
    )
    got = {r["k"]: r["m"] for r in fast.collect()}
    assert got == ref
    # zero-shuffle: the filtered plan contains no Exchange at all
    plan = (
        universe.where(bloom_member_expr(F.col("k"), lanes))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bloom_prefilter_lazy_broadcast_no_false_negatives(spark):
    """The production pre-join prune (bloom_prefilter, xxhash64 mode):
    every true member survives the filter (no false negatives — the
    exact join's transparency depends on it), the plan carries NO
    probe-key exchange (only the 1-row broadcast of the lane map), and
    nothing executes at construction time (fully lazy)."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.heavy_hitters import (
        bloom_build,
        bloom_prefilter,
    )

    members = spark.createDataFrame([(i,) for i in range(0, 600, 3)], ["k"])
    probe = spark.createDataFrame([(i,) for i in range(600)], ["k"])
    filt = bloom_build(
        members, "k", k_hashes=3, m_bits=60 * 64, hash_fn="xxhash64"
    )
    kept = bloom_prefilter(
        probe, F.col("k"), filt, k_hashes=3, m_bits=60 * 64,
        hash_fn="xxhash64",
    )
    got = {r["k"] for r in kept.collect()}
    assert set(range(0, 600, 3)) <= got  # no false negatives
    # the prune actually prunes at this load factor
    assert len(got) < 600

    plan = kept._jdf.queryExecution().executedPlan().toString()
    import re

    # the only shuffles allowed are the BUILD side's lane-sized
    # aggregation (hashpartitioning on `lane`) feeding the 1-row
    # broadcast; the PROBE side must carry no exchange of its keys —
    # no hashpartitioning on k, no range/roundrobin anywhere
    for m in re.finditer(r"Exchange hashpartitioning\(([^,)]+)", plan):
        assert m.group(1).startswith("lane"), plan
    assert not re.search(r"Exchange (range|RoundRobin)", plan, re.I), plan


def test_kmv_bottom_k_sketch_merge_and_accuracy(spark):
    """KMV invariants: the sketch is mergeable (bottom-k of the union
    of two sketches = sketch of the union), exact below k distinct,
    and the (k−1)·2⁶⁰/h₍ₖ₎ estimate lands within the 1/√k error class
    on a 5000-distinct stream."""
    import hashlib

    from pyspark.sql import functions as F

    k = 64

    def hv(u):
        return int(hashlib.md5(f"{u}:kmv".encode()).hexdigest()[:15], 16)

    def sketch(users):
        return sorted({hv(u) for u in users})[:k]

    universe = [f"user{i}" for i in range(5000)]
    a, b = universe[:3000], universe[2000:]  # overlapping halves
    merged = sorted(set(sketch(a)) | set(sketch(b)))[:k]
    assert merged == sketch(universe)  # mergeability

    est = (k - 1) * 2**60 // sketch(universe)[-1]
    assert abs(est - 5000) / 5000 < 0.4  # ~3× the 1/√64 error class

    # exact below k: the registry query's small-group path
    small = sketch(universe[:40])
    assert len(small) == 40
