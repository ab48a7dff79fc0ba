"""Behavioral-analytics + bitmap-distinct operator semantics on hand-built
data where the expected answer is computable by eye (the sf-scale oracle
twins in queries.py pin cross-engine agreement; these pin the semantics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_jabar_spark.ext.sampling import shuffle_shards
from etl_weather_jabar_spark.operators.aggregates import exact_distinct_bitmap


def test_bitmap_distinct_matches_count_distinct(spark):
    # ids straddle several 32768-wide bitmap buckets to force real merges
    df = spark.range(0, 200_000, 7).withColumn(
        "g", (F.col("id") % 3).cast("string")
    )
    got = {
        r["g"]: r["n_distinct"]
        for r in exact_distinct_bitmap(df, ["g"], "id").collect()
    }
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("id").alias("n")).collect()
    }
    assert got == want and len(got) == 3


def test_bitmap_distinct_counts_duplicates_once(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 99_999)], ["g", "uid"]
    )
    got = {
        r["g"]: r["n_distinct"]
        for r in exact_distinct_bitmap(df, ["g"], "uid").collect()
    }
    assert got == {"a": 2, "b": 1}


def test_funnel_requires_strict_step_order(spark):
    # user 1 completes signup→view in order; user 2 viewed BEFORE signup
    # (must not count at the view stage); user 3 never signed up.
    rows = [
        (1, "signup", "2024-01-01 10:00:00"),
        (1, "view", "2024-01-01 11:00:00"),
        (2, "view", "2024-01-01 09:00:00"),
        (2, "signup", "2024-01-01 10:00:00"),
        (3, "view", "2024-01-01 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    assert s1.count() == 2  # users 1 and 2 signed up
    assert [r["user_id"] for r in s2.collect()] == [1]  # only user 1 in order


def test_time_weighted_average_known_series(spark):
    # one user, value 10.00 held 30 s then 20.00 held 10 s, last row open:
    # twa = (1000*30 + 2000*10) / 40 = 1250 cents = 12.50
    rows = [
        (1, 1, "2024-01-01 00:00:00", 10.0),
        (1, 2, "2024-01-01 00:00:30", 20.0),
        (1, 3, "2024-01-01 00:00:40", 99.0),
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        F.round(F.col("value") * 100).cast("bigint").alias("u"),
        F.floor((F.lead(us).over(w) - us) / 1000000.0)
        .cast("bigint")
        .alias("dur_s"),
    ).where(F.col("dur_s").isNotNull())
    agg = seq.agg(
        F.sum(F.col("u") * F.col("dur_s")).alias("num"),
        F.sum("dur_s").alias("den"),
    ).collect()[0]
    assert agg["num"] / agg["den"] == 1250.0


def test_shuffle_shards_deterministic_append_stable_and_complete(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["shard"], r["shuffle_rank"])
         for r in shuffle_shards(df, "doc_id", 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["shuffle_rank"])
         for r in shuffle_shards(df, "doc_id", 8).collect()}
    assert a == b  # reproducible
    assert {s for s, _ in a.values()} == set(range(8))  # every shard hit
    # append-stability: assignment of old rows unchanged by new rows
    sub = {r["doc_id"]: (r["shard"], r["shuffle_rank"])
           for r in shuffle_shards(
               df.where(F.col("doc_id") < 500), "doc_id", 8
           ).collect()}
    assert all(a[k] == v for k, v in sub.items())
    # rough balance: no shard more than 2x the mean
    from collections import Counter

    counts = Counter(s for s, _ in a.values())
    assert max(counts.values()) < 2 * (2000 / 8)


def test_redact_pii_all_kinds(spark):
    from etl_weather_jabar_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org or call +1-555-0199 now"),
            (2, "server 10.0.12.9 holds ssn 123-45-6789"),
            (3, "clean text, no pii at all"),
        ],
        ["id", "t"],
    )
    out = {
        r["id"]: r["clean"]
        for r in df.select(
            "id", redact_pii(F.col("t")).alias("clean")
        ).collect()
    }
    assert out[1] == "mail <EMAIL> or call <PHONE> now"
    assert out[2] == "server <IPV4> holds ssn <SSN>"
    assert out[3] == "clean text, no pii at all"
    counts = df.select(
        F.sum(pii_counts(F.col("t"), "email")).alias("e"),
        F.sum(pii_counts(F.col("t"), "ssn")).alias("s"),
    ).collect()[0]
    assert (counts["e"], counts["s"]) == (1, 1)


def test_skyline_2d_dominance_algebra(spark):
    """Skyline keeps equal points (neither dominates), keeps only the
    min-y per x, and kills any point with a cheaper-or-equal smaller-y
    dominator — checked against a python brute force."""
    import itertools
    import random as _r

    from etl_weather_jabar_spark.operators.skyline import skyline_2d

    rng = _r.Random(7)
    pts = [(i, rng.randrange(0, 40), rng.randrange(0, 40))
           for i in range(120)]
    pts += [(900, 5, 5), (901, 5, 5)]          # duplicate frontier point
    pts += [(902, 5, 9), (903, 6, 5)]          # same-x and same-y ties
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2])
            for q in pts if q[0] != p[0]
        )

    want = {p[0] for p in pts if not dominated(p)}
    assert got == want
    assert {900, 901} <= got or {900, 901}.isdisjoint(got)  # pair together


def test_skyline_2d_null_coordinates_excluded(spark):
    from etl_weather_jabar_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(
        [(1, 1, 1), (2, None, 0), (3, 0, None)],
        "id INT, x INT, y INT",
    )
    assert [r["id"] for r in skyline_2d(df, "x", "y").collect()] == [1]


def test_linear_interpolate_edges(spark):
    """Interior gaps interpolate (round-half-up), edge gaps stay NULL,
    equal-timestamp neighbors degrade to the earlier observation."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.timeseries import linear_interpolate

    rows = [
        # (id, user, t_us, units or None)
        (0, 1, 0, None),        # leading gap -> NULL
        (1, 1, 100, 1000),
        (2, 1, 150, None),      # halfway -> 1250 (exact .5 rounds up)
        (3, 1, 200, 1500),
        (4, 1, 260, None),      # 60% toward 1800 at t=260? next obs:
        (5, 1, 300, 1800),      # (260-200)/(300-200)=0.6 -> 1500+180=1680
        (6, 1, 400, None),      # trailing gap -> NULL
        (7, 2, 10, 500),
        (8, 2, 10, None),       # equal ts -> earlier obs value 500
        (9, 2, 10, 700),
    ]
    df = spark.createDataFrame(rows, "id INT, u INT, t LONG, v LONG")
    out = linear_interpolate(df, "u", F.col("t"), "id", F.col("v"))
    got = {r["id"]: r["filled_units"] for r in out.collect()}
    assert got[0] is None and got[6] is None
    assert got[1] == 1000 and got[3] == 1500
    assert got[2] == 1250
    assert got[4] == 1680
    assert got[8] == 500


def test_regex_extract_all_surface_with_planted_matches(spark, tmp_path):
    """regexp_extract_all must run with group idx=0 (patterns have no
    capture groups): plant digit/capital/long-word matches — the sf
    corpora contain none, so only this test executes the matching
    path — and compare against the DuckDB oracle on the same rows."""
    import duckdb

    from etl_weather_jabar_spark.queries import ORACLE_SQL, QUERIES

    rows = [
        (0, "Hello World 42 and 7 extraordinarily internationalization x"),
        (5, "no matches here"),
        (10, "Ab 123"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: (
            r["all_nums"], r["n_cap_words"], r["second_token"],
            r["long_words"],
        )
        for r in QUERIES["regex_extract_all_surface"](
            spark, str(tmp_path)
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            ORACLE_SQL["regex_extract_all_surface"]
        ).fetchall()
    }
    assert got == want
    assert got[0][0] == "42,7"
    assert got[0][3] == "extraordinarily|internationalization"


def test_sql_standard_rollup_matches_native_on_nonempty(spark):
    """sql_standard_rollup == native rollup/cube row-for-row on
    non-empty input; on EMPTY input it adds the SQL-standard grand-total
    row (count 0, NULL sum) that Spark's native Expand path drops."""
    from etl_weather_jabar_spark.operators.aggregates import sql_standard_rollup

    # NULL group values included: a NULL key row must stay distinguishable
    # from the synthesized grand-total row in the union construction
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("a", "x", 10),
         (None, "x", 4), ("b", None, 5), (None, None, 6)],
        "d STRING, t STRING, v INT",
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("bigint").alias("s"),
    ]

    def rows(out):
        return sorted(
            ((r["d"], r["t"], r["n"], r["s"]) for r in out.collect()),
            key=str,
        )

    native_rollup = df.rollup("d", "t").agg(*aggs)
    assert rows(sql_standard_rollup(df, ["d", "t"], aggs)) == rows(native_rollup)

    native_cube = df.cube("d", "t").agg(*aggs)
    assert rows(sql_standard_rollup(df, ["d", "t"], aggs, cube=True)) == rows(
        native_cube
    )

    empty = df.where(F.col("v") < 0)
    assert empty.rollup("d", "t").agg(*aggs).count() == 0  # Spark native
    got = sql_standard_rollup(empty, ["d", "t"], aggs).collect()
    assert [(r["d"], r["t"], r["n"], r["s"]) for r in got] == [
        (None, None, 0, None)
    ]
    got_cube = sql_standard_rollup(empty, ["d", "t"], aggs, cube=True).collect()
    assert [(r["d"], r["t"], r["n"], r["s"]) for r in got_cube] == [
        (None, None, 0, None)
    ]


def test_classifier_filter_matches_python_replay(spark):
    """Hashed linear classifier inference: replay two documents' scores
    in pure python (md5 slot + md5 weights) and pin argmax/margin/keep."""
    import hashlib

    from etl_weather_jabar_spark.queries import QUERIES

    out = {
        r["doc_id"]: r
        for r in QUERIES["classifier_filter_docs"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(50).collect()
    }

    def _slot(tok):
        return int(hashlib.md5((tok + ":fh").encode()).hexdigest()[:8], 16) % 64

    def _w(slot, cls):
        h = hashlib.md5(f"w:{slot}:{cls}".encode()).hexdigest()[:8]
        return int(h, 16) % 2001 - 1000

    checked = 0
    for did, text in list(docs.items())[:5]:
        scores = [0, 0, 0]
        for tok in text.split():
            s = _slot(tok)
            for c in range(3):
                scores[c] += _w(s, c)
        best = max(scores)
        pred = scores.index(best)
        second = sorted(scores)[-2]
        row = out[did]
        assert row["pred_class"] == pred
        assert row["best_score"] == best
        assert row["margin"] == best - second
        assert row["keep"] == (1 if best > 0 else 0)
        checked += 1
    assert checked == 5
    # the model must actually discriminate on this corpus
    assert len({r["pred_class"] for r in out.values()}) > 1


def test_bigram_lm_score_matches_python_replay(spark):
    """Self-trained bigram conditional-ppm scoring pinned against an
    independent python reference, including the short-doc (<2 tokens)
    NULL path and the repeated-transition head/tail split."""
    from collections import Counter

    from etl_weather_jabar_spark.ext.lm import bigram_lm_score

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "solo"),          # no bigrams → NULL scores
        (4, "the cat sat on the mat"),  # exact repeat boosts its ppms
    ]
    out = {
        r["doc_id"]: (r["n_bigrams"], r["lm_ppm"], r["min_ppm"])
        for r in bigram_lm_score(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }

    cxy, cx = Counter(), Counter()
    for _, t in rows:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            cxy[(a, b)] += 1
            cx[a] += 1
    for d, t in rows:
        w = t.split(" ")
        ppms = [
            cxy[(a, b)] * 1_000_000 // cx[a] for a, b in zip(w, w[1:])
        ]
        if not ppms:
            assert out[d] == (0, None, None)
            continue
        sp, n = sum(ppms), len(ppms)
        assert out[d] == ((n, (2 * sp + n) // (2 * n), min(ppms)))
    # the model discriminates: the common phrase scores above the
    # one-off continuation ("ran" after "cat" is 1 of 3)
    assert out[1][1] > out[2][2]


def test_phrase_match_repeated_terms_and_overlaps(spark):
    """The anchor intersection handles a phrase with a REPEATED term
    ("a b a": off 0 and 2 share the token) and overlapping matches
    ("a a a a" contains "a a a" at anchors 0 and 1); docs without the
    phrase yield no rows."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.search import (
        build_postings,
        phrase_match,
    )

    docs = spark.createDataFrame(
        [
            (1, "x a b a y a b a"),   # matches at 1 and 5
            (2, "a b c a b"),          # "a b" present, "a b a" absent
            (3, "a a a a"),            # phrase "a b a"? no b → no match
            (4, "b a b a"),            # match at 1
        ],
        ["doc_id", "text"],
    )
    terms = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "a")], ["off", "tok"]
    ).select(
        F.col("off").cast("bigint"),
        F.substring(F.md5("tok"), 1, 16).alias("th"),
    )
    got = sorted(
        (r["doc_id"], r["pos0"])
        for r in phrase_match(build_postings(docs), terms).collect()
    )
    assert got == [(1, 1), (1, 5), (4, 1)]

    # overlapping single-term repetition: "a a a" inside "a a a a"
    terms2 = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "a")], ["off", "tok"]
    ).select(
        F.col("off").cast("bigint"),
        F.substring(F.md5("tok"), 1, 16).alias("th"),
    )
    got2 = sorted(
        (r["doc_id"], r["pos0"])
        for r in phrase_match(build_postings(docs), terms2).collect()
    )
    assert got2 == [(3, 0), (3, 1)]


def test_phrase_match_indexed_prunes_partitions(spark, tmp_path):
    """Persisted postings index: the serving scan carries a shard
    PartitionFilter derived from the query terms (pruned before IO),
    and the indexed result equals the direct phrase_match."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.search import (
        build_postings,
        phrase_match,
        phrase_match_indexed,
        save_postings_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "zeta alpha beta gamma"),
            (3, "no match in here at all"),
        ],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "postings")
    save_postings_index(docs, path)

    terms = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma")], ["off", "w"]
    ).select(
        F.col("off").cast("bigint"),
        F.substring(F.md5("w"), 1, 16).alias("th"),
    )
    out = phrase_match_indexed(spark, path, terms)
    got = sorted((r["doc_id"], r["pos0"]) for r in out.collect())
    direct = sorted(
        (r["doc_id"], r["pos0"])
        for r in phrase_match(build_postings(docs), terms).collect()
    )
    assert got == direct == [(1, 0), (2, 1)]

    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scan prunes on the shard BEFORE IO: `shard#N IN (…)`
    assert re.search(r"PartitionFilters: \[shard#\d+ IN \(", plan), plan


def test_bm25_indexed_prunes_partitions_and_matches_direct(spark, tmp_path):
    """Persisted search index (postings + doclen norms + stats): the
    BM25 serving scan carries a shard PartitionFilter derived from the
    query terms, the doclen sidecar supplies the length normalization a
    pruned scan cannot reconstruct, and the indexed scores equal the
    direct bm25_scores bit for bit."""
    import re

    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.search import (
        bm25_scores,
        bm25_topk_indexed,
        save_search_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta alpha"),
            (2, "zeta alpha beta gamma"),
            (3, "no match in here at all but quite a few words"),
            (4, "alpha alpha alpha"),
        ],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "searchidx")
    save_search_index(docs, path)
    terms = spark.createDataFrame(
        [("alpha",), ("gamma",)], ["w"]
    ).select(F.substring(F.md5("w"), 1, 16).alias("th"))

    out = bm25_topk_indexed(spark, path, terms)
    got = sorted(map(tuple, out.collect()))
    direct = sorted(map(tuple, bm25_scores(docs, terms).collect()))
    assert got == direct and len(got) == 3  # doc 3 matches no term
    scores = dict(got)
    # idf + tf saturation doing their jobs: the extra alpha occurrence
    # lifts doc 1 over doc 2, but tf-STUFFING loses to term DIVERSITY —
    # doc 4's 3×alpha (one low-idf term, saturated) scores below doc
    # 2's alpha+gamma
    assert scores[1] > scores[2] > scores[4] > 0

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[shard#\d+ IN \(", plan), plan


def test_search_index_incremental_append(spark, tmp_path):
    """append_to_search_index: O(batch) maintenance — appended index
    serves EXACTLY what a full rebuild over the union corpus serves
    (postings, norms and stats all consistent), and a replayed batch is
    an idempotent no-op."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.search import (
        append_to_search_index,
        bm25_topk_indexed,
        save_search_index,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha delta words here")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(2, "REPLAYED must not reindex"), (3, "gamma gamma alpha")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "inc")
    save_search_index(base, idx)
    assert append_to_search_index(batch, idx) == 1  # doc 2 already in
    assert append_to_search_index(batch, idx) == 0  # replay: no-op

    full = str(tmp_path / "full")
    save_search_index(
        base.unionByName(batch.where(F.col("doc_id") == 3)), full
    )
    terms = spark.createDataFrame(
        [("alpha",), ("gamma",)], ["w"]
    ).select(F.substring(F.md5("w"), 1, 16).alias("th"))
    got = sorted(map(tuple, bm25_topk_indexed(spark, idx, terms).collect()))
    want = sorted(map(tuple, bm25_topk_indexed(spark, full, terms).collect()))
    assert got == want and len(got) == 3


def test_search_index_crash_replay_exactly_once(spark, tmp_path):
    """The atomic segment commit (review finding): a crash BETWEEN the
    batch's file writes and its _committed marker leaves an invisible
    partial — serving ignores it, and the replay overwrites and
    re-commits to the exact full-rebuild state; a replay of a COMMITTED
    batch is a no-op (same content key → same segment → marker seen)."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.search import (
        _committed_batches,
        append_to_search_index,
        bm25_topk_indexed,
        save_search_index,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha delta words here")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(3, "gamma gamma alpha"), (4, "beta beta beta alpha")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "crash")
    save_search_index(base, idx)
    assert append_to_search_index(batch, idx) == 2

    # simulate the crash: delete the batch segment's marker — the
    # partial directory still exists but must be invisible
    import os

    seg = [
        b for b in _committed_batches(spark, idx) if not b.endswith("base")
    ]
    assert len(seg) == 1
    marker = seg[0].replace("file:", "") + "/_committed"
    os.remove(marker)
    assert len(_committed_batches(spark, idx)) == 1  # only base visible

    terms = spark.createDataFrame([("alpha",), ("gamma",)], ["w"]).select(
        F.substring(F.md5("w"), 1, 16).alias("th")
    )
    pre = sorted(map(tuple, bm25_topk_indexed(spark, idx, terms).collect()))
    full_base = str(tmp_path / "fb")
    save_search_index(base, full_base)
    assert pre == sorted(
        map(tuple, bm25_topk_indexed(spark, full_base, terms).collect())
    )  # the uncommitted partial contributed NOTHING

    # replay after the crash: same batch → same segment, re-written and
    # re-committed; serving now equals the full rebuild over the union
    assert append_to_search_index(batch, idx) == 2
    assert append_to_search_index(batch, idx) == 0  # committed replay
    full = str(tmp_path / "full")
    save_search_index(base.unionByName(batch), full)
    assert sorted(
        map(tuple, bm25_topk_indexed(spark, idx, terms).collect())
    ) == sorted(map(tuple, bm25_topk_indexed(spark, full, terms).collect()))


def test_unicode_text_tier_multilingual(spark):
    """The quality/lang tier on non-Latin corpora (round-5 verdict item
    5): the Gopher alpha-word rule counts ANY Unicode letter (a Russian
    or Chinese word is alphabetic — the old [A-Za-z] class silently
    failed whole scripts), tokens() keeps CJK/Cyrillic words, and
    script_counts separates the scripts exactly."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.functions.text import (
        script_counts,
        tokens,
    )

    rows = [
        (1, "The quick brown fox jumps over the lazy dog."),
        (2, "Быстрая коричневая лиса прыгает через ленивую собаку."),
        (3, "敏捷 的 棕色 狐狸 跳过 了 懒惰 的 狗。"),
        (4, "mixed Привет 你好 hello123"),
        (5, "12345 !!! ..."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # Gopher rule-alpha predicate: fraction of whitespace words with a
    # LETTER — identical spelling to gopher_rules_docs' n_alpha
    w = F.split("text", " ")
    alpha = df.select(
        "doc_id",
        F.size(F.filter(w, lambda x: x.rlike(r"\p{L}"))).alias("n_alpha"),
        F.size(w).alias("n_words"),
    )
    got = {r["doc_id"]: (r["n_alpha"], r["n_words"]) for r in alpha.collect()}
    assert got[2][0] == got[2][1]  # every Russian word is alphabetic
    assert got[3][0] == got[3][1]  # every Chinese word is alphabetic
    assert got[5][0] == 0  # digits/punct only

    # tokens() keeps non-Latin words (the normalizer strips only
    # punctuation/symbols, not letters of any script)
    toks = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", tokens(F.col("text")).alias("t")).collect()
    }
    assert "лиса" in toks[2]
    assert "狐狸" in toks[3]
    assert toks[4] == ["mixed", "привет", "你好", "hello123"]

    sc_ = script_counts(F.col("text"))
    counts = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            sc_["latin"].alias("lat"),
            sc_["cyrillic"].alias("cyr"),
            sc_["han"].alias("han"),
            sc_["letters"].alias("all_l"),
        ).collect()
    }
    assert counts[1]["cyr"] == counts[1]["han"] == 0
    assert counts[1]["lat"] == counts[1]["all_l"] > 0
    assert counts[2]["cyr"] == counts[2]["all_l"] > 0 and counts[2]["lat"] == 0
    assert counts[3]["han"] == counts[3]["all_l"] > 0 and counts[3]["lat"] == 0
    # mixed doc: every script counted, shares partition the letter total
    m = counts[4]
    assert m["lat"] > 0 and m["cyr"] > 0 and m["han"] > 0
    assert m["lat"] + m["cyr"] + m["han"] == m["all_l"]
    assert counts[5]["all_l"] == 0


def test_phrase_match_over_segment_index(spark, tmp_path):
    """One index serves both query types: phrase lookup against the
    committed-segment search index equals the direct phrase_match over
    the union corpus (appends included), prunes to the phrase's shards,
    and ignores uncommitted partials."""
    import re

    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.search import (
        append_to_search_index,
        build_postings,
        phrase_match,
        phrase_match_segments,
        save_search_index,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zeta alpha beta gamma")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(3, "alpha beta gamma at the start")], ["doc_id", "text"]
    )
    idx = str(tmp_path / "segphrase")
    save_search_index(base, idx)
    assert append_to_search_index(batch, idx) == 1

    terms = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma")], ["off", "w"]
    ).select(
        F.col("off").cast("bigint"),
        F.substring(F.md5("w"), 1, 16).alias("th"),
    )
    out = phrase_match_segments(spark, idx, terms)
    got = sorted((r["doc_id"], r["pos0"]) for r in out.collect())
    direct = sorted(
        (r["doc_id"], r["pos0"])
        for r in phrase_match(
            build_postings(base.unionByName(batch)), terms
        ).collect()
    )
    assert got == direct == [(1, 0), (2, 1), (3, 0)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[shard#\d+ IN \(", plan), plan


def test_trigram_backoff_matches_python_replay(spark):
    """Stupid-backoff trigram scoring pinned against an independent
    python reference: all three backoff levels fire (seen trigram,
    bigram-only backoff with the exact 2/5 discount, unigram-only with
    4/25), OOV scores 0, and a short eval doc (<3 tokens) takes the
    NULL path."""
    from collections import Counter

    from etl_weather_jabar_spark.ext.lm import trigram_backoff_score

    train_rows = [
        (0, "the cat sat on the mat"),
        (2, "the cat sat again and again"),
    ]
    eval_rows = [
        (1, "the cat sat on a mat"),   # seen tri + bigram + unigram + OOV
        (3, "zz qq"),                  # <3 tokens → NULL scores
        (5, "wolf eats the cat"),      # OOV head, then seen levels
    ]
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_trigrams"], r["bo_ppm"], r["min_ppm"])
        for r in trigram_backoff_score(train, ev).collect()
    }

    c3, c12, c23, c2, c1 = (
        Counter(), Counter(), Counter(), Counter(), Counter()
    )
    n_tok = 0
    for _, t in train_rows:
        w = t.split(" ")
        for a, b, c in zip(w, w[1:], w[2:]):
            c3[(a, b, c)] += 1
            c12[(a, b)] += 1
        for a, b in zip(w, w[1:]):
            c23[(a, b)] += 1
            c2[a] += 1
        for a in w:
            c1[a] += 1
            n_tok += 1

    def score(a, b, c):
        if c3[(a, b, c)]:
            return c3[(a, b, c)] * 1_000_000 // c12[(a, b)]
        if c23[(b, c)]:
            return (c23[(b, c)] * 1_000_000 // c2[b]) * 2 // 5
        if c1[c]:
            return (c1[c] * 1_000_000 // n_tok) * 4 // 25
        return 0

    levels_seen = set()
    for d, t in eval_rows:
        w = t.split(" ")
        ppms = [score(a, b, c) for a, b, c in zip(w, w[1:], w[2:])]
        for a, b, c in zip(w, w[1:], w[2:]):
            if c3[(a, b, c)]:
                levels_seen.add(3)
            elif c23[(b, c)]:
                levels_seen.add(2)
            elif c1[c]:
                levels_seen.add(1)
            else:
                levels_seen.add(0)
        if not ppms:
            assert out[d] == (0, None, None)
            continue
        sp, n = sum(ppms), len(ppms)
        assert out[d] == (n, (2 * sp + n) // (2 * n), min(ppms))
    # the fixture genuinely exercises every backoff level + OOV
    assert levels_seen == {3, 2, 1, 0}


def test_kneser_ney_matches_fraction_replay(spark):
    """Interpolated Kneser-Ney bigram scoring pinned against an
    independent Fraction-arithmetic reference, and the model itself
    validated: for every seen context the exact-rational
    Σ_w2 P(w2|w1) over the full continuation vocabulary equals 1
    (the normalization identity D = 3/4 interpolation must satisfy).
    The fixture exercises every path: seen bigram, unseen bigram under
    a seen context (discounted continuation mass only), OOV context
    with a known continuation word, fully-OOV right word (scores 0),
    and a <2-token doc (NULL path)."""
    from collections import Counter
    from fractions import Fraction

    from etl_weather_jabar_spark.ext.lm import kneser_ney_score

    train_rows = [
        (0, "the cat sat on the mat"),
        (2, "the cat ran"),
    ]
    eval_rows = [
        (1, "the cat sat"),      # seen bigrams
        (3, "x"),                # <2 tokens → NULL scores
        (5, "dog sat on zzz"),   # OOV ctx; seen; seen-ctx + OOV word
        (7, "mat the"),          # ctx never on the left → cont. path
        (9, "on mat"),           # seen ctx, seen cont. word, unseen pair
    ]
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_bigrams"], r["kn_ppm"], r["min_ppm"])
        for r in kneser_ney_score(train, ev).collect()
    }

    c12, c1 = Counter(), Counter()
    for _, t in train_rows:
        w = [x for x in t.split(" ") if x]
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    n1p = Counter(a for a, _ in c12)
    nr = Counter(b for _, b in c12)
    t_types = len(c12)

    # The normalization identity, in exact rationals.
    for a in n1p:
        total = sum(
            (
                Fraction(max(Fraction(4 * c12[(a, b)] - 3, 4), 0), c1[a])
                + Fraction(3, 4) * n1p[a] * Fraction(nr[b], t_types)
                / c1[a]
            )
            for b in nr
        )
        assert total == 1, (a, total)

    def score(a, b):
        if c1[a]:
            num = max(4 * c12[(a, b)] - 3, 0) * t_types + 3 * n1p[a] * nr[b]
            return num * 1_000_000 // (4 * c1[a] * t_types)
        return nr[b] * 1_000_000 // t_types

    paths = set()
    for d, t in eval_rows:
        w = [x for x in t.split(" ") if x]
        ppms = [score(a, b) for a, b in zip(w, w[1:])]
        for a, b in zip(w, w[1:]):
            if c12[(a, b)]:
                paths.add("seen")
            elif c1[a] and nr[b]:
                paths.add("unseen_bigram")
            elif c1[a]:
                paths.add("oov_word")
            else:
                paths.add("oov_ctx")
        if not ppms:
            assert out[d] == (0, None, None)
            continue
        sp, n = sum(ppms), len(ppms)
        assert out[d] == (n, (2 * sp + n) // (2 * n), min(ppms))
    assert paths == {"seen", "unseen_bigram", "oov_word", "oov_ctx"}
    # the fully-OOV right word really scored 0
    assert out[5][2] == 0


def test_record_linkage_fs_semantics(spark, tmp_path):
    """Fellegi-Sunter linkage semantics pinned on a hand-built customer
    table: clean records link to themselves; a name-corrupted record
    (key ≡0 mod 7 with every other field agreeing) scores 24 points
    below the clean pair and falls under the threshold; multi-pass
    blocking recovers a pair whose balance-band pass misses (band
    bumped across the kiloband edge) through the segment pass."""
    from etl_weather_jabar_spark.queries import record_linkage_customers

    rows = [
        # key, name, nation, acctbal, segment
        (2, "Customer#2", 1, 500.00, "BUILDING"),
        (4, "Customer#4", 1, 700.00, "MACHINERY"),
        (14, "Customer#14", 1, 800.00, "AUTOMOBILE"),  # %7==0 → name corrupt
        (6, "Customer#6", 2, 995.00, "FURNITURE"),  # %3==0 → band 9→10
        (8, "Customer#8", 2, 100.00, "HOUSEHOLD"),
        (9, "Customer#9", 2, 100.00, "HOUSEHOLD"),  # odd → not in A
    ]
    df = spark.createDataFrame(
        rows,
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/customer.parquet")
    out = {
        r["a_key"]: (r["b_key"], r["weight"])
        for r in record_linkage_customers(spark, sf).collect()
    }
    # clean self-pairs: all three fields agree → 24+6+5
    assert out[2] == (2, 35)
    assert out[4] == (4, 35)
    assert out[8] == (8, 35)
    # name-corrupted candidate: -8+6+5 = 3 < 15 → no match survives
    assert 14 not in out
    # band-bumped record (9.95→10.05 kiloband edge: band pass misses,
    # segment pass recovers): name +24, band -4, segment +5 = 25
    assert out[6] == (6, 25)


def test_ppl_bucket_split_matches_naive_ntile(spark):
    """Round-7 verdict item 1: ppl_bucket_split now cuts terciles with the
    engine's scalable_ntile (range-partitioned global rank + exact tile
    arithmetic) instead of F.ntile over a corpus-wide unpartitioned
    Window. Pin that the registry query's per-bucket aggregate is
    row-identical to the naive single-reducer form at sf0.001."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.lm import bigram_lm_score
    from etl_weather_jabar_spark.queries import (
        half_up_div,
        load_table,
        ppl_bucket_split,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["bucket"]: (r["n_docs"], r["avg_ppm"], r["min_ppm"], r["max_ppm"])
        for r in ppl_bucket_split(spark, sf_dir).collect()
    }

    pd_ = bigram_lm_score(load_table(spark, sf_dir, "documents")).where(
        F.col("n_bigrams") > 0
    )
    w = Window.orderBy(F.col("lm_ppm").desc(), F.col("doc_id"))
    naive = pd_.select("lm_ppm", F.ntile(3).over(w).alias("bucket"))
    want = {
        r["bucket"]: (r["n_docs"], r["avg_ppm"], r["min_ppm"], r["max_ppm"])
        for r in naive.groupBy(
            F.col("bucket").cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            half_up_div(F.sum("lm_ppm"), F.count(F.lit(1)))
            .cast("bigint")
            .alias("avg_ppm"),
            F.min("lm_ppm").cast("bigint").alias("min_ppm"),
            F.max("lm_ppm").cast("bigint").alias("max_ppm"),
        )
        .collect()
    }
    assert got == want and len(got) == 3


def test_dictionary_match_multi_phrase_semantics(spark):
    """Multi-phrase dictionary matching pinned on hand-built fixtures:
    overlapping matches of different phrases, a repeated-term phrase
    ("x x") that must NOT fire on a single occurrence, per-occurrence
    rows for a phrase appearing twice, and phrases sharing a term."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.search import dictionary_match

    docs = spark.createDataFrame(
        [
            (1, "a b c a b"),   # "a b" twice; "b c" once; "a b c" once
            (2, "x y x"),       # "x x" must not fire; no dict phrase
            (3, "x x y"),       # "x x" fires at 0
        ],
        ["doc_id", "text"],
    )
    postings = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.substring(F.md5("tok"), 1, 16).alias("th"),
    )
    dict_rows = []
    for pid in ["a b", "b c", "a b c", "x x"]:
        ts = pid.split(" ")
        for off, term in enumerate(ts):
            dict_rows.append((pid, len(ts), off, term))
    import hashlib

    phrases = spark.createDataFrame(
        [
            (p, n, o, hashlib.md5(t.encode()).hexdigest()[:16])
            for p, n, o, t in dict_rows
        ],
        ["pid", "plen", "off", "th"],
    )
    got = {
        (r["doc_id"], r["pid"], r["pos0"])
        for r in dictionary_match(postings, phrases).collect()
    }
    assert got == {
        (1, "a b", 0),
        (1, "a b", 3),
        (1, "b c", 1),
        (1, "a b c", 0),
        (3, "x x", 0),
    }
