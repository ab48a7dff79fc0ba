"""Search-index lifecycle: tombstone deletes, segment compaction,
Bloom-gated appends, and the segment-bounded/MaxScore serve guarantees
(round-7 work orders 1, 2, 3, 5)."""

import os
import re

import pytest
from pyspark.sql import functions as F

from etl_weather_jabar_spark.ext.search import (
    _committed_batches,
    _live_state,
    append_to_search_index,
    bm25_scores,
    bm25_topk_indexed,
    build_postings,
    compact_search_index,
    delete_from_search_index,
    phrase_match,
    phrase_match_segments,
    save_search_index,
    vacuum_search_index,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta alpha"),
            (2, "zeta alpha beta gamma"),
            (3, "no match in here at all but quite a few words"),
            (4, "alpha alpha alpha"),
            (5, "gamma delta epsilon alpha beta"),
            (6, "beta beta gamma gamma"),
        ],
        ["doc_id", "text"],
    )


def _terms(spark, words):
    return spark.createDataFrame([(w,) for w in words], ["w"]).select(
        F.substring(F.md5("w"), 1, 16).alias("th")
    )


def _serve(spark, idx, terms):
    return sorted(
        map(tuple, bm25_topk_indexed(spark, idx, terms).collect())
    )


def test_delete_serve_equals_rebuild_without_docs(spark, tmp_path):
    """Tombstoned docs vanish from BM25 (scores AND the df/S/D model
    state) and from phrase lookup — serving equals a full rebuild
    without the documents; double-deletes and deletes of unknown ids
    are no-ops; a deleted id cannot be re-appended until compaction."""
    docs = _corpus(spark)
    idx = str(tmp_path / "del")
    save_search_index(docs.where(F.col("doc_id") <= 4), idx)
    assert append_to_search_index(docs.where(F.col("doc_id") > 4), idx) == 2

    ids = spark.createDataFrame([(2,), (4,), (99,)], ["doc_id"])
    assert delete_from_search_index(ids, idx) == 2  # 99 not indexed
    assert delete_from_search_index(ids, idx) == 0  # already tombstoned

    terms = _terms(spark, ["alpha", "gamma"])
    survivors = docs.where(~F.col("doc_id").isin([2, 4]))
    want = sorted(map(tuple, bm25_scores(survivors, terms).collect()))
    assert _serve(spark, idx, terms) == want

    # phrase lookup over segments excludes tombstoned docs too
    ph = spark.createDataFrame(
        [(0, "alpha"), (1, "beta")], ["off", "w"]
    ).select(
        F.col("off").cast("bigint"),
        F.substring(F.md5("w"), 1, 16).alias("th"),
    )
    got = sorted(
        (r["doc_id"], r["pos0"])
        for r in phrase_match_segments(spark, idx, ph).collect()
    )
    direct = sorted(
        (r["doc_id"], r["pos0"])
        for r in phrase_match(build_postings(survivors), ph).collect()
    )
    assert got == direct and all(d not in (2, 4) for d, _ in got)

    # a tombstoned id is NOT re-indexed by an append (doclen row still
    # committed → the exact gate treats it as seen)
    assert (
        append_to_search_index(
            spark.createDataFrame([(2, "back again")], ["doc_id", "text"]),
            idx,
        )
        == 0
    )
    assert _serve(spark, idx, terms) == want


def test_compaction_merges_applies_deletes_and_vacuums(spark, tmp_path):
    """compact_search_index: N live segments + pending deletes → ONE
    live segment serving identically to a rebuild over the surviving
    docs; the replay no-ops; vacuum physically removes the retired
    dirs; and a formerly-deleted id becomes appendable again (the
    tombstone was applied physically)."""
    docs = _corpus(spark)
    idx = str(tmp_path / "cmp")
    save_search_index(docs.where(F.col("doc_id") <= 2), idx)
    assert append_to_search_index(
        docs.where(F.col("doc_id").isin([3, 4])), idx
    ) == 2
    assert append_to_search_index(
        docs.where(F.col("doc_id") > 4), idx
    ) == 2
    assert delete_from_search_index(
        spark.createDataFrame([(4,)], ["doc_id"]), idx
    ) == 1
    b, d = _live_state(spark, idx)
    assert len(b) == 3 and len(d) == 1

    assert compact_search_index(spark, idx) is True
    assert compact_search_index(spark, idx) is False  # already compact
    b2, d2 = _live_state(spark, idx)
    assert len(b2) == 1 and len(d2) == 0

    terms = _terms(spark, ["alpha", "gamma"])
    survivors = docs.where(F.col("doc_id") != 4)
    assert _serve(spark, idx, terms) == sorted(
        map(tuple, bm25_scores(survivors, terms).collect())
    )

    # vacuum removes the 3 retired segments + 1 consumed delete dir
    assert vacuum_search_index(spark, idx) == 4
    assert vacuum_search_index(spark, idx) == 0
    assert _serve(spark, idx, terms) == sorted(
        map(tuple, bm25_scores(survivors, terms).collect())
    )

    # doc 4's tombstone is gone physically: re-append now indexes it
    re4 = spark.createDataFrame([(4, "alpha returns")], ["doc_id", "text"])
    assert append_to_search_index(re4, idx) == 1
    after = docs.where(F.col("doc_id") != 4).unionByName(re4)
    assert _serve(spark, idx, terms) == sorted(
        map(tuple, bm25_scores(after, terms).collect())
    )


def test_compaction_crash_injection(spark, tmp_path):
    """A crash BEFORE the merged segment's _committed lands leaves the
    old live set fully intact (the partial merged dir is invisible and
    its _sources retire nothing); the replay converges to the compacted
    state."""
    docs = _corpus(spark)
    idx = str(tmp_path / "crash")
    save_search_index(docs.where(F.col("doc_id") <= 3), idx)
    assert append_to_search_index(docs.where(F.col("doc_id") > 3), idx) == 3
    assert delete_from_search_index(
        spark.createDataFrame([(6,)], ["doc_id"]), idx
    ) == 1
    terms = _terms(spark, ["alpha", "beta"])
    pre = _serve(spark, idx, terms)

    assert compact_search_index(spark, idx) is True
    merged = [
        p for p in _committed_batches(spark, idx) if "compact_" in p
    ]
    assert len(merged) == 1
    # crash injection: the marker vanishes → the merged dir (and its
    # _sources) must be invisible, restoring the pre-compaction state
    os.remove(merged[0].replace("file:", "") + "/_committed")
    b, d = _live_state(spark, idx)
    assert len(b) == 2 and len(d) == 1
    assert _serve(spark, idx, terms) == pre

    # replay: same sources → same target key → rewritten + re-committed
    assert compact_search_index(spark, idx) is True
    b2, d2 = _live_state(spark, idx)
    assert len(b2) == 1 and len(d2) == 0
    assert _serve(spark, idx, terms) == pre


def test_serve_is_segment_bounded_no_doclen_scan(spark, tmp_path):
    """Round-6 verdict item 1 'done' criterion: the BM25 serve plan
    shows NO doclen read (norms ride inside the shard-pruned termdocs
    rows) and no corpus-sized aggregate — totals come from the 1-row
    per-segment stats files; the termdocs scan carries the shard
    PartitionFilter."""
    docs = _corpus(spark)
    idx = str(tmp_path / "bounded")
    save_search_index(docs, idx)
    assert append_to_search_index(
        spark.createDataFrame([(7, "alpha beta")], ["doc_id", "text"]), idx
    ) == 1
    out = bm25_topk_indexed(spark, idx, _terms(spark, ["alpha", "gamma"]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "doclen" not in plan, plan
    assert "postings" not in plan, plan
    assert re.search(r"PartitionFilters: \[shard#\d+ IN \(", plan), plan
    # and it still serves the exact inline-scorer result
    full = docs.unionByName(
        spark.createDataFrame([(7, "alpha beta")], ["doc_id", "text"])
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(
            tuple,
            bm25_scores(full, _terms(spark, ["alpha", "gamma"])).collect(),
        )
    )


def test_append_bloom_gate_skips_doclen_when_all_new(spark, tmp_path):
    """Round-6 verdict item 2: a batch with NO Bloom-positive id never
    reads the committed doclens (O(batch) append); overlapping batches
    still dedup exactly through the fallback anti-join, and false
    positives can only cost a probe, never drop a document."""
    docs = _corpus(spark)
    idx = str(tmp_path / "bloom")
    save_search_index(docs.where(F.col("doc_id") <= 3), idx)

    # disjoint ids: indexed in full (the gate classed every id new)
    fresh = docs.where(F.col("doc_id") > 3)
    assert append_to_search_index(fresh, idx) == 3
    # full replay of the same batch: committed-key no-op
    assert append_to_search_index(fresh, idx) == 0
    # partial overlap under a DIFFERENT key: only the new id lands
    mix = docs.where(F.col("doc_id").isin([5, 6])).unionByName(
        spark.createDataFrame([(8, "omega kappa")], ["doc_id", "text"])
    )
    assert append_to_search_index(mix, idx, batch_key="mix1") == 1

    terms = _terms(spark, ["alpha", "gamma", "omega"])
    full = docs.unionByName(
        spark.createDataFrame([(8, "omega kappa")], ["doc_id", "text"])
    )
    assert _serve(spark, idx, terms) == sorted(
        map(tuple, bm25_scores(full, terms).collect())
    )


def test_maxscore_prune_transparent_topk(spark, tmp_path):
    """The MaxScore serve (prune_k) returns EXACTLY the unpruned top-k
    by (score DESC, id ASC) while scoring strictly fewer docs — the
    prune actually fires on a mixed rare+common query (docs matching
    only the ubiquitous low-idf term are skipped)."""
    rows = [(i, "common filler words here") for i in range(1, 40)]
    rows += [
        (100, "raregem common appears once"),
        (101, "raregem raregem common text"),
        (102, "common raregem and more common"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = str(tmp_path / "wand")
    save_search_index(docs, idx)
    terms = _terms(spark, ["raregem", "common"])

    k = 3
    unpruned = bm25_topk_indexed(spark, idx, terms).collect()
    want_top = sorted(
        map(tuple, unpruned), key=lambda t: (-t[1], t[0])
    )[:k]
    pruned = bm25_topk_indexed(spark, idx, terms, prune_k=k).collect()
    got_top = sorted(map(tuple, pruned), key=lambda t: (-t[1], t[0]))[:k]
    assert got_top == want_top
    # the prune did real work: the common-only docs never got scored
    assert len(pruned) < len(unpruned)

    # prune survives deletes (caps stay valid upper bounds)
    assert delete_from_search_index(
        spark.createDataFrame([(101,)], ["doc_id"]), idx
    ) == 1
    unpruned2 = bm25_topk_indexed(spark, idx, terms).collect()
    want2 = sorted(map(tuple, unpruned2), key=lambda t: (-t[1], t[0]))[:k]
    got2 = sorted(
        map(
            tuple,
            bm25_topk_indexed(spark, idx, terms, prune_k=k).collect(),
        ),
        key=lambda t: (-t[1], t[0]),
    )[:k]
    assert got2 == want2


def test_delete_requires_index(spark, tmp_path):
    with pytest.raises(ValueError):
        delete_from_search_index(
            spark.createDataFrame([(1,)], ["doc_id"]),
            str(tmp_path / "absent"),
        )


def test_streaming_append_with_compaction_bounds_segments(spark, tmp_path):
    """The production cadence: a Structured Streaming foreachBatch that
    appends each micro-batch as a segment AND compacts whenever the
    live-segment count exceeds the bound — the segment count stays
    bounded over an unbounded stream (round-7 order 3 'done' criterion)
    and the served ranking still equals the inline scorer over all
    inserted docs."""
    import glob
    import os

    docs = spark.createDataFrame(
        [
            (i, f"alpha w{i % 7} beta w{(i * 3) % 11} gamma common")
            for i in range(1, 25)
        ],
        ["doc_id", "text"],
    )
    tmp = str(tmp_path)
    landing, idx, ckpt = f"{tmp}/in", f"{tmp}/idx", f"{tmp}/ckpt"
    os.makedirs(landing)
    # 6 micro-batches of 4 docs each
    for i in range(6):
        b = docs.where(
            (F.col("doc_id") > i * 4) & (F.col("doc_id") <= (i + 1) * 4)
        )
        d = f"{tmp}/stage{i}"
        b.coalesce(1).write.json(d)
        for j, part in enumerate(sorted(glob.glob(f"{d}/part-*.json"))):
            os.rename(part, f"{landing}/b{i}_{j:04d}.json")

    max_live = []

    def commit(batch, batch_id):
        append_to_search_index(batch, idx, batch_key=f"sb{batch_id}")
        compact_search_index(spark, idx, max_segments=3)
        max_live.append(len(_live_state(spark, idx)[0]))

    q = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(landing)
        .writeStream.foreachBatch(commit)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert max(max_live) <= 3, max_live  # bounded over the whole stream
    terms = _terms(spark, ["alpha", "gamma"])
    assert _serve(spark, idx, terms) == sorted(
        map(tuple, bm25_scores(docs, terms).collect())
    )


def test_vacuum_compact_chain_topological(spark, tmp_path):
    """Compact-of-compact chains (self-review finding): a retired
    merged segment's _sources file is the only death record of the
    dirs it consumed, so vacuum must remove it LAST — otherwise a
    reader arriving mid-vacuum would see the older dirs resurrect and
    double-count their docs. Pins the fixpoint removal of the whole
    chain and a consistent serve afterwards."""
    docs = _corpus(spark)
    idx = str(tmp_path / "chain")
    save_search_index(docs.where(F.col("doc_id") <= 2), idx)
    assert append_to_search_index(
        docs.where(F.col("doc_id").isin([3, 4])), idx
    ) == 2
    assert compact_search_index(spark, idx) is True  # M1 <- [base, b1]
    assert append_to_search_index(docs.where(F.col("doc_id") > 4), idx) == 2
    assert compact_search_index(spark, idx) is True  # M2 <- [M1, b2]
    b, d = _live_state(spark, idx)
    assert len(b) == 1 and "compact_" in b[0]

    # base, b1, b2 and M1 are all dead; M1 holds base/b1's death record
    assert vacuum_search_index(spark, idx) == 4
    assert vacuum_search_index(spark, idx) == 0
    b2_, d2_ = _live_state(spark, idx)
    assert b2_ == b and not d2_
    terms = _terms(spark, ["alpha", "gamma"])
    assert _serve(spark, idx, terms) == sorted(
        map(tuple, bm25_scores(docs, terms).collect())
    )


def test_tiered_compaction_merges_smallest_keeps_tombstones_live(
    spark, tmp_path
):
    """Size-tiered compaction (the amortized Lucene policy): only the
    k smallest live segments merge, tombstones stay live and keep
    anti-joining at serve (no double-subtraction possible — the rows
    remain physically present in the merged data), and a later FULL
    compaction still applies them physically."""
    docs = _corpus(spark)
    idx = str(tmp_path / "tier")
    save_search_index(docs.where(F.col("doc_id") <= 2), idx)  # 2 docs
    for i in (3, 4, 5, 6):  # four 1-doc segments
        assert append_to_search_index(
            docs.where(F.col("doc_id") == i), idx
        ) == 1
    assert delete_from_search_index(
        spark.createDataFrame([(5,)], ["doc_id"]), idx
    ) == 1
    assert len(_live_state(spark, idx)[0]) == 5

    # not enough segments for the tier: no-op
    assert compact_search_index(spark, idx, tier_size=9) is False
    assert compact_search_index(spark, idx, tier_size=3) is True
    b, d = _live_state(spark, idx)
    # merged(3 smallest) + base(2 docs) + one 1-doc segment; delete live
    assert len(b) == 3 and len(d) == 1

    terms = _terms(spark, ["alpha", "gamma"])
    survivors = docs.where(F.col("doc_id") != 5)
    want = sorted(map(tuple, bm25_scores(survivors, terms).collect()))
    assert _serve(spark, idx, terms) == want

    # replayed tier merge: same subset -> same key -> no-op... but the
    # live set changed (merged segment now among the 3 smallest), so a
    # second tier pass merges again — run FULL compaction to finish
    assert compact_search_index(spark, idx) is True
    b2, d2 = _live_state(spark, idx)
    assert len(b2) == 1 and not d2
    assert _serve(spark, idx, terms) == want
    assert vacuum_search_index(spark, idx) > 0
    assert _serve(spark, idx, terms) == want


def test_readd_and_redelete_after_compaction_land_fresh_keys(
    spark, tmp_path
):
    """The delete→compact→re-add→re-delete cycle (self-review finding,
    mirrored on the vector side): while RETIRED same-content-key dirs
    sit unvacuumed on disk, a legitimate re-append of delete-compacted
    content and a re-delete of re-added content must both LAND (under
    fresh suffixed keys) instead of being absorbed by the dead dirs;
    true replays still no-op."""
    docs = spark.createDataFrame(
        [
            (i, f"alpha w{i % 5} beta w{(i * 3) % 7} gamma common")
            for i in range(1, 13)
        ],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "idx")
    base = docs.where(F.col("doc_id") <= 8)
    extra = docs.where(F.col("doc_id") > 8)
    save_search_index(base, idx)
    assert append_to_search_index(extra, idx) == 4

    victim = docs.where(F.col("doc_id").isin([9, 10]))
    assert delete_from_search_index(victim.select("doc_id"), idx) == 2
    compact_search_index(spark, idx)  # applies + retires, NO vacuum

    # re-add the delete-compacted docs: same content as the retired
    # append segment → same content key → must land under a fresh key
    assert append_to_search_index(victim, idx) == 2
    terms = _terms(spark, ["alpha", "gamma"])
    assert _serve(spark, idx, terms) == sorted(
        map(tuple, bm25_scores(docs, terms).collect())
    )
    # true replay of the re-added batch: no-op
    assert append_to_search_index(victim, idx) == 0

    # re-delete the re-added docs: same ids as the retired delete
    # segment → same content key → must land under a fresh key
    assert delete_from_search_index(victim.select("doc_id"), idx) == 2
    surv = docs.where(~F.col("doc_id").isin([9, 10]))
    assert _serve(spark, idx, terms) == sorted(
        map(tuple, bm25_scores(surv, terms).collect())
    )
    # replay of the live re-delete: no-op
    assert delete_from_search_index(victim.select("doc_id"), idx) == 0
