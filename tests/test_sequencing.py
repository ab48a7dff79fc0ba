"""Sequence packing, chunking (ext/sequencing.py), prefix sum
(operators/windows.py), int8 quantization (ext/quantize.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_weather_jabar_spark.ext.quantize import dim_minmax, quantize_int8
from etl_weather_jabar_spark.ext.sequencing import chunk_documents, pack_sequences
from etl_weather_jabar_spark.operators.windows import scalable_prefix_sum


def test_scalable_prefix_sum_matches_global_window(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        vals=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
    )
    @settings(max_examples=6, deadline=None)
    def check(vals):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], ["id", "v"]
        )
        got = {
            r["id"]: r["ps"]
            for r in scalable_prefix_sum(
                df, ["id"], "v", out_col="ps", num_partitions=3
            ).collect()
        }
        w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
        want = {
            r["id"]: r["ps"]
            for r in df.withColumn("ps", F.sum("v").over(w)).collect()
        }
        assert got == want

    check()


def test_scalable_prefix_sum_exclusive_starts_at_zero(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["id", "v"])
    got = {
        r["id"]: r["ps"]
        for r in scalable_prefix_sum(
            df, ["id"], "v", out_col="ps", exclusive=True, num_partitions=2
        ).collect()
    }
    assert got == {1: 0, 2: 10, 3: 30}


def test_pack_sequences_matches_naive_concat_and_cut(spark):
    # doc i has i+1 tokens; budget 7. Naive: cum-before // 7.
    rows = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, "n", budget=7).collect()
    }
    before = 0
    for i, n in rows:
        assert got[i] == before // 7, f"doc {i}"
        before += n


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 1)], ["doc_id", "n"])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "n", budget=0)


def test_chunk_documents_covers_text_and_reassembles(spark):
    text = "abcdefghijklmnopqrstuvwxyz" * 10  # 260 chars
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    # no overlap: stride == size → concat of chunks == original text
    rows = (
        chunk_documents(df, "text", size=100, stride=100)
        .orderBy("chunk_idx")
        .collect()
    )
    assert "".join(r["chunk"] for r in rows) == text
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    # overlap: stride < size → each chunk ≤ size, consecutive chunks share
    # size - stride chars, every char covered
    rows = (
        chunk_documents(df, "text", size=100, stride=60)
        .orderBy("chunk_idx")
        .collect()
    )
    assert all(len(r["chunk"]) <= 100 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a["chunk"][60:] == b["chunk"][: len(a["chunk"]) - 60]
    covered = sum(min(60, len(r["chunk"])) for r in rows[:-1]) + len(
        rows[-1]["chunk"]
    )
    assert covered == len(text)


def test_chunk_documents_empty_text_yields_one_empty_chunk(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    rows = chunk_documents(df, "text", size=10, stride=5).collect()
    assert len(rows) == 1 and rows[0]["chunk"] == ""


def test_quantize_int8_codes_and_error_bounds(spark):
    emb = spark.createDataFrame(
        [
            (1, [0.0, 5.0, -1.0]),
            (2, [1.0, 5.0, 0.5]),
            (3, [0.25, 5.0, 2.0]),
        ],
        ["vec_id", "embedding"],
    )
    q = quantize_int8(emb).collect()
    stats = {r["pos"]: (r["mn"], r["mx"]) for r in dim_minmax(emb).collect()}
    assert stats[2] == (5.0, 5.0)  # constant dim
    for r in q:
        assert 0 <= r["code"] <= 255
        mn, mx = stats[r["pos"]]
        if mx > mn:
            # floor-based code: error < one quantization step
            assert r["abs_err"] <= (mx - mn) / 255.0 + 1e-12
        else:
            assert r["code"] == 0 and r["abs_err"] == 0.0
    # extremes map exactly: x == mn → code 0; x == mx → code 255, err 0
    by = {(r["vec_id"], r["pos"]): r for r in q}
    assert by[(1, 1)]["code"] == 0 and by[(1, 1)]["abs_err"] == 0.0
    assert by[(2, 1)]["code"] == 255 and by[(2, 1)]["abs_err"] == 0.0


def test_quantize_int8_frozen_codebook_reused(spark):
    train = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 1.0])], ["vec_id", "embedding"]
    )
    codebook = dim_minmax(train).localCheckpoint()
    # out-of-range new vector clamps to the frozen codebook's extremes
    new = spark.createDataFrame([(9, [-5.0, 2.0])], ["vec_id", "embedding"])
    got = {
        r["pos"]: r["code"]
        for r in quantize_int8(new, stats=codebook).collect()
    }
    assert got == {1: 0, 2: 255}


def _py_bpe(texts, rounds):
    """Reference BPE (subword-nmt get_stats/merge semantics)."""
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split())
    vocab = {tuple(w) + ("</w>",): f for w, f in wc.items()}
    out = []
    for rnd in range(1, rounds + 1):
        stats = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        (l, r), c = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rnd, l, r, c))
        newv = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            newv[tuple(merged)] = newv.get(tuple(merged), 0) + f
        vocab = newv
    return out


def test_bpe_train_merges_matches_reference(spark):
    from etl_weather_jabar_spark.ext.sequencing import bpe_train_merges

    texts = [
        "low lower lowest newest newest wide widest low low",
        "new new newer lowest widest wide wide low newest",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train_merges(docs, rounds=5).orderBy("round").collect()
    ]
    assert got == _py_bpe(texts, 5)


def test_bpe_merge_is_left_to_right_non_overlapping(spark):
    """'a a a a a' with best pair (a,a): greedy left-to-right merges
    positions (0,1) and (2,3) only — a fresh merge never re-merges in
    its own round. Overlap counting: the pair stats count (a,a) four
    times (every adjacent occurrence)."""
    from etl_weather_jabar_spark.ext.sequencing import bpe_train_merges

    docs = spark.createDataFrame([("aaaaa aaaaa",)], ["text"])
    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train_merges(docs, rounds=3).orderBy("round").collect()
    ]
    assert got == _py_bpe(["aaaaa aaaaa"], 3)
    # round 1 must be (a, a) with count 2·4 = 8 (overlaps counted)
    assert got[0] == (1, "a", "a", 8)
    # round 2: symbols are [aa, aa, a, </w>] — every pair ties at
    # count 2, so the lexicographic tie-break picks (a, </w>)
    assert got[1] == (2, "a", "</w>", 2)


def test_bpe_vocab_encoding_matches_reference(spark):
    """The post-merge symbol table (the apply side) matches the python
    reference's final vocab: same segmentation, same token counts."""
    from collections import Counter

    from etl_weather_jabar_spark.ext.sequencing import bpe_vocab

    texts = [
        "low lower lowest newest newest wide widest low low",
        "new new newer lowest widest wide wide low newest",
    ]
    rounds = 5
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        r["w"]: (r["f"], r["s"], r["n_syms"])
        for r in bpe_vocab(docs, rounds=rounds).collect()
    }

    wc = Counter(w for t in texts for w in t.split())
    vocab = {w: [*w, "</w>"] for w in wc}
    for rnd in range(rounds):
        stats = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += wc[w]
        (l, r), _ = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    assert got == {
        w: (wc[w], " ".join(syms), len(syms)) for w, syms in vocab.items()
    }


def test_wordpiece_greedy_longest_match_and_unk(spark):
    """WordPiece encode pinned on a hand-built vocab: greedy
    longest-match-first (prefers the 3-char piece over 2/1), continuation
    pieces get the ## display prefix, and a word with an unmatchable
    position becomes ONE [UNK] token (all-or-nothing, canonical
    WordPiece) — plus the corpus-derived vocab guarantees no [UNK] on
    in-corpus words."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.tokenize import (
        UNK,
        substring_vocab,
        word_counts,
        wordpiece_encode,
    )

    words = spark.createDataFrame(
        [("unable", 2), ("unit", 1), ("qxy", 1)], ["w", "f"]
    ).select("w", F.col("f").cast("bigint").alias("f"))
    vocab = spark.createDataFrame(
        [("una", 3), ("un", 2), ("ble", 3), ("u", 1), ("n", 1),
         ("a", 1), ("b", 1), ("l", 1), ("e", 1), ("it", 2), ("q", 1)],
        ["piece", "plen"],
    ).select("piece", F.col("plen").cast("bigint").alias("plen"))
    em = wordpiece_encode(words, vocab)
    got = {}
    for r in em.collect():
        got.setdefault(r["w"], []).append((r["i"], r["dp"]))
    got = {w: [p for _, p in sorted(v)] for w, v in got.items()}
    # greedy takes "una" (len 3) even though "un" is also in vocab
    assert got["unable"] == ["una", "##ble"]
    assert got["unit"] == ["un", "##it"]
    # "qxy": q matches, then 'x' has no piece → whole word is one [UNK]
    assert got["qxy"] == [UNK]

    # corpus-derived vocab: single-char coverage → zero [UNK]
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], ["doc_id", "text"]
    )
    wc = word_counts(docs)
    v = substring_vocab(wc, max_len=3, top_k=4)
    em2 = wordpiece_encode(wc, v)
    assert em2.where(F.col("piece") == UNK).count() == 0
    # every word reassembles exactly from its pieces, in order
    back = {
        r["w"]: r["j"]
        for r in em2.groupBy("w")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("i", "piece")))
                .getField("piece")
            ).alias("j")
        )
        .collect()
    }
    assert back == {"alpha": "alpha", "beta": "beta", "gamma": "gamma"}


def _py_unigram_viterbi(w, scores):
    """Independent python Viterbi: min (pieces, -score sum, length-path)
    by exhaustive DP — the reference the relational frontier loop and
    its encoded-string least() must match."""
    dp = [None] * (len(w) + 1)
    dp[0] = (0, 0, "")
    for j in range(1, len(w) + 1):
        best = None
        for ln in (1, 2, 3):
            i = j - ln
            if i < 0 or dp[i] is None:
                continue
            piece = w[i:j]
            if piece not in scores:
                continue
            cand = (
                dp[i][0] + 1,
                dp[i][1] - scores[piece],
                dp[i][2] + f"{ln},",
            )
            if best is None or cand < best:
                best = cand
        dp[j] = best
    return dp[len(w)]


def _py_unigram_pieces(w, path):
    out, pos = [], 0
    for d in path.split(",")[:-1]:
        ln = int(d)
        out.append(w[pos : pos + ln])
        pos += ln
    return out


def _py_unigram_train(words, seed_top_k, keep_top_k):
    """Independent replay of the full Viterbi-EM chain: seed substring
    scores → best segmentation → usage counts → prune → trained scores."""
    from collections import Counter

    subs = Counter()
    for w, f in words.items():
        for p in range(len(w)):
            for ln in (1, 2, 3):
                if p + ln <= len(w):
                    subs[w[p : p + ln]] += f
    singles = {s: c for s, c in subs.items() if len(s) == 1}
    multis = sorted(
        ((s, c) for s, c in subs.items() if len(s) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:seed_top_k]
    seed = dict(singles)
    seed.update(dict(multis))
    usage = Counter()
    for w, f in words.items():
        res = _py_unigram_viterbi(w, seed)
        for piece in _py_unigram_pieces(w, res[2]):
            usage[piece] += f
    trained = {s: usage.get(s, 0) for s in singles}
    kept = sorted(
        ((s, usage[s]) for s, _ in multis if usage.get(s, 0) > 0),
        key=lambda x: (-x[1], x[0]),
    )[:keep_top_k]
    trained.update(dict(kept))
    return trained


def test_unigram_viterbi_em_matches_python_replay(spark):
    """Unigram-LM tokenization (Kudo 2018, Viterbi-EM form): the full
    Spark chain — seed scores, first Viterbi pass, hard-EM usage
    re-estimation, prune, final Viterbi pass — matches an independent
    python implementation word-for-word and piece-for-piece, including
    on words with genuine segmentation ambiguity."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.tokenize import (
        unigram_pieces,
        unigram_train_scores,
        unigram_viterbi_encode,
    )

    rows = [
        ("banana", 3),
        ("bandana", 1),
        ("ana", 5),
        ("nab", 2),
        ("x", 1),
        ("xyzxyz", 4),
        ("aaaaaaa", 2),
        ("zqzqzq", 1),
        ("nanana", 6),
        ("abcabcabc", 2),
    ]
    wdf = spark.createDataFrame(rows, "w STRING, f BIGINT")
    scores = unigram_train_scores(wdf, seed_top_k=8, keep_top_k=4)
    got_scores = {
        r["piece"]: r["score"] for r in scores.collect()
    }
    want_scores = _py_unigram_train(dict(rows), 8, 4)
    assert got_scores == want_scores

    em = unigram_pieces(unigram_viterbi_encode(wdf, scores))
    got = {}
    for r in em.collect():
        got.setdefault(r["w"], []).append((r["i"], r["piece"]))
    got = {w: [p for _, p in sorted(v)] for w, v in got.items()}
    want = {
        w: _py_unigram_pieces(w, _py_unigram_viterbi(w, want_scores)[2])
        for w, _ in rows
    }
    assert got == want


def test_unigram_viterbi_beats_greedy_and_handles_unk(spark):
    """Viterbi finds globally best segmentations greedy longest-match
    cannot: on vocab {xy, yz, x, z} with score(x)+score(yz) >
    score(xy)+score(z), 'xyz' segments as x|yz under unigram while
    WordPiece's greedy takes xy|z; and an external vocab missing a
    character yields the all-or-nothing NULL-lens → [UNK] row."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.ext.tokenize import (
        UNK,
        unigram_pieces,
        unigram_viterbi_encode,
        wordpiece_encode,
    )

    words = spark.createDataFrame([("xyz", 1)], "w STRING, f BIGINT")
    vocab = spark.createDataFrame(
        [("xy", 2, 5), ("yz", 2, 9), ("x", 1, 2), ("z", 1, 1)],
        "piece STRING, plen BIGINT, score BIGINT",
    )
    uni = [
        r["piece"]
        for r in unigram_pieces(unigram_viterbi_encode(words, vocab))
        .orderBy("i")
        .collect()
    ]
    assert uni == ["x", "yz"]  # 2 pieces both ways; 2+9 beats 5+1
    wp = [
        r["piece"]
        for r in wordpiece_encode(words, vocab.select("piece", "plen"))
        .orderBy("i")
        .collect()
    ]
    assert wp == ["xy", "z"]  # greedy longest-first takes xy

    # fewest pieces dominates score: add a high-score single 'y' — the
    # 2-piece splits still win over x|y|z even though its sum is larger
    vocab2 = vocab.union(
        spark.createDataFrame([("y", 1, 100)], vocab.schema)
    )
    uni2 = [
        r["piece"]
        for r in unigram_pieces(unigram_viterbi_encode(words, vocab2))
        .orderBy("i")
        .collect()
    ]
    assert uni2 == ["x", "yz"]

    # external vocab with a coverage hole → all-or-nothing [UNK]
    hole = spark.createDataFrame(
        [("x", 1, 2), ("y", 1, 1)], "piece STRING, plen BIGINT, score BIGINT"
    )
    unk = unigram_pieces(unigram_viterbi_encode(words, hole)).collect()
    assert [(r["i"], r["piece"]) for r in unk] == [(0, UNK)]


def test_tokenizer_inline_fast_path_matches_loop_form(spark, monkeypatch):
    """Optimization round 8: the inline fast path (vocab folded into one
    higher-order aggregate() as array/map literals) must be row-identical
    to the relational per-character loop for BOTH tokenizers, including
    the [UNK] paths — pinned by running the same encode with the inline
    threshold at its default and forced to 0 (loop form)."""
    from pyspark.sql import functions as F

    import etl_weather_jabar_spark.ext.tokenize as T

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alphabet zz"),
            (2, "beta gamma gamma alphabet"),
            (3, "qx zz alpha"),
        ],
        ["doc_id", "text"],
    )
    words = T.word_counts(docs)
    wp_vocab = T.substring_vocab(words, max_len=3, top_k=6)
    uni_scores = T.unigram_train_scores(
        words, seed_top_k=6, keep_top_k=4
    )
    # external vocab with a coverage hole exercises the NULL-slot /
    # unmatched branches in both forms
    hole = spark.createDataFrame(
        [("a", 1, 5), ("l", 1, 1), ("ph", 2, 3), ("bet", 3, 4)],
        "piece STRING, plen BIGINT, score BIGINT",
    )

    def run_both(fn):
        fast = sorted(map(tuple, fn().collect()))
        monkeypatch.setattr(T, "_INLINE_VOCAB_MAX", 0)
        loop = sorted(map(tuple, fn().collect()))
        monkeypatch.setattr(T, "_INLINE_VOCAB_MAX", 4096)
        assert fast == loop and fast
        return fast

    run_both(lambda: T.wordpiece_encode(words, wp_vocab))
    run_both(lambda: T.unigram_viterbi_encode(words, uni_scores))
    rows = run_both(
        lambda: T.unigram_viterbi_encode(
            words, hole.select("piece", "plen", "score")
        )
    )
    # the hole vocab leaves some word unsegmentable: NULL np/lens rows
    assert any(r[1] is None for r in rows)
    # the inline UNK-sentinel guard fires without running a job
    bad = wp_vocab.union(
        spark.createDataFrame([(T.UNK, 5)], "piece STRING, plen BIGINT")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sentinel"):
        T.wordpiece_encode(words, bad, max_len=5)
