"""WordPiece-style subword tokenization as relational algebra.

The inference side of the BERT tokenizer (Wu et al. 2016, "Google's
Neural Machine Translation System", §4.1 — the MaxMatch / greedy
longest-match-first segmentation later formalized in Song et al. 2021,
"Fast WordPiece Tokenization"): given a subword vocabulary, each word is
segmented left-to-right by repeatedly taking the LONGEST vocabulary
piece that prefixes the remaining suffix; a word with an unmatchable
position becomes the single ``[UNK]`` token (canonical WordPiece
behavior — no partial emission). Pieces after the first are continuation
pieces, displayed with the ``##`` prefix.

Two deliberate design choices for the distributed setting:

* **Segment the vocabulary, not the corpus.** Tokenization runs over the
  DISTINCT word table (vocabulary-sized — bounded regardless of corpus
  size), and the corpus joins against the finished ``(word → pieces)``
  table, which is broadcastable. This is how production pipelines
  amortize tokenizer cost at 100 TB: the quadratic-ish per-word loop
  touches each distinct word once, and the corpus-sized work is one
  broadcast hash join.
* **Bounded piece length ⇒ pure equi-joins.** With ``max_len`` fixed,
  "longest matching prefix" is a COALESCE over ``max_len`` LEFT
  equi-joins (piece = fixed-length prefix of the remainder) — no
  non-equi join, no window, no UDF; the same shape a recursive-CTE SQL
  oracle can replay bit-for-bit.

Vocabulary derivation here is frequency-based (all single characters for
total coverage, plus the top-k most frequent longer substrings,
occurrence-weighted, ties broken lexicographically) — a deterministic
stand-in for the likelihood-trained vocabulary a real WordPiece trainer
produces; the ENCODER is exactly the production algorithm, and accepts
any externally supplied vocab table.

Reference anchor: the reference repo has no tokenizer (SURVEY §2); this
is a driver-mandated LLM-pipeline extension alongside ext/sequencing.py's
BPE trainer (the other major subword family).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import spread
from ..planmode import checkpoint, is_plan_only

UNK = "[UNK]"

# Inline fast-path threshold (optimization round 8): a vocabulary at or
# under this row count is folded into the segmentation expression as
# array/map LITERALS, turning the per-character DP loop (a localCheckpoint
# + isEmpty probe + max_len broadcast joins PER CHARACTER of the longest
# word — ~2 scheduled Spark jobs per round, ~15 s of pure job overhead at
# sf0.1) into ONE higher-order aggregate() per word: zero loops, zero
# joins, zero checkpoints, bit-identical arithmetic. Every engine call
# site derives its vocab with top_k ≤ 32 learned pieces + single-character
# coverage, far under the default; an externally supplied vocabulary
# larger than this keeps the loop form, whose broadcast joins scale to
# vocabularies that would bloat a plan literal. Parameterized for
# production tuning (plans embed ~vocab bytes per task; 4096 pieces ≈
# tens of KB — safe; 10⁶ would not be).
_INLINE_VOCAB_MAX = int(
    os.environ.get("SPARK_GRAFT_TOKENIZER_INLINE_VOCAB_MAX", "4096")
)


def _decode_len_path(segd: DataFrame) -> DataFrame:
    """(w, lens) with comma-terminated piece-length paths → (w, i, piece):
    positional decode — piece i starts after the sum of the first i
    lengths (the same expression as :func:`unigram_pieces`)."""
    larr = F.filter(F.split("lens", ","), lambda x: x != "")
    exp = segd.select("w", larr.alias("larr")).select(
        "w", F.posexplode("larr").alias("i", "lstr"), F.col("larr")
    )
    return exp.select(
        "w",
        F.col("i").cast("bigint").alias("i"),
        F.expr(
            "substring(w, CAST(1 + aggregate(slice(larr, 1, i), 0L, "
            "(a, x) -> a + CAST(x AS BIGINT)) AS INT), CAST(lstr AS INT))"
        ).alias("piece"),
    )


def _wordpiece_encode_inline(
    words: DataFrame, vocab_rows: list[tuple[str, int]], max_len: int
) -> DataFrame:
    """Greedy MaxMatch as ONE JVM expression: fold over character
    positions (``aggregate(sequence(1, length(w)), …)``) with the vocab
    as per-length sorted array literals. State (ok, pos, lens): pos is
    the 1-based next position, lens the comma-terminated piece-length
    path. Each active step takes the LONGEST vocab piece prefixing
    w[pos:] — the same longest-first pick as the loop form's coalesce —
    and an unmatched position flips ok=false (the word becomes one
    [UNK], the all-or-nothing contract). Each step consumes ≥ 1
    character, so length(w) fold steps always finish the word; finished
    (or failed) states pass through untouched."""
    by_len = {
        ln: sorted({p for p, pl in vocab_rows if pl == ln})
        for ln in range(1, max_len + 1)
    }
    init = F.struct(
        F.lit(True).alias("ok"),
        F.lit(1).alias("pos"),
        F.lit("").alias("lens"),
    )

    def step(acc, _):
        w = F.col("w")
        expr = F.struct(
            F.lit(False).alias("ok"),
            acc["pos"].alias("pos"),
            acc["lens"].alias("lens"),
        )
        # built shortest → longest so the longest match is the OUTERMOST
        # when(): greedy longest-match-first, like the loop's coalesce
        for ln in range(1, max_len + 1):
            if not by_len[ln]:
                continue
            m = F.array_contains(
                F.lit(by_len[ln]), w.substr(acc["pos"], F.lit(ln))
            )
            expr = F.when(
                m,
                F.struct(
                    F.lit(True).alias("ok"),
                    (acc["pos"] + F.lit(ln)).alias("pos"),
                    F.concat(acc["lens"], F.lit(f"{ln},")).alias("lens"),
                ),
            ).otherwise(expr)
        done = (~acc["ok"]) | (acc["pos"] > F.length(w))
        return F.when(done, acc).otherwise(expr)

    enc = words.select(
        "w",
        F.aggregate(F.sequence(F.lit(1), F.length("w")), init, step).alias(
            "st"
        ),
    )
    pieces = _decode_len_path(
        enc.where(F.col("st.ok")).select("w", F.col("st.lens").alias("lens"))
    )
    em = pieces.select(
        "w",
        "i",
        "piece",
        F.when(F.col("i") == 0, F.col("piece"))
        .otherwise(F.concat(F.lit("##"), F.col("piece")))
        .alias("dp"),
    )
    unk_rows = enc.where(~F.col("st.ok")).select(
        "w",
        F.lit(0).cast("bigint").alias("i"),
        F.lit(UNK).alias("piece"),
        F.lit(UNK).alias("dp"),
    )
    return em.unionByName(unk_rows)


def word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(w, f): distinct whitespace words with corpus occurrence counts —
    the vocabulary-sized frame every later stage runs on."""
    return (
        spread(docs.select(F.col(text_col).alias("__t")))
        .select(F.explode(F.split("__t", r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )


def substring_vocab(
    words: DataFrame, max_len: int = 3, top_k: int = 24
) -> DataFrame:
    """Derive a subword vocabulary from the distinct-word table: every
    single character (guarantees in-corpus words never hit [UNK]) plus
    the ``top_k`` most frequent substrings of length 2..``max_len``
    (occurrence-weighted by word frequency, ties broken by the piece
    string). Returns (piece, plen). Vocabulary-sized input ⇒ the
    explode is |w|·max_len per distinct word, corpus-independent."""
    pos = words.select(
        "w", "f", F.explode(F.sequence(F.lit(1), F.length("w"))).alias("p")
    )
    lens = pos.select(
        "w",
        "f",
        "p",
        F.explode(
            F.sequence(F.lit(1), F.lit(max_len)).cast("array<int>")
        ).alias("l"),
    ).where(F.col("p") + F.col("l") - 1 <= F.length("w"))
    subs = (
        lens.select(
            F.expr("substring(w, p, l)").alias("piece"),
            F.col("l").cast("bigint").alias("plen"),
            "f",
        )
        .groupBy("piece", "plen")
        .agg(F.sum("f").alias("c"))
    )
    v1 = subs.where(F.col("plen") == 1).select("piece", "plen")
    vtop = (
        subs.where(F.col("plen") > 1)
        .orderBy(F.col("c").desc(), F.col("piece").asc())
        .limit(top_k)
        .select("piece", "plen")
    )
    return v1.unionByName(vtop)


def wordpiece_encode(
    words: DataFrame, vocab: DataFrame, max_len: int = 3, parts: int = 1
) -> DataFrame:
    """Greedy longest-match-first segmentation of the distinct-word
    table against ``vocab`` (piece, plen). Returns one row per emitted
    piece: (w, i, piece, dp) where ``i`` is the piece index within the
    word and ``dp`` the display form (``##``-prefixed continuations,
    ``[UNK]`` for unmatchable words — which consume the WHOLE word, the
    canonical all-or-nothing WordPiece contract).

    Per iteration each unfinished word carries one state row; the
    longest-prefix pick is ``coalesce`` over ``max_len`` broadcast LEFT
    equi-joins (longest length first). The state frame is
    vocabulary-sized; iterations ≤ the longest word's length, with a
    localCheckpoint per round so the plan stays flat (identity in
    plan-only mode, where a single representative round is built).

    ``parts`` sizes the loop's partitioning: the state frame is the
    DISTINCT-WORD table, orders of magnitude smaller than the corpus,
    so the default 1 keeps each of the ~max-word-length iterations a
    single-task job instead of inheriting the corpus's partition count
    (32 empty-ish tasks per round dominated the wall clock). A truly
    web-scale vocabulary (10⁸ distinct words) sets parts ≈ vocab_rows /
    10⁶ — the loop cost scales with the vocabulary, never the corpus.

    Sentinel guard: the [UNK] retraction keys on the literal piece
    string, so a vocab that CONTAINS "[UNK]" as a learned piece (only
    possible at max_len ≥ 5) would silently retract legitimate
    segmentations emitting it — ENFORCED here with a ValueError rather
    than left as a caveat for callers to read (round-7 advisor):
    externally supplied vocab tables must not carry the sentinel
    (substring_vocab at its defaults cannot produce it).

    Fast path (optimization round 8): when the vocabulary fits in
    ``_INLINE_VOCAB_MAX`` rows — every engine call site, whose vocab is
    all single characters + top_k ≤ 32 learned pieces — the whole greedy
    DP runs as one higher-order ``aggregate()`` per word with the vocab
    as array literals (:func:`_wordpiece_encode_inline`): identical
    output, zero per-round jobs (measured ~6 s → ~1.5 s at sf0.1 for
    wordpiece_encode_stats). The sized probe (``limit(MAX+1).collect()``)
    never pulls more than MAX+1 rows, and the UNK guard runs on the
    collected rows for free; larger external vocabularies keep the
    broadcast-join loop below unchanged (with its original isEmpty UNK
    guard). Plan-only mode builds the inline shape from a placeholder
    vocab — the audited plan shows the shape that actually executes,
    the same convention as the IVF placeholder centroids."""
    if is_plan_only():
        return _wordpiece_encode_inline(
            words, [("a" * ln, ln) for ln in range(1, max_len + 1)], max_len
        )
    probe = vocab.select("piece", "plen").limit(
        _INLINE_VOCAB_MAX + 1
    ).collect()
    if any(r["piece"] == UNK for r in probe):
        raise ValueError(
            f"wordpiece_encode: vocabulary contains the literal "
            f"sentinel piece {UNK!r}; the all-or-nothing retraction "
            "keys on that string, so legitimate segmentations would "
            "be retracted — remove it from the vocab"
        )
    if len(probe) <= _INLINE_VOCAB_MAX:
        # malformed-external-vocab parity with the loop form (round-8
        # advisor): a NULL piece/plen row never matches any substring
        # join in the loop, so it is skipped here too rather than
        # crashing int(None); duplicate (piece, plen) rows would give
        # the loop form duplicated frontier rows (garbage either way) —
        # fail loudly instead of silently last-wins-deduping in the map
        rows = [
            (r["piece"], int(r["plen"]))
            for r in probe
            if r["piece"] is not None and r["plen"] is not None
        ]
        if len(set(rows)) != len(rows):
            raise ValueError(
                "wordpiece_encode: vocabulary has duplicate "
                "(piece, plen) rows — dedupe it first"
            )
        return _wordpiece_encode_inline(words, rows, max_len)
    if not vocab.where(F.col("piece") == UNK).isEmpty():
        raise ValueError(
            f"wordpiece_encode: vocabulary contains the literal "
            f"sentinel piece {UNK!r}; the all-or-nothing retraction "
            "keys on that string, so legitimate segmentations would "
            "be retracted — remove it from the vocab"
        )
    vocab = F.broadcast(
        checkpoint(vocab.select("piece", "plen").coalesce(parts))
    )
    by_len = {
        ln: vocab.where(F.col("plen") == ln).select(
            F.col("piece").alias(f"__p{ln}")
        )
        for ln in range(1, max_len + 1)
    }
    if is_plan_only():
        iters = 1
    else:
        row = words.agg(F.max(F.length("w"))).collect()[0][0]
        iters = int(row or 1)

    state = words.select(
        "w", F.col("w").alias("rem"), F.lit(0).alias("i")
    ).coalesce(parts)
    outs: list[DataFrame] = []
    for _ in range(iters):
        state = checkpoint(state)
        # probe the just-MATERIALIZED frame (≈ free), so each round's
        # step computes exactly once — not once for the probe and once
        # for the next round's checkpoint
        if not is_plan_only() and state.isEmpty():
            break
        j = state
        for ln in range(max_len, 0, -1):
            j = j.join(
                by_len[ln],
                F.substring(F.col("rem"), 1, ln) == F.col(f"__p{ln}"),
                "left",
            )
        pick = F.coalesce(
            *[F.col(f"__p{ln}") for ln in range(max_len, 0, -1)]
        )
        step = j.select(
            "w",
            "rem",
            "i",
            F.coalesce(pick, F.lit(UNK)).alias("piece"),
            F.when(
                pick.isNull(), F.lit("")
            )
            .otherwise(F.expr("substring(rem, length(" + _pick_sql(max_len) + ") + 1)"))
            .alias("rem2"),
        )
        outs.append(step.select("w", "i", "piece"))
        state = step.where(F.col("rem2") != "").select(
            "w",
            F.col("rem2").alias("rem"),
            (F.col("i") + 1).alias("i"),
        )
    from functools import reduce as _reduce

    if not outs:  # empty word table: empty emission frame, same schema
        outs = [
            words.select(
                "w", F.lit(0).alias("i"), F.lit(UNK).alias("piece")
            ).where(F.lit(False))
        ]

    em = _reduce(lambda a, b: a.unionByName(b), outs).select(
        "w",
        F.col("i").cast("bigint").alias("i"),
        "piece",
        F.when(F.col("i") == 0, F.col("piece"))
        .otherwise(F.concat(F.lit("##"), F.col("piece")))
        .alias("dp"),
    )
    # canonical all-or-nothing [UNK]: a word with ANY unmatchable
    # position retracts its partial pieces and becomes ONE [UNK] token
    unkw = em.where(F.col("piece") == UNK).select("w").distinct()
    clean = em.join(unkw, "w", "left_anti")
    unk_rows = unkw.select(
        "w",
        F.lit(0).cast("bigint").alias("i"),
        F.lit(UNK).alias("piece"),
        F.lit(UNK).alias("dp"),
    )
    return clean.unionByName(unk_rows)


def _pick_sql(max_len: int) -> str:
    cols = ", ".join(f"__p{ln}" for ln in range(max_len, 0, -1))
    return f"coalesce({cols})"


def wordpiece_doc_stats(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    max_len: int = 3,
    top_k: int = 24,
) -> DataFrame:
    """Per-source tokenization statistics under a corpus-derived
    WordPiece vocabulary: word/piece totals, half-up mean pieces-per-word
    in ppm, words that fell to [UNK], and the distinct display-piece
    count — the fertility numbers a tokenizer rollout is judged by."""
    from ..functions.exact import half_up_div

    srcw = (
        spread(docs.select(F.col(source_col).alias("source"), text_col))
        .select(
            "source", F.explode(F.split(text_col, r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    # srcw feeds three consumers (words derivation + the two per-source
    # rollup joins) and words feeds both the build-time vocab actions and
    # the final plan — materialize each once (identity in plan-only mode)
    srcw = checkpoint(srcw)
    words = checkpoint(srcw.groupBy("w").agg(F.sum("f").alias("f")))
    vocab = substring_vocab(words, max_len=max_len, top_k=top_k)
    # em feeds TWO consumers (the per-source rollup join and the
    # distinct-piece join) — without materialization the whole greedy
    # fold re-executes per consumer (optimization round 9, guide §2.4;
    # vocabulary-sized: ~pieces-per-word rows per distinct word)
    em = checkpoint(wordpiece_encode(words, vocab, max_len=max_len))
    encw = em.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pieces"),
        F.max((F.col("piece") == UNK).cast("int")).alias("has_unk"),
    )
    per_src = (
        srcw.join(encw, "w")
        .groupBy("source")
        .agg(
            F.sum("f").cast("bigint").alias("n_words"),
            F.sum(F.col("f") * F.col("n_pieces"))
            .cast("bigint")
            .alias("n_pieces"),
            F.sum(F.col("f") * F.col("has_unk"))
            .cast("bigint")
            .alias("unk_words"),
        )
        .withColumn(
            "avg_pieces_ppm",
            half_up_div(
                F.col("n_pieces") * F.lit(1_000_000), F.col("n_words")
            ).cast("bigint"),
        )
    )
    dpieces = (
        srcw.select("source", "w")
        .join(em.select("w", "dp"), "w")
        .groupBy("source")
        .agg(F.countDistinct("dp").cast("bigint").alias("distinct_pieces"))
    )
    return per_src.join(dpieces, "source").select(
        "source",
        "n_words",
        "n_pieces",
        "avg_pieces_ppm",
        "unk_words",
        "distinct_pieces",
    )


# ===========================================================================
# Unigram-LM (SentencePiece) tokenization — the third mainstream subword
# family next to BPE (ext/sequencing.py) and WordPiece (above).
#
# Kudo 2018 ("Subword Regularization", §3.2) trains a unigram language
# model over subword candidates with EM and segments by Viterbi search
# for the most probable piece sequence. This implementation is the
# deterministic, exactly-replayable relational form of that recipe:
#
# * **Viterbi (hard) EM**: the E-step uses the single best segmentation
#   instead of lattice expectations (the classic Viterbi-EM variant of
#   EM) — expected counts become exact integer usage counts, so training
#   is bit-reproducible in any engine, where float forward-backward
#   posteriors would not be.
# * **Exact integer Viterbi objective**: piece "probabilities" are
#   occurrence counts under a shared denominator, so maximizing
#   Π count_i / T^k  ⇔  lexicographically minimizing
#   (k, −Σ log count_i ...) is REPLACED by the exact integer total order
#   (piece count ASC, summed piece score DESC, piece-length path ASC) —
#   fewest pieces first exactly as the unigram prior prefers (each extra
#   piece divides by T ≫ count_i), then highest-frequency pieces, then a
#   deterministic path tie-break. No float ever enters the DP.
# * **The DP is a bounded frontier shift, not a search**: with
#   max_len ≤ 3, dp[j+1] depends only on dp[j], dp[j-1], dp[j-2] — each
#   round carries three (np, sum, path) slots per word and advances ONE
#   character position via three broadcast vocab equi-joins; iterations
#   = longest word, over the DISTINCT-WORD table (vocabulary-sized, like
#   wordpiece_encode — the corpus never enters the loop).
# * **Candidate comparison is ONE string min**: each candidate encodes as
#   lpad(np, 4) || lpad(BOUND − sum, 15) || path, making the exact tuple
#   order a plain least() over VARCHARs in both Spark and DuckDB (equal
#   np ⇒ equal path length, so the lexicographic path tie-break is
#   suffix-independent and the DP keeps optimal substructure).
# ===========================================================================

_UNI_BOUND = 10**14  # sum-field bound for the encoded candidate strings


def unigram_seed_scores(
    words: DataFrame, max_len: int = 3, top_k: int = 32
) -> DataFrame:
    """EM seed vocabulary with integer scores: every single character
    (full coverage — no in-corpus word can become unsegmentable) plus
    the ``top_k`` highest-scoring substrings of length 2..``max_len``,
    score = occurrence-weighted substring count (ties broken by the
    piece string). Returns (piece, plen, score)."""
    pos = words.select(
        "w", "f", F.explode(F.sequence(F.lit(1), F.length("w"))).alias("p")
    )
    lens = pos.select(
        "w",
        "f",
        "p",
        F.explode(
            F.sequence(F.lit(1), F.lit(max_len)).cast("array<int>")
        ).alias("l"),
    ).where(F.col("p") + F.col("l") - 1 <= F.length("w"))
    subs = (
        lens.select(
            F.expr("substring(w, p, l)").alias("piece"),
            F.col("l").cast("bigint").alias("plen"),
            "f",
        )
        .groupBy("piece", "plen")
        .agg(F.sum("f").cast("bigint").alias("score"))
    )
    v1 = subs.where(F.col("plen") == 1)
    vtop = (
        subs.where(F.col("plen") > 1)
        .orderBy(F.col("score").desc(), F.col("piece").asc())
        .limit(top_k)
    )
    return v1.unionByName(vtop).select("piece", "plen", "score")


def _unigram_viterbi_inline(
    words: DataFrame, vocab_rows: list[tuple[str, int, int]]
) -> DataFrame:
    """The Viterbi DP as ONE JVM expression: fold the 3-slot frontier
    over character positions (``aggregate(sequence(1, length(w)), …)``)
    with the vocab as per-length map literals (piece → score). The
    candidate encoding (lpad strings under ``_UNI_BOUND``), the
    ``least()`` comparison, the pick/shift logic and the substring
    positions are the SAME expressions as the loop form — the lookups
    are ``element_at`` on a map literal instead of broadcast LEFT
    equi-joins — so the (w, np, lens) output is bit-identical. One fold
    step advances exactly one character position like one loop round;
    after length(w) steps j == length(w), the loop's harvest condition."""
    maps = {
        ln: {p: int(s) for p, pl, s in vocab_rows if pl == ln}
        for ln in (1, 2, 3)
    }

    def map_lit(d):
        if not d:
            return None
        # ONE map literal built from two array literals instead of
        # create_map's 2·|vocab| literal children (optimization round
        # 9, verdict item 7): every s1/s2/s3 lookup below is duplicated
        # ~9× through the candidate/decode expansion, so a ~100-node
        # map subtree became thousands of analyzed nodes per plan —
        # map_from_arrays keeps each lookup at ~4 nodes. Catalyst
        # constant-folds both forms to the same MapData literal, so the
        # evaluated expression (and the encode output) is unchanged.
        keys = sorted(d)
        return F.map_from_arrays(
            F.lit(keys), F.lit([d[k] for k in keys]).cast("array<bigint>")
        )

    m1, m2, m3 = map_lit(maps[1]), map_lit(maps[2]), map_lit(maps[3])
    nb = F.lit(None).cast("bigint")
    # aggregate() takes the state TYPE — including nullability — from the
    # initial value, and Catalyst folds any nullable wrapper around a
    # literal away, so a dead DP slot cannot be a NULL field without
    # codegen NPEs. Dead slots are therefore the SENTINEL (np=-1, sm=0,
    # ls="") inside the fold — candidates gate on np >= 0 exactly where
    # the loop form gates on np IS NOT NULL (the sentinel sm/ls are never
    # read through that gate) — and the final projection converts the
    # sentinel back to the loop's NULL np/lens contract.
    dead_np, dead_sm, dead_ls = (
        F.lit(-1).cast("bigint"),
        F.lit(0).cast("bigint"),
        F.lit(""),
    )
    init = F.struct(
        F.lit(0).alias("j"),
        F.lit(0).cast("bigint").alias("d0np"),
        F.lit(0).cast("bigint").alias("d0sm"),
        F.lit("").alias("d0ls"),
        dead_np.alias("d1np"),
        dead_sm.alias("d1sm"),
        dead_ls.alias("d1ls"),
        dead_np.alias("d2np"),
        dead_sm.alias("d2sm"),
        dead_ls.alias("d2ls"),
    )

    def step(acc, _):
        w = F.col("w")
        j = acc["j"]
        # piece of length l ending at position j+1 starts at j+2-l — the
        # same substring positions as the loop's join keys (the
        # out-of-range starts at j < 2 are dead: their slot sentinel)
        s1 = F.element_at(m1, w.substr(j + 1, F.lit(1))) if m1 is not None else nb
        s2 = F.element_at(m2, w.substr(j, F.lit(2))) if m2 is not None else nb
        s3 = F.element_at(m3, w.substr(j - 1, F.lit(3))) if m3 is not None else nb

        def cand(np_, sm, ls, s, ln):
            return F.when(
                (np_ >= 0) & s.isNotNull(),
                F.concat(
                    F.lpad((np_ + 1).cast("string"), 4, "0"),
                    F.lpad(
                        (F.lit(_UNI_BOUND) - (sm + s)).cast("string"),
                        15,
                        "0",
                    ),
                    ls,
                    F.lit(f"{ln},"),
                ),
            )

        c1 = cand(acc["d0np"], acc["d0sm"], acc["d0ls"], s1, 1)
        c2 = cand(acc["d1np"], acc["d1sm"], acc["d1ls"], s2, 2)
        c3 = cand(acc["d2np"], acc["d2sm"], acc["d2ls"], s3, 3)
        best = F.least(c1, c2, c3)

        # the new d0 slot DECODES the winning candidate string instead of
        # re-selecting among the slot expressions (the loop form's pick):
        # the encoding is lossless — lpad(np,4) || lpad(BOUND−sm,15) ||
        # path — and the loop's pick() returns exactly the fields of the
        # least() winner (equal strings ⇒ equal np/sm/path), so the
        # decode is value-identical while keeping the generated code ~4×
        # smaller (pick duplicated every candidate subtree per output);
        # a NULL best (no candidate) decodes to the dead-slot sentinel
        nxt = F.struct(
            (j + 1).alias("j"),
            F.coalesce(
                F.substring(best, 1, 4).cast("bigint"), dead_np
            ).alias("d0np"),
            F.coalesce(
                F.lit(_UNI_BOUND) - F.substring(best, 5, 15).cast("bigint"),
                dead_sm,
            )
            .cast("bigint")
            .alias("d0sm"),
            F.coalesce(F.substring(best, 20, 1 << 30), dead_ls).alias(
                "d0ls"
            ),
            acc["d0np"].alias("d1np"),
            acc["d0sm"].alias("d1sm"),
            acc["d0ls"].alias("d1ls"),
            acc["d1np"].alias("d2np"),
            acc["d1sm"].alias("d2sm"),
            acc["d1ls"].alias("d2ls"),
        )
        return F.when(j >= F.length(w), acc).otherwise(nxt)

    enc = words.select(
        "w",
        F.aggregate(F.sequence(F.lit(1), F.length("w")), init, step).alias(
            "st"
        ),
    )
    alive = F.col("st.d0np") >= 0
    return enc.select(
        "w",
        F.when(alive, F.col("st.d0np")).alias("np"),
        F.when(alive, F.col("st.d0ls")).alias("lens"),
    )


def unigram_viterbi_encode(
    words: DataFrame,
    vocab: DataFrame,
    max_len: int = 3,
    parts: int = 1,
) -> DataFrame:
    """Viterbi segmentation of the distinct-word table under integer
    piece scores (vocab: piece, plen, score): per word the UNIQUE best
    path by (piece count ASC, summed score DESC, length-path ASC).
    Returns (w, np, lens) — ``lens`` is the comma-terminated
    piece-length path (e.g. ``"3,1,2,"``), NULL for a word the vocab
    cannot segment (possible only with an external vocab missing
    single characters); expand to pieces with :func:`unigram_pieces`.

    Same scale contract as :func:`wordpiece_encode`: the loop state is
    the distinct-word frame with a 3-slot DP frontier, one character
    position per round, three broadcast equi-joins per round,
    iterations = longest word, localCheckpoint per round."""
    if max_len != 3:
        raise ValueError("unigram_viterbi_encode is specialized to max_len=3")
    # Fast path (optimization round 8): same convention as
    # wordpiece_encode — a vocabulary at or under _INLINE_VOCAB_MAX rows
    # (every engine call site) folds into one higher-order aggregate()
    # with map literals (:func:`_unigram_viterbi_inline`), removing the
    # ~2-jobs-per-character loop (measured ~12.6 s → ~2 s at sf0.1 for
    # unigram_encode_stats, which runs the DP twice). Larger external
    # vocabularies keep the broadcast-join loop; plan-only mode audits
    # the inline shape via a placeholder vocab (no collect, no jobs).
    if is_plan_only():
        return _unigram_viterbi_inline(
            words, [("a", 1, 1), ("aa", 2, 1), ("aaa", 3, 1)]
        )
    probe = vocab.select("piece", "plen", "score").limit(
        _INLINE_VOCAB_MAX + 1
    ).collect()
    if len(probe) <= _INLINE_VOCAB_MAX:
        # malformed-external-vocab parity with the loop form (round-8
        # advisor): NULL piece/plen/score rows behave as non-matches in
        # the loop's left joins — skip them here instead of crashing
        # int(None); duplicate (piece, plen) rows would hand the loop
        # form duplicated frontier rows — fail loudly instead of
        # silently last-wins-deduping in the map literal
        rows = [
            (r["piece"], int(r["plen"]), int(r["score"]))
            for r in probe
            if r["piece"] is not None
            and r["plen"] is not None
            and r["score"] is not None
        ]
        if len({(p, ln) for p, ln, _ in rows}) != len(rows):
            raise ValueError(
                "unigram_viterbi_encode: vocabulary has duplicate "
                "(piece, plen) rows — dedupe it first"
            )
        return _unigram_viterbi_inline(words, rows)
    vocab = F.broadcast(
        checkpoint(vocab.select("piece", "plen", "score").coalesce(parts))
    )
    by_len = {
        ln: vocab.where(F.col("plen") == ln).select(
            F.col("piece").alias(f"__p{ln}"),
            F.col("score").alias(f"__c{ln}"),
        )
        for ln in (1, 2, 3)
    }
    if is_plan_only():
        iters = 1
    else:
        row = words.agg(F.max(F.length("w"))).collect()[0][0]
        iters = int(row or 1)

    # iters + 1 rounds: round t collects words of length t-1 (the DP
    # frontier advances one position per round, and finishers are
    # harvested at the TOP of the round), so the longest word needs one
    # extra harvesting round after its last transition
    iters += 1

    nb = F.lit(None).cast("bigint")
    ns = F.lit(None).cast("string")
    state = words.select(
        "w",
        F.lit(0).alias("j"),
        F.lit(0).cast("bigint").alias("d0np"),
        F.lit(0).cast("bigint").alias("d0sm"),
        F.lit("").alias("d0ls"),
        nb.alias("d1np"),
        nb.alias("d1sm"),
        ns.alias("d1ls"),
        nb.alias("d2np"),
        nb.alias("d2sm"),
        ns.alias("d2ls"),
    ).coalesce(parts)
    outs: list[DataFrame] = []
    for _ in range(iters):
        state = checkpoint(state)
        done = state.where(F.col("j") == F.length("w"))
        outs.append(
            done.select(
                "w", F.col("d0np").alias("np"), F.col("d0ls").alias("lens")
            )
        )
        state = state.where(F.col("j") < F.length("w"))
        if not is_plan_only() and state.isEmpty():
            break
        j = state
        # piece of length l ending at position j+1 starts at j+2-l and
        # extends the frontier slot d{l-1}
        j = j.join(
            by_len[1],
            F.expr("substring(w, j + 1, 1)") == F.col("__p1"),
            "left",
        )
        j = j.join(
            by_len[2],
            F.expr("substring(w, j, 2)") == F.col("__p2"),
            "left",
        )
        j = j.join(
            by_len[3],
            F.expr("substring(w, j - 1, 3)") == F.col("__p3"),
            "left",
        )

        def cand(slot: int, ln: int):
            np_, sm, ls = (
                F.col(f"d{slot}np"),
                F.col(f"d{slot}sm"),
                F.col(f"d{slot}ls"),
            )
            c = F.col(f"__c{ln}")
            return F.when(
                np_.isNotNull() & c.isNotNull(),
                F.concat(
                    F.lpad((np_ + 1).cast("string"), 4, "0"),
                    F.lpad(
                        (F.lit(_UNI_BOUND) - (sm + c)).cast("string"),
                        15,
                        "0",
                    ),
                    ls,
                    F.lit(f"{ln},"),
                ),
            )

        c1, c2, c3 = cand(0, 1), cand(1, 2), cand(2, 3)
        best = F.least(c1, c2, c3)

        def pick(expr1, expr2, expr3):
            return (
                F.when(best.isNull(), F.lit(None))
                .when(best == c1, expr1)
                .when(best == c2, expr2)
                .otherwise(expr3)
            )

        state = j.select(
            "w",
            (F.col("j") + 1).alias("j"),
            pick(
                F.col("d0np") + 1, F.col("d1np") + 1, F.col("d2np") + 1
            )
            .cast("bigint")
            .alias("d0np"),
            pick(
                F.col("d0sm") + F.col("__c1"),
                F.col("d1sm") + F.col("__c2"),
                F.col("d2sm") + F.col("__c3"),
            )
            .cast("bigint")
            .alias("d0sm"),
            pick(
                F.concat(F.col("d0ls"), F.lit("1,")),
                F.concat(F.col("d1ls"), F.lit("2,")),
                F.concat(F.col("d2ls"), F.lit("3,")),
            ).alias("d0ls"),
            F.col("d0np").alias("d1np"),
            F.col("d0sm").alias("d1sm"),
            F.col("d0ls").alias("d1ls"),
            F.col("d1np").alias("d2np"),
            F.col("d1sm").alias("d2sm"),
            F.col("d1ls").alias("d2ls"),
        )
    from functools import reduce as _reduce

    if not outs:
        outs = [
            words.select(
                "w",
                F.lit(0).cast("bigint").alias("np"),
                F.lit("").alias("lens"),
            ).where(F.lit(False))
        ]
    return _reduce(lambda a, b: a.unionByName(b), outs)


def unigram_pieces(encoded: DataFrame) -> DataFrame:
    """Expand (w, np, lens) into (w, i, piece): the length path decodes
    positionally — piece i starts after the sum of the first i lengths.
    Unsegmentable words (NULL lens) emit the single ``[UNK]`` row, the
    same all-or-nothing contract as WordPiece."""
    ok = encoded.where(F.col("lens").isNotNull())
    larr = F.filter(F.split("lens", ","), lambda x: x != "")
    exp = ok.select("w", larr.alias("larr")).select(
        "w",
        F.posexplode("larr").alias("i", "lstr"),
        F.col("larr"),
    )
    pieces = exp.select(
        "w",
        F.col("i").cast("bigint").alias("i"),
        F.expr(
            "substring(w, CAST(1 + aggregate(slice(larr, 1, i), 0L, "
            "(a, x) -> a + CAST(x AS BIGINT)) AS INT), CAST(lstr AS INT))"
        ).alias("piece"),
    )
    unk = encoded.where(F.col("lens").isNull()).select(
        "w", F.lit(0).cast("bigint").alias("i"), F.lit(UNK).alias("piece")
    )
    return pieces.unionByName(unk)


def unigram_train_scores(
    words: DataFrame,
    max_len: int = 3,
    seed_top_k: int = 32,
    keep_top_k: int = 16,
) -> DataFrame:
    """One Viterbi-EM round over the distinct-word table: segment under
    the seed scores, re-estimate every piece's score as its exact
    occurrence-weighted USAGE count in the best segmentations (the
    hard-EM E+M step), then prune to all single characters (coverage)
    plus the ``keep_top_k`` highest-usage multi-character pieces — the
    unigram analogue of SentencePiece's prune-to-target-vocab step.
    Returns (piece, plen, score) for :func:`unigram_viterbi_encode`."""
    # the seed table feeds TWO consumers (the encode's vocab probe and
    # the usage re-join below); materialize it once — it is
    # vocabulary-sized, and its upstream is the full substring explode
    seed = checkpoint(
        unigram_seed_scores(words, max_len=max_len, top_k=seed_top_k)
    )
    enc0 = unigram_viterbi_encode(words, seed, max_len=max_len)
    usage = (
        unigram_pieces(enc0)
        .where(F.col("piece") != UNK)
        .join(words.select("w", "f"), "w")
        .groupBy("piece")
        .agg(F.sum("f").cast("bigint").alias("u"))
    )
    seeded = seed.join(usage, "piece", "left").select(
        "piece",
        "plen",
        F.coalesce(F.col("u"), F.lit(0)).cast("bigint").alias("score"),
    )
    v1 = seeded.where(F.col("plen") == 1)
    vtop = (
        seeded.where((F.col("plen") > 1) & (F.col("score") > 0))
        .orderBy(F.col("score").desc(), F.col("piece").asc())
        .limit(keep_top_k)
    )
    return v1.unionByName(vtop).select("piece", "plen", "score")


def unigram_doc_stats(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    max_len: int = 3,
    seed_top_k: int = 32,
    keep_top_k: int = 16,
) -> DataFrame:
    """Per-source fertility statistics under the Viterbi-EM-trained
    unigram vocabulary — the same rollup contract as
    :func:`wordpiece_doc_stats` (word/piece totals, half-up mean
    pieces-per-word ppm, unsegmentable words, distinct pieces in use),
    so the two tokenizer families are directly comparable."""
    from ..functions.exact import half_up_div

    srcw = (
        spread(docs.select(F.col(source_col).alias("source"), text_col))
        .select(
            "source", F.explode(F.split(text_col, r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    # srcw feeds three consumers (words derivation + the two per-source
    # rollup joins) and words feeds both the build-time vocab actions and
    # the final plan — materialize each once (identity in plan-only mode)
    srcw = checkpoint(srcw)
    words = checkpoint(srcw.groupBy("w").agg(F.sum("f").alias("f")))
    scores = unigram_train_scores(
        words, max_len=max_len, seed_top_k=seed_top_k, keep_top_k=keep_top_k
    )
    # em feeds TWO consumers (the per-source rollup join and the
    # distinct-piece join) — without materialization the trained-vocab
    # Viterbi fold re-executes per consumer (optimization round 9,
    # guide §2.4; vocabulary-sized, same rule as wordpiece_doc_stats)
    em = checkpoint(
        unigram_pieces(
            unigram_viterbi_encode(words, scores, max_len=max_len)
        )
    )
    encw = em.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pieces"),
        F.max((F.col("piece") == UNK).cast("int")).alias("has_unk"),
    )
    per_src = (
        srcw.join(encw, "w")
        .groupBy("source")
        .agg(
            F.sum("f").cast("bigint").alias("n_words"),
            F.sum(F.col("f") * F.col("n_pieces"))
            .cast("bigint")
            .alias("n_pieces"),
            F.sum(F.col("f") * F.col("has_unk"))
            .cast("bigint")
            .alias("unk_words"),
        )
        .withColumn(
            "avg_pieces_ppm",
            half_up_div(
                F.col("n_pieces") * F.lit(1_000_000), F.col("n_words")
            ).cast("bigint"),
        )
    )
    dpieces = (
        srcw.select("source", "w")
        .join(em.select("w", "piece"), "w")
        .groupBy("source")
        .agg(F.countDistinct("piece").cast("bigint").alias("distinct_pieces"))
    )
    return per_src.join(dpieces, "source").select(
        "source",
        "n_words",
        "n_pieces",
        "avg_pieces_ppm",
        "unk_words",
        "distinct_pieces",
    )
