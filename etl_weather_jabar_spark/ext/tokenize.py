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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import spread
from ..planmode import checkpoint, is_plan_only

UNK = "[UNK]"


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
    (substring_vocab at its defaults cannot produce it)."""
    if not is_plan_only():
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
    words = srcw.groupBy("w").agg(F.sum("f").alias("f"))
    vocab = substring_vocab(words, max_len=max_len, top_k=top_k)
    em = wordpiece_encode(words, vocab, max_len=max_len)
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
