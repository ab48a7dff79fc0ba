"""Shaping documents into training sequences: packing and chunking.

Two operators every LLM data pipeline runs between "corpus" and "batches",
absent from the reference (SURVEY §2 — its unit of work is one weather
observation; there is no notion of token budgets):

* :func:`pack_sequences` — GPT-style sequence packing: concatenate the
  document stream in a deterministic total order and cut every ``budget``
  tokens; each document is assigned to the sequence where its FIRST token
  lands. This is the concat-and-cut packing used for pre-training (documents
  may straddle a boundary; the assignment of doc → starting sequence is what
  downstream mixing / accounting needs). It is a pure function of
  (order, token counts) — no bin-packing heuristics, so it is reproducible
  and embarrassingly re-computable after appends.

* :func:`chunk_documents` — fixed-size character chunks with overlap
  (stride < size), the retrieval/fine-tuning counterpart: one row per
  chunk, ``ceil(len/stride)`` chunks per document (min 1).

Scale notes (100 TB): packing needs a GLOBAL running token count — the
naive `Window.orderBy` funnels the corpus through one reducer, so it is
built on ``operators/windows.py::scalable_prefix_sum`` (range partition +
local cumsum + broadcast offsets; driver traffic = one row per partition).
Chunking is embarrassingly parallel (explode of a generated start array,
no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import spread
from ..operators.windows import scalable_prefix_sum


def pack_sequences(
    docs: DataFrame,
    token_col: str,
    budget: int,
    order_cols: list[str] | None = None,
    seq_col: str = "seq_id",
) -> DataFrame:
    """Assign every document to the training sequence (0-based id of the
    ``budget``-token window) where its first token lands when the corpus is
    concatenated in ``order_cols`` order (default ``["doc_id"]``, which must
    be a total order).

    seq_id = tokens_before DIV budget — integer division on exact BIGINT
    cumulative counts (never a double `floor`, which loses exactness past
    2^53 — a real concern for cumulative token counts at corpus scale).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order_cols = order_cols or ["doc_id"]
    pref = scalable_prefix_sum(
        docs, order_cols, token_col, out_col="__before", exclusive=True
    )
    return pref.withColumn(
        seq_col, F.expr(f"CAST(`__before` DIV {budget} AS BIGINT)")
    ).drop("__before")


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    size: int = 120,
    stride: int = 90,
) -> DataFrame:
    """One row per (document, chunk): ``chunk_idx`` (0-based), ``chunk``
    (substring of length ≤ ``size`` starting at 1 + chunk_idx·stride).
    ``stride < size`` gives overlapping chunks; the final chunk may be
    short; an empty document yields one empty chunk (callers filter).

    Narrow plan: generate the start positions as an array, explode, take
    substrings — zero shuffles, so Spark parallelizes it per input split
    (plus :func:`spread` for small-file inputs).
    """
    if stride <= 0 or size <= 0:
        raise ValueError(f"size and stride must be positive, got {size}, {stride}")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text_col)), F.lit(1)), F.lit(stride)
    )
    return (
        spread(docs)
        .withColumn("__start", F.explode(starts))
        .withColumn(
            "chunk_idx", F.expr(f"CAST((`__start` - 1) DIV {stride} AS BIGINT)")
        )
        .withColumn(
            "chunk", F.expr(f"substring(`{text_col}`, `__start`, {size})")
        )
        .drop("__start")
    )


def bpe_train_merges(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 3,
    materialize_rounds: bool = True,
) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016): learn
    the first ``rounds`` merge rules over the corpus, entirely as
    relational algebra — the vocabulary-construction stage of every LLM
    pipeline, here with zero driver-side state.

    Per round: (1) count adjacent symbol pairs across the word table,
    frequency-weighted, every occurrence counted (``get_stats``
    semantics — 'a a a' contributes (a,a) twice); (2) pick the best
    pair by (count DESC, left ASC, right ASC) — a deterministic
    ``limit(1)``; (3) apply the merge to every word with a left-to-right
    greedy fold (``F.aggregate`` over the symbol array — a freshly
    merged symbol never re-merges within its round, matching the
    reference implementation's non-overlapping replace).

    Returns (round, left_sym, right_sym, pair_count), one row per
    learned merge. The whole computation is ONE lazy plan: each round's
    best pair enters the next round as a broadcast 1-row cross join,
    never a collect.

    Scale notes (100 TB): the corpus is touched ONCE (the word-count
    aggregation); every round after that works on the word table, whose
    size is the VOCABULARY (bounded, skew-free after the count agg —
    a hot word is one row here no matter how often it occurs). Pair
    counting explodes ≤ len(word) symbols per word — vocab-bounded, not
    corpus-bounded. ``materialize_rounds`` localCheckpoints the symbol
    table between rounds (via planmode-aware ``checkpoint``) so round
    r's two consumers (pair counts + merge apply) don't recompute the
    whole prefix chain; plan-only callers skip it automatically.
    """
    from functools import reduce as _reduce

    merges, _ = _bpe_chain(docs, text_col, rounds, materialize_rounds)
    return _reduce(lambda a, b: a.unionByName(b), merges)


def bpe_vocab(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 3,
    materialize_rounds: bool = True,
) -> DataFrame:
    """The trained tokenizer as data: the word table AFTER the learned
    merges, one row per distinct word — (w, f, s, n_syms) where ``s``
    is the word's final space-joined symbol string and ``n_syms`` its
    true subword token count. Joining the corpus against this
    (vocab-bounded, broadcastable) table IS BPE encoding — the apply
    side of ``bpe_train_merges``."""
    _, syms = _bpe_chain(docs, text_col, rounds, materialize_rounds)
    return syms.select(
        "w",
        "f",
        "s",
        F.size(F.split("s", " ")).cast("bigint").alias("n_syms"),
    )


def _bpe_chain(docs, text_col, rounds, materialize_rounds):
    from ..planmode import checkpoint

    words = (
        spread(docs.select(F.col(text_col).alias("__t")))
        .select(F.explode(F.split("__t", r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    syms = words.select(
        "w",
        "f",
        F.concat(
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")),
            F.lit(" </w>"),
        ).alias("s"),
    )
    merges = []
    for r in range(1, rounds + 1):
        if materialize_rounds:
            syms = checkpoint(syms)
        arr = F.split(F.col("s"), " ")
        pairs = (
            syms.select(
                "f",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(arr) - 1),
                        lambda i: F.struct(
                            F.element_at(arr, i).alias("l"),
                            F.element_at(arr, i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("f").cast("bigint").alias("c"))
        )
        best = pairs.orderBy(
            F.col("c").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1)
        merges.append(
            best.select(
                F.lit(r).alias("round"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.col("c").alias("pair_count"),
            )
        )
        bl, br = F.col("__bl"), F.col("__br")
        merged = F.concat(bl, br)
        syms = (
            syms.crossJoin(
                F.broadcast(
                    best.select(
                        F.col("l").alias("__bl"), F.col("r").alias("__br")
                    )
                )
            )
            .select(
                "w",
                "f",
                F.aggregate(
                    F.split(F.col("s"), " "),
                    F.lit(""),
                    lambda acc, x: F.when(acc == F.lit(""), x)
                    .when((acc == bl) & (x == br), merged)
                    .when(
                        acc.endswith(F.concat(F.lit(" "), bl)) & (x == br),
                        F.concat(
                            F.substring(
                                acc,
                                F.lit(1),
                                F.length(acc) - F.length(bl) - 1,
                            ),
                            F.lit(" "),
                            merged,
                        ),
                    )
                    .otherwise(F.concat(acc, F.lit(" "), x)),
                ).alias("s"),
            )
        )
    return merges, syms
