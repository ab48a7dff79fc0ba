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
