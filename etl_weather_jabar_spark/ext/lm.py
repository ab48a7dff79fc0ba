"""Statistical language-model scoring for corpus quality filtering.

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model and keeps the low-perplexity head. The relational
form here is the log-free exact-integer adaptation: the corpus itself
supplies the bigram statistics, each token transition is scored by its
conditional probability in ppm (``count(x y) · 10⁶ div count(x ·)``,
exact integer division), and a document's quality is the half-up mean
of its transition ppms — a monotone stand-in for negative perplexity
that is bit-identical in any engine and any summation order (no floats,
no ``log``). The min transition ppm is also surfaced (the document's
most surprising transition — CCNet's tail-detection signal).

Why not true perplexity: exp/log of arbitrary rationals is
engine-float territory; the additive-ppm mean ranks documents the same
way for the filtering decision while staying certifiable by a DuckDB
hash oracle. A trained external LM swaps the self-trained ``stats``
aggregation for a broadcast probability table; every other stage of the
plan is unchanged.

Reference anchor: the reference repo has no LM scoring (its quality
gate is null-rejection, SURVEY §2.2 P7/P10); this is a driver-mandated
LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import half_up_div


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-trained bigram-LM quality score per document.

    Pipeline (all built-ins, zero Python, text never shuffles):

    1. bigram occurrences straight from the token array —
       ``transform(sequence(...))`` + explode, no window and no
       self-join; each occurrence carries a 16-hex bigram key ``bh``
       and prefix key ``xh``;
    2. corpus statistics: ``count per bh`` (carrying its ``xh`` — the
       prefix is functionally determined by the bigram, so ``min`` is
       exact) and ``count per xh``; their equi-join yields the
       conditional ppm per distinct bigram — model-sized, not
       corpus-sized;
    3. occurrences join the stats on ``bh`` (uniform hash key) and
       roll up per document: transition count, half-up mean ppm, min
       ppm. Documents with < 2 tokens return ``n_bigrams = 0`` and
       NULL scores via the final left join.

    100 TB: two partial-aggregatable counts + two equi-joins on 16-hex
    keys; the stats table is vocabulary²-bounded (broadcastable for
    real vocabularies after the df-style long-tail cut, shuffled
    otherwise); per-doc rollup map-side combines.
    """
    arr = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("t")
    )
    seq = F.when(
        F.size("t") >= 2, F.sequence(F.lit(1), F.size("t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    occ = arr.select(
        F.col(id_col),
        F.explode(
            F.transform(
                seq,
                lambda i: F.struct(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.element_at("t", i),
                                F.lit(" "),
                                F.element_at("t", i + 1),
                            )
                        ),
                        1,
                        16,
                    ).alias("bh"),
                    F.substring(F.md5(F.element_at("t", i)), 1, 16).alias(
                        "xh"
                    ),
                ),
            )
        ).alias("g"),
    ).select(F.col(id_col), "g.bh", "g.xh")
    cxy = occ.groupBy("bh").agg(
        F.min("xh").alias("xh"), F.count(F.lit(1)).alias("cxy")
    )
    cx = occ.groupBy("xh").agg(F.count(F.lit(1)).alias("cx"))
    stats = cxy.join(cx, "xh").select(
        "bh", F.expr("cxy * 1000000 div cx").alias("ppm")
    )
    perdoc = (
        occ.join(stats, "bh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("ppm").alias("__sp"),
            F.min("ppm").cast("bigint").alias("min_ppm"),
        )
        .withColumn(
            "lm_ppm",
            half_up_div(F.col("__sp"), F.col("n_bigrams")).cast("bigint"),
        )
    )
    return (
        docs.select(id_col)
        .join(perdoc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            "lm_ppm",
            "min_ppm",
        )
    )
