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

from ..functions.exact import floor_div, half_up_div
from ..planmode import checkpoint


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
    # occ feeds three consumers, but an A/B (optimization round 8)
    # measured the lazy form equal-or-faster warm: the explode+md5 is
    # cheaper to recompute than the occurrence frame is to materialize.
    # Deliberately left lazy (contrast kneser_ney_score, where the
    # four-consumer types table DID win from a checkpoint).
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


def _h16(*cols) -> "F.Column":
    """16-hex md5 key of the space-joined columns (the corpus-wide gram
    key used by every dedup/LM stage — text itself never shuffles)."""
    parts: list = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(" "))
        parts.append(c)
    return F.substring(F.md5(F.concat(*parts)), 1, 16)


def kneser_ney_score(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Chen & Goodman 1999 §3,
    eq. 15) in exact integer arithmetic — the canonical n-gram
    smoothing, with the absolute discount D = 3/4 as an exact rational
    so the model is bit-reproducible in any engine:

        P(w2|w1) = max(c(w1 w2) − 3/4, 0) / c(w1 ·)
                 + (3/4) · N1+(w1 ·) / c(w1 ·) · P_cont(w2)
        P_cont(w2) = N1+(· w2) / N1+(· ·)

    Multiplying through by 4·c(w1 ·)·N1+(· ·) clears every denominator:

        ppm = (max(4·c12 − 3, 0)·T + 3·N1p(w1)·NR(w2)) · 10⁶
                  div (4·c1·T)

    with c12/c1 the training bigram/context occurrence counts, N1p the
    distinct continuations of w1, NR the distinct left-contexts of w2,
    and T the total distinct bigram types. Every quantity is a count,
    so the probability is an exact integer ratio; products are promoted
    to decimal(38,0) (HUGEINT in the twin) before the ·10⁶ scaling.
    The model provably normalizes (Σ_w2 P(w2|w1) = 1 exactly — pinned
    in the Fraction replay pytest). Unseen-context transitions fall
    back to the bare continuation probability NR(w2)·10⁶ div T (the
    unigram KN estimate); fully-OOV words score 0.

    Train/eval split is the caller's (held-out scoring is the default
    deployment shape, as in :func:`trigram_backoff_score`). Output per
    eval document: transition count, half-up mean ppm, min ppm.

    100 TB: one corpus pass per side builds the occurrence streams;
    the four statistics tables are vocabulary-bounded partial
    aggregates over 16-hex keys (c12 is the biggest — distinct bigram
    TYPES, Zipf-sparse); T is a 1-row broadcast; scoring is three LEFT
    equi-joins + a map-side-combining per-doc rollup. Text never
    shuffles.

    Reference anchor: no LM scoring in the reference (SURVEY §2.2
    P7/P10 is its only quality gate); driver-mandated LLM-pipeline
    extension completing the family (bigram CCNet ppm, stupid-backoff,
    Kneser-Ney).
    """

    def bigram_occ(docs: DataFrame) -> DataFrame:
        arr = docs.select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("t")
        )
        arr = arr.select(
            F.col(id_col), F.filter("t", lambda w: w != "").alias("t")
        )
        seq = F.when(
            F.size("t") >= 2, F.sequence(F.lit(1), F.size("t") - 1)
        ).otherwise(F.array().cast("array<int>"))
        return arr.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    seq,
                    lambda i: F.struct(
                        _h16(
                            F.element_at("t", i), F.element_at("t", i + 1)
                        ).alias("h12"),
                        _h16(F.element_at("t", i)).alias("h1"),
                        _h16(F.element_at("t", i + 1)).alias("hw"),
                    ),
                )
            ).alias("g"),
        ).select(F.col(id_col), "g.h12", "g.h1", "g.hw")

    # tr feeds two count tables and types feeds FOUR consumers
    # (n1p, nr, the type total, and the scored join): materialize each
    # once (optimization round 8). tr is the full bigram-occurrence
    # table — CORPUS-sized — so reliable=True (optimization round 9):
    # DISK_ONLY persist with lineage kept survives executor loss on a
    # real cluster where a localCheckpoint block would not. types is
    # type-bounded (≪ occurrences) and stays on the fast path.
    tr = checkpoint(bigram_occ(train_docs), reliable=True)
    # Distinct bigram TYPES with their occurrence counts; h1/hw are
    # functionally determined by h12, so min() is exact.
    types = tr.groupBy("h12").agg(
        F.min("h1").alias("h1"),
        F.min("hw").alias("hw"),
        F.count(F.lit(1)).alias("c12"),
    )
    types = checkpoint(types)
    # Context table: occurrence count c1 and distinct-continuation
    # count n1p per left word.
    c1 = tr.groupBy("h1").agg(F.count(F.lit(1)).alias("c1"))
    n1p = types.groupBy("h1").agg(F.count(F.lit(1)).alias("n1p"))
    ctx = c1.join(n1p, "h1")  # both derive from the same key set
    # Continuation table: distinct left-contexts per right word.
    nr = types.groupBy("hw").agg(F.count(F.lit(1)).alias("nr"))
    total = types.groupBy().agg(F.count(F.lit(1)).alias("t_types"))

    occ = bigram_occ(eval_docs)
    j = (
        occ.join(types.select("h12", "c12"), "h12", "left")
        .join(ctx, "h1", "left")
        .join(nr, "hw", "left")
        .crossJoin(F.broadcast(total))
    )
    dec = "decimal(38,0)"
    # c12 NULL (unseen bigram, seen context) still earns the discounted
    # continuation mass; nr NULL (OOV right word) contributes zero.
    c12n = F.coalesce(F.col("c12"), F.lit(0)).cast(dec)
    nrn = F.coalesce(F.col("nr"), F.lit(0)).cast(dec)
    seen_num = (
        F.greatest(c12n * 4 - 3, F.lit(0).cast(dec))
        * F.col("t_types").cast(dec)
        + F.col("n1p").cast(dec) * 3 * nrn
    )
    seen_den = F.col("c1").cast(dec) * 4 * F.col("t_types")
    ppm = (
        F.when(F.col("t_types") == 0, F.lit(0))  # empty training corpus
        .when(
            F.col("c1").isNotNull(),
            floor_div(seen_num * 1000000, seen_den),
        )
        .otherwise(floor_div(nrn * 1000000, F.col("t_types").cast(dec)))
    )
    scored = j.select(F.col(id_col), ppm.cast("bigint").alias("ppm"))
    perdoc = (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("ppm").alias("__sp"),
            F.min("ppm").cast("bigint").alias("min_ppm"),
        )
        .withColumn(
            "kn_ppm",
            half_up_div(F.col("__sp"), F.col("n_bigrams")).cast("bigint"),
        )
    )
    return (
        eval_docs.select(id_col)
        .join(perdoc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            "kn_ppm",
            "min_ppm",
        )
    )


def trigram_backoff_score(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stupid-backoff trigram LM (Brants et al. 2007) in exact integer
    arithmetic: each trigram occurrence in ``eval_docs`` is scored by

    * ``c(w1 w2 w3) · 10⁶ div c(w1 w2)``            if the trigram was seen
      in ``train_docs``, else
    * ``(c(w2 w3) · 10⁶ div c(w2)) · 2 div 5``      (α = 0.4 as the exact
      rational 2/5) if the bigram was seen, else
    * ``(c(w3) · 10⁶ div N) · 4 div 25``            (α² = 4/25), 0 for OOV.

    All counts come from ``train_docs`` only — the train/eval split is the
    caller's, so held-out scoring (the CCNet deployment shape: score the
    crawl with a model trained on the reference corpus) is the default
    call, not a variant. No floats, no ``log``: the backoff discounts are
    exact integer multiplications/divisions, so the score is bit-identical
    in any engine and summation order, like :func:`bigram_lm_score`.

    100 TB: three partial-aggregatable count tables (trigram, bigram,
    unigram — vocabulary-bounded, the trigram table |V|³ worst case but
    Zipf-sparse in practice), three LEFT equi-joins on 16-hex keys, one
    per-doc map-side-combining rollup. Text never shuffles.
    """

    def grams(docs: DataFrame, n: int, names: list[str]) -> DataFrame:
        arr = docs.select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("t")
        )
        arr = arr.select(
            F.col(id_col), F.filter("t", lambda w: w != "").alias("t")
        )
        seq = F.when(
            F.size("t") >= n, F.sequence(F.lit(1), F.size("t") - n + 1)
        ).otherwise(F.array().cast("array<int>"))
        words = [
            (lambda k: (lambda i: F.element_at("t", i + k)))(k)
            for k in range(n)
        ]
        fields = {
            "h3": lambda i: _h16(*(w(i) for w in words)),
            "h12": lambda i: _h16(words[0](i), words[1](i)),
            "h23": lambda i: _h16(words[1](i), words[2](i)),
            "h2": lambda i: _h16(words[1](i)),
            "hw": lambda i: _h16(words[-1](i)),
            "h1": lambda i: _h16(words[0](i)),
        }
        return arr.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    seq,
                    lambda i: F.struct(
                        *[fields[nm](i).alias(nm) for nm in names]
                    ),
                )
            ).alias("g"),
        ).select(F.col(id_col), *[F.col(f"g.{nm}").alias(nm) for nm in names])

    # tri_t/uni_t feed 2-3 count tables each, but an A/B (optimization
    # round 8) measured the lazy form faster warm (3.0 s vs 3.4 s at
    # sf0.1): the gram explode is cheaper to recompute than the
    # occurrence frames are to materialize. Deliberately left lazy.
    tri_t = grams(train_docs, 3, ["h3", "h12"])
    big_t = grams(train_docs, 2, ["h3", "h1"])
    uni_t = grams(train_docs, 1, ["h1"])

    c3 = tri_t.groupBy("h3").agg(
        F.min("h12").alias("h12"), F.count(F.lit(1)).alias("c3")
    )
    c12 = tri_t.groupBy("h12").agg(F.count(F.lit(1)).alias("c12"))
    stats3 = c3.join(c12, "h12").select(
        "h3", F.expr("c3 * 1000000 div c12").alias("ppm3")
    )
    # big_t's "h3" is the joint bigram hash _h16("w2 w3"); "h1" is the
    # conditioning first word's hash (the denominator's unigram key).
    c23 = big_t.groupBy(F.col("h3").alias("h23")).agg(
        F.min("h1").alias("h2"), F.count(F.lit(1)).alias("c23")
    )
    c2 = uni_t.groupBy(F.col("h1").alias("h2")).agg(
        F.count(F.lit(1)).alias("c2")
    )
    stats2 = c23.join(c2, "h2").select(
        "h23",
        F.expr("(c23 * 1000000 div c2) * 2 div 5").alias("ppm2"),
    )
    n_tok = uni_t.groupBy().agg(F.count(F.lit(1)).alias("n"))
    stats1 = (
        uni_t.groupBy(F.col("h1").alias("hw"))
        .agg(F.count(F.lit(1)).alias("c1"))
        .crossJoin(F.broadcast(n_tok))
        .select(
            "hw", F.expr("(c1 * 1000000 div n) * 4 div 25").alias("ppm1")
        )
    )

    occ = grams(eval_docs, 3, ["h3", "h23", "hw"])
    scored = (
        occ.join(stats3, "h3", "left")
        .join(stats2, "h23", "left")
        .join(stats1, "hw", "left")
        .select(
            F.col(id_col),
            F.when(F.col("ppm3").isNotNull(), F.col("ppm3"))
            .otherwise(
                F.when(F.col("ppm2").isNotNull(), F.col("ppm2")).otherwise(
                    F.coalesce("ppm1", F.lit(0))
                )
            )
            .cast("bigint")
            .alias("ppm"),
        )
    )
    perdoc = (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.sum("ppm").alias("__sp"),
            F.min("ppm").cast("bigint").alias("min_ppm"),
        )
        .withColumn(
            "bo_ppm",
            half_up_div(F.col("__sp"), F.col("n_trigrams")).cast("bigint"),
        )
    )
    return (
        eval_docs.select(id_col)
        .join(perdoc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_trigrams", F.lit(0)).cast("bigint").alias(
                "n_trigrams"
            ),
            "bo_ppm",
            "min_ppm",
        )
    )
