"""Positional inverted-index text search, relational form.

The classic search-engine structure — postings of (term, doc, position)
— expressed as a DataFrame, with phrase queries answered by the k-way
offset-aligned intersection: a phrase of k terms matches at anchor
position p iff for every offset i the posting (term_i, doc, p+i)
exists. Instead of k−1 self-joins, the intersection is ONE equi-join of
the postings against the (offset, term-hash) list plus ONE aggregation
(``count(distinct offset) = k`` per anchor) — the join stays uniform in
the term-hash key and the plan shape is independent of phrase length.

Repeated phrase terms are handled exactly: each posting row joins every
offset whose term matches, and the distinct-offset count still demands
a hit at every required position.

Scale: postings are (16-hex, id, pos) — text never shuffles; a
persisted postings table bucketed/partitioned by term hash makes the
term lookup partition-prunable (the same layout argument as the IVF
index). The reference has no search surface; this is a driver-mandated
LLM-pipeline extension (corpus inspection / targeted decontamination
both reduce to phrase lookup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import floor_div


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional postings: one row per token occurrence —
    (th = 16-hex md5 of the token, id, pos)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    ).select(
        F.substring(F.md5("tok"), 1, 16).alias("th"),
        F.col(id_col),
        F.col("pos").cast("bigint").alias("pos"),
    )


def phrase_match(
    postings: DataFrame, terms: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Anchor positions where the phrase matches.

    ``terms`` is the query: (off, th) with offsets 0..k−1 — broadcast
    (a phrase is tiny by construction). Returns (id, pos0) — one row
    per match anchor. The anchor trick: a posting at position p for the
    term at offset i votes for anchor ``p − i``; an anchor with votes
    from ALL k distinct offsets is a match. k is never collected — the
    anchor's distinct-offset count equi-joins the query's own
    distinct-offset count (a 1-row broadcast), keeping the builder
    job-free for plan-only callers."""
    cand = postings.join(F.broadcast(terms), "th").select(
        F.col(id_col),
        (F.col("pos") - F.col("off")).alias("pos0"),
        "off",
    )
    return (
        cand.where(F.col("pos0") >= 0)
        .groupBy(id_col, "pos0")
        .agg(F.count_distinct("off").alias("__k"))
        .join(
            F.broadcast(
                terms.agg(F.count_distinct("off").alias("__k"))
            ),
            "__k",
        )
        .select(id_col, "pos0")
    )


def save_postings_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
) -> None:
    """Persist the positional inverted index partitioned by a term-hash
    shard (``shard = first 2 hex chars of th mod n_shards``): a phrase
    query touches only the shards its k terms hash to, so the serving
    scan is partition-PRUNED to ≤ k/n_shards of the index — the same
    deployment shape as the IVF inverted lists
    (ext/similarity.py::save_ivf_index). Terms are md5-uniform, so
    shards are balanced by construction (no hot-partition risk a
    skewed raw term would cause if we partitioned by the term itself;
    a shard holds many terms, bounding partition count at n_shards
    regardless of vocabulary size)."""
    build_postings(docs, id_col, text_col).withColumn(
        "shard",
        F.pmod(F.conv(F.substring("th", 1, 2), 16, 10).cast("int"), n_shards),
    ).write.partitionBy("shard").mode("overwrite").parquet(path)


def phrase_match_indexed(
    spark,
    path: str,
    terms: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """Phrase query against a persisted postings index: the scan carries
    an ``isin``-on-shard predicate derived from the query terms, so
    Spark prunes to the terms' partitions before any IO (asserted via
    PartitionFilters in tests). The match itself is the same anchor
    intersection as :func:`phrase_match`."""
    shard_of = F.pmod(
        F.conv(F.substring("th", 1, 2), 16, 10).cast("int"), n_shards
    )
    shards = [r["s"] for r in terms.select(shard_of.alias("s")).collect()]
    postings = spark.read.parquet(path).where(
        F.col("shard").isin(sorted(set(shards)))
    )
    return phrase_match(postings, terms, id_col)


def bm25_scores(
    docs: DataFrame,
    terms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1_milli: int = 1200,
    b_milli: int = 750,
) -> DataFrame:
    """Exact-integer BM25 ranked retrieval (Robertson/Okapi) — the
    lexical-ranking half a retrieval-based curation stack runs beside
    vector ANN.

    Log-free exact form: the idf is the rational surrogate
    ``(D − df + 1)·10⁶ div (df + 1)`` (monotone in df exactly like
    Robertson's log idf — same ranking behavior, but integer-exact so
    any engine replays it digit-for-digit), and the tf normalization
    ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` is cross-multiplied
    into one integer division with avgdl kept as the exact rational
    S/D (S = corpus token count, D = doc count):

        contrib = idf_ppm · tf·(k1ₘ+1000)·1000·S
                  div (tf·10⁶·S + k1ₘ·((1000−bₘ)·S + bₘ·dl·D))

    Magnitudes fit decimal(38)/HUGEINT up to S ≈ 10¹³ tokens (≈ 100 TB
    of text) — documented bound, checked via the decimal cast.

    ``terms`` is the query: (th) 16-hex term hashes, broadcast. Returns
    (id, score_u) — integer score units, summed per doc over matched
    query terms only (docs matching no term simply don't appear, as in
    any inverted-index engine). 100 TB: one postings aggregation per
    (doc, term), df/dl/S/D are partial-aggregatable counts, the query
    join is a broadcast; nothing driver-sized collects."""
    posts = build_postings(docs, id_col, text_col)
    dl = posts.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    tot = dl.agg(
        F.sum("dl").cast("bigint").alias("S"),
        F.count(F.lit(1)).cast("bigint").alias("D"),
    )
    tf = (
        posts.join(F.broadcast(terms.select("th")), "th")
        .groupBy(id_col, "th")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("th").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    return _bm25_combine(tf, df, dl, tot, id_col, k1_milli, b_milli)


def _bm25_combine(
    tf: DataFrame,
    df: DataFrame,
    dl: DataFrame,
    tot: DataFrame,
    id_col: str,
    k1_milli: int,
    b_milli: int,
) -> DataFrame:
    """The ONE BM25 scoring combiner (shared by the inline scorer and
    the persisted-index serve, so their oracle equivalence rests on a
    single arithmetic): per-(doc, term) integer contribution summed per
    doc. ``df`` is vocab-bounded and ``tot`` 1-row, both broadcast."""
    dec = "decimal(38,0)"
    k1m, bm = F.lit(k1_milli), F.lit(b_milli)
    idf_ppm = floor_div(
        (F.col("D") - F.col("df") + 1).cast(dec) * F.lit(1000000),
        F.col("df") + 1,
    ).cast(dec)
    num = (
        idf_ppm
        * F.col("tf").cast(dec)
        * (k1m + 1000).cast(dec)
        * F.lit(1000).cast(dec)
        * F.col("S").cast(dec)
    )
    den = (
        F.col("tf").cast(dec) * F.lit(1000000).cast(dec) * F.col("S").cast(dec)
        + k1m.cast(dec)
        * (
            (F.lit(1000) - bm).cast(dec) * F.col("S").cast(dec)
            + bm.cast(dec) * F.col("dl").cast(dec) * F.col("D").cast(dec)
        )
    )
    return (
        tf.join(F.broadcast(df), "th")
        .join(dl, id_col)
        .crossJoin(F.broadcast(tot))
        .withColumn("__c", floor_div(num, den))
        .groupBy(id_col)
        .agg(F.sum("__c").cast("bigint").alias("score_u"))
    )


def _shard_of(n_shards: int):
    return F.pmod(
        F.conv(F.substring("th", 1, 2), 16, 10).cast("int"), F.lit(n_shards)
    )


def save_search_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
) -> None:
    """Persist the FULL search index a ranked-retrieval deployment
    serves from (the Lucene shape: postings + norms + segment stats):

    * ``<path>/postings`` — positional postings partitioned by the
      term-hash shard (pruned to the query's shards at serve time,
      same layout as save_postings_index; serves BOTH phrase queries
      and BM25);
    * ``<path>/doclen`` — per-document token counts (the "norms"
      sidecar: BM25's length normalization needs ALL terms' counts,
      which a shard-pruned scan cannot reconstruct);
    * ``<path>/stats`` — the 1-row (S, D) corpus totals.
    """
    posts = build_postings(docs, id_col, text_col)
    posts.withColumn("shard", _shard_of(n_shards)).write.partitionBy(
        "shard"
    ).mode("overwrite").parquet(f"{path}/postings")
    dl = posts.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    dl.write.mode("overwrite").parquet(f"{path}/doclen")
    dl.agg(
        F.sum("dl").cast("bigint").alias("S"),
        F.count(F.lit(1)).cast("bigint").alias("D"),
    ).write.mode("overwrite").parquet(f"{path}/stats")


def bm25_topk_indexed(
    spark,
    path: str,
    terms: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 32,
    k1_milli: int = 1200,
    b_milli: int = 750,
) -> DataFrame:
    """BM25 against a persisted search index: the postings scan is
    partition-PRUNED to the query terms' shards (PartitionFilters —
    asserted in pytest), tf/df aggregate from only those shards, and
    the doclen/stats sidecars supply the length normalization. Same
    results as :func:`bm25_scores` on the indexed corpus (same model
    state, same combiner)."""
    shards = sorted(
        {
            r["s"]
            for r in terms.select(_shard_of(n_shards).alias("s")).collect()
        }
    )
    posts = spark.read.parquet(f"{path}/postings").where(
        F.col("shard").isin(shards)
    )
    tf = (
        posts.join(F.broadcast(terms.select("th")), "th")
        .groupBy(id_col, "th")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("th").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    dl = spark.read.parquet(f"{path}/doclen")
    tot = spark.read.parquet(f"{path}/stats")
    return _bm25_combine(tf, df, dl, tot, id_col, k1_milli, b_milli)


def append_to_search_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
) -> int:
    """Incremental index maintenance — the O(batch) append path a
    production retrieval index runs instead of nightly rebuilds:
    documents whose id is already indexed are anti-joined away (so a
    replayed batch is a no-op — idempotent by construction), the new
    docs' postings/doclen rows APPEND, and the 1-row stats file is
    rewritten from the appended doclen (doc-count-sized aggregate, not
    a corpus rescan). Returns the number of newly indexed documents.

    Serving correctness does not depend on append timing: BM25 reads
    df/tf from the (pruned) postings and dl/S/D from the sidecars, all
    of which this function keeps exactly consistent with a full
    rebuild over the union corpus (pinned in pytest). A missing index
    bootstraps from the batch (so a streaming foreachBatch can use
    this as its only commit path)."""
    from .similarity import _hadoop_path_exists

    spark = docs.sparkSession
    if not _hadoop_path_exists(spark, f"{path}/doclen"):
        n = docs.count()
        save_search_index(docs, path, id_col, text_col, n_shards)
        return n
    seen = spark.read.parquet(f"{path}/doclen").select(id_col)
    fresh = docs.join(seen, on=id_col, how="left_anti")
    n_new = fresh.count()
    if n_new == 0:
        return 0
    posts = build_postings(fresh, id_col, text_col)
    posts.withColumn("shard", _shard_of(n_shards)).write.partitionBy(
        "shard"
    ).mode("append").parquet(f"{path}/postings")
    posts.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    ).write.mode("append").parquet(f"{path}/doclen")
    spark.read.parquet(f"{path}/doclen").agg(
        F.sum("dl").cast("bigint").alias("S"),
        F.count(F.lit(1)).cast("bigint").alias("D"),
    ).write.mode("overwrite").parquet(f"{path}/stats")
    return n_new
