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
        "shard", _shard_of(n_shards)
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
    shards = [
        r["s"] for r in terms.select(_shard_of(n_shards).alias("s")).collect()
    ]
    postings = spark.read.parquet(path).where(
        F.col("shard").isin(sorted(set(shards)))
    )
    return phrase_match(postings, terms, id_col)


def phrase_match_segments(
    spark,
    path: str,
    terms: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """Phrase query against the committed-segment search index
    (save_search_index / append_to_search_index) — the same postings
    serve BOTH ranked retrieval and phrase lookup, as the index
    docstring promises: committed segments only, scans pruned to the
    phrase terms' shards, then the standard anchor intersection."""
    from functools import reduce

    batches = _committed_batches(spark, path)
    if not batches:
        raise ValueError(f"no committed index batches under {path}")
    shards = sorted(
        {
            r["s"]
            for r in terms.select(_shard_of(n_shards).alias("s")).collect()
        }
    )
    postings = reduce(
        DataFrame.unionByName,
        [spark.read.parquet(f"{b}/postings") for b in batches],
    ).where(F.col("shard").isin(shards))
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
    ``(D − df + 1)·10³ div (df + 1)`` (monotone in df exactly like
    Robertson's log idf — same ranking behavior, but integer-exact so
    any engine replays it digit-for-digit), and the tf normalization
    ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` is cross-multiplied
    into one integer division with avgdl PRE-ROUNDED once to integer
    milli-tokens (adm = 1000·S div D — deterministic, replayed by the
    oracle), which keeps S and D out of the per-row products:

        norm_milli = (1000−bₘ) + bₘ·1000·dl div adm
        contrib    = idf_milli · tf·(k1ₘ+1000)·10⁶
                     div (tf·10⁶ + k1ₘ·norm_milli)

    Every operand is ≤ idf_milli·tf·2200·10⁶ ≲ 10³⁴ even at 10¹⁵ documents
    and 10⁶-token docs — decimal(38)/HUGEINT-safe for any corpus this
    side of the crawl horizon.

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
    # avgdl pre-rounded ONCE to integer milli-tokens (1000·S div D):
    # keeping avgdl as the raw rational S/D forces S and D into every
    # per-row product, which overflows decimal(38) for web-scale
    # corpora (review finding); the deterministic pre-rounding replays
    # exactly in the oracle and bounds every operand at
    # idf_milli·tf·2200 ≲ 10^28 for D ≤ 10^15 docs, tf ≤ 10^6
    tot = tot.withColumn(
        "adm", floor_div(F.lit(1000).cast(dec) * F.col("S"), F.col("D"))
    )
    idf_milli = floor_div(
        (F.col("D") - F.col("df") + 1).cast(dec) * F.lit(1000),
        F.col("df") + 1,
    ).cast(dec)
    norm_milli = (F.lit(1000) - bm).cast(dec) + floor_div(
        bm.cast(dec) * F.lit(1000) * F.col("dl"), F.col("adm")
    ).cast(dec)
    # ×10⁶ output scale: keeps integer resolution at ANY corpus size
    # (without it the floor division collapses small-corpus scores to
    # 0/1); operands stay ≤ ~10³⁴, inside decimal(38)
    num = (
        idf_milli
        * F.col("tf").cast(dec)
        * (k1m + 1000).cast(dec)
        * F.lit(1000000).cast(dec)
    )
    den = F.col("tf").cast(dec) * F.lit(1000000) + k1m.cast(dec) * norm_milli
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


def _fs_and_path(spark, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _committed_batches(spark, path: str) -> list[str]:
    """Batch directories under ``<path>/batches`` whose atomic
    ``_committed`` marker exists — the ONLY state serving reads."""
    fs, root, jvm = _fs_and_path(spark, f"{path}/batches")
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        if st.isDirectory():
            d = st.getPath()
            if fs.exists(jvm.org.apache.hadoop.fs.Path(d, "_committed")):
                out.append(d.toString())
    return sorted(out)


def _write_index_batch(
    docs: DataFrame,
    batch_dir: str,
    id_col: str,
    text_col: str,
    n_shards: int,
) -> None:
    """Write one batch's postings + doclen into ``batch_dir`` then
    publish it with a single atomic ``_committed`` file create. Until
    the marker lands the batch is invisible to every reader, so a
    crash mid-write leaves no partial state — the replay overwrites
    the unpublished directory and re-commits."""
    posts = build_postings(docs, id_col, text_col)
    posts.withColumn("shard", _shard_of(n_shards)).write.partitionBy(
        "shard"
    ).mode("overwrite").parquet(f"{batch_dir}/postings")
    posts.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    ).write.mode("overwrite").parquet(f"{batch_dir}/doclen")
    fs, d, jvm = _fs_and_path(docs.sparkSession, batch_dir)
    fs.create(jvm.org.apache.hadoop.fs.Path(d, "_committed")).close()


def save_search_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
) -> None:
    """Persist the FULL search index a ranked-retrieval deployment
    serves from (the Lucene shape: immutable SEGMENTS, each published
    atomically):

    * ``<path>/batches/<key>/postings`` — positional postings
      partitioned by the term-hash shard (pruned to the query's shards
      at serve time; serves BOTH phrase queries and BM25);
    * ``<path>/batches/<key>/doclen`` — per-document token counts (the
      "norms" sidecar: BM25's length normalization needs ALL terms'
      counts, which a shard-pruned scan cannot reconstruct);
    * ``<path>/batches/<key>/_committed`` — the atomic publish marker
      (one FS create): readers see a batch entirely or not at all, so
      a crash between the postings and doclen writes can never leave a
      half-visible segment (corpus totals are computed from committed
      doclens at serve — doc-count-sized, never stale).
    """
    _write_index_batch(docs, f"{path}/batches/base", id_col, text_col,
                       n_shards)


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
    asserted in pytest) and reads only COMMITTED segments; tf/df
    aggregate from those shards, the committed doclen sidecars supply
    the length normalization and the (S, D) totals. Same
    results as :func:`bm25_scores` on the indexed corpus (same model
    state, same combiner)."""
    batches = _committed_batches(spark, path)
    if not batches:
        raise ValueError(f"no committed index batches under {path}")
    shards = sorted(
        {
            r["s"]
            for r in terms.select(_shard_of(n_shards).alias("s")).collect()
        }
    )
    # one read per committed segment, unioned (multi-root partition
    # discovery conflicts otherwise); the shard filter pushes through
    # the union into every scan's PartitionFilters
    from functools import reduce

    posts = reduce(
        DataFrame.unionByName,
        [spark.read.parquet(f"{b}/postings") for b in batches],
    ).where(F.col("shard").isin(shards))
    tf = (
        posts.join(F.broadcast(terms.select("th")), "th")
        .groupBy(id_col, "th")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("th").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    dl = reduce(
        DataFrame.unionByName,
        [spark.read.parquet(f"{b}/doclen") for b in batches],
    )
    tot = dl.agg(
        F.sum("dl").cast("bigint").alias("S"),
        F.count(F.lit(1)).cast("bigint").alias("D"),
    )
    return _bm25_combine(tf, df, dl, tot, id_col, k1_milli, b_milli)


def append_to_search_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
    batch_key: str | None = None,
) -> int:
    """Incremental index maintenance — the O(batch) SEGMENT append a
    production retrieval index runs instead of nightly rebuilds,
    crash-safe exactly-once BY CONSTRUCTION (review finding: the old
    multi-file append broke its replay guarantee on a crash between
    files):

    * already-indexed ids are anti-joined away against the COMMITTED
      doclens, so a batch overlapping earlier batches indexes only its
      new documents;
    * the batch lands in its own directory and becomes visible through
      ONE atomic ``_committed`` create — a crash anywhere before the
      marker leaves an invisible partial directory that the replay
      simply overwrites and re-commits;
    * a replay of an already-committed batch maps to the same
      directory (``batch_key`` defaults to an order-independent
      content key over the batch's ids), sees the marker, and is a
      no-op; corpus totals are derived from committed doclens at serve
      time, so there is no stats file to go stale.

    Returns the number of newly indexed documents. A missing index
    bootstraps from the batch (so a streaming foreachBatch can use
    this as its only commit path). Serving equals a full rebuild over
    the union corpus regardless of batching or crash/replay timing
    (pinned in pytest)."""
    spark = docs.sparkSession
    batches = _committed_batches(spark, path)
    if not batches:
        n = docs.count()
        _write_index_batch(
            docs, f"{path}/batches/base", id_col, text_col, n_shards
        )
        return n
    if batch_key is None:
        # order-independent content key: decimal sum (an int64 sum of
        # xxhash64 values overflows under ANSI) folded to 63 bits
        r = docs.agg(
            F.sum(
                F.xxhash64(F.col(id_col).cast("string")).cast(
                    "decimal(38,0)"
                )
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        batch_key = "b%016x_%d" % (
            int(r["h"] or 0) % (1 << 63),
            int(r["n"]),
        )
    bdir = f"{path}/batches/{batch_key}"
    fs, d, jvm = _fs_and_path(spark, bdir)
    if fs.exists(jvm.org.apache.hadoop.fs.Path(d, "_committed")):
        return 0  # replayed committed batch: exactly-once no-op
    from functools import reduce

    seen = reduce(
        DataFrame.unionByName,
        [spark.read.parquet(f"{b}/doclen") for b in batches],
    ).select(id_col)
    fresh = docs.join(seen, on=id_col, how="left_anti")
    n_new = fresh.count()
    if n_new == 0:
        return 0
    _write_index_batch(fresh, bdir, id_col, text_col, n_shards)
    return n_new
