"""Empirical scaling probe: run core operators on 1× and K× replicated
driver testdata (in-memory union — no files written) and report the time
ratio. Near-K× input with a sub-K× or ~K× time ratio on a fixed-core
machine is the evidence that plans scale by data volume, not by plan
degeneracy (quadratic joins, driver collects, state blowups).

    python tools/scaling_probe.py [sf_dir] [K]

Writes SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_weather_jabar_spark.ext.dedup_text import (  # noqa: E402
    cdc_chunk_dedup,
    exact_substring_dedup,
    crossdoc_repeated_ngrams,
    exact_dedup,
    minhash_signatures,
)
from etl_weather_jabar_spark.ext.heavy_hitters import (  # noqa: E402
    count_min_sketch,
)
from etl_weather_jabar_spark.ext.sequencing import (  # noqa: E402
    bpe_train_merges,
)
from etl_weather_jabar_spark.ext.similarity import (  # noqa: E402
    jl_project,
    pca_top_direction,
)
from etl_weather_jabar_spark.ext.matview import (  # noqa: E402
    build_agg_view,
    delta_agg,
    merge_view,
)
from etl_weather_jabar_spark.ext.similarity import lsh_bucketed_topk  # noqa: E402
from etl_weather_jabar_spark.ext.graph import (  # noqa: E402
    connected_components,
    connected_components_star,
)
from etl_weather_jabar_spark.ext.quantize import quantize_int8  # noqa: E402
from etl_weather_jabar_spark.ext.sequencing import (  # noqa: E402
    chunk_documents,
    pack_sequences,
)
from etl_weather_jabar_spark.ext.heavy_hitters import heavy_hitters  # noqa: E402
from etl_weather_jabar_spark.ext.profiling import profile_columns  # noqa: E402
from etl_weather_jabar_spark.ext.timeseries import dyadic_ewma  # noqa: E402
from etl_weather_jabar_spark.operators.aggregates import winsorize  # noqa: E402
from etl_weather_jabar_spark.ext.graph import count_triangles  # noqa: E402
from etl_weather_jabar_spark.operators.dedup import dedupe_keep_first  # noqa: E402
from etl_weather_jabar_spark.operators.diff import apply_cdc, snapshot_diff  # noqa: E402
from etl_weather_jabar_spark.queries import _dec_sum  # noqa: E402
from etl_weather_jabar_spark.session import get_spark  # noqa: E402
from etl_weather_jabar_spark.sources.parquet import load_table  # noqa: E402


def replicate(df, k: int, id_col: str | None = None, id_span: int = 10_000_000):
    """k copies unioned; id_col (if given) is offset per copy so keys stay
    distinct and group/dedup cardinality scales with the data."""
    parts = []
    for i in range(k):
        p = df
        if id_col is not None:
            p = p.withColumn(id_col, F.col(id_col) + F.lit(i * id_span))
        parts.append(p)
    return reduce(lambda a, b: a.unionByName(b), parts)


def timed(thunk) -> float:
    """Time plan construction + execution (construction matters for the
    eager iterative operators like connected_components)."""
    t0 = time.time()
    thunk().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # replication probes hold k copies in one local JVM (driver IS the
    # executor) — same sizing note as scaling_dedup32
    spark = get_spark(
        "scaling-probe", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")
    supplier = load_table(spark, sf_dir, "supplier")

    def sliding_30m(ev):
        return ev.groupBy(F.window("ts", "30 minutes", "10 minutes"), "event_type").agg(
            F.count(F.lit(1)).alias("n")
        )

    def chain_edges(mult: int):
        # 50k·mult nodes in 5-node chains: (i -> i+1) unless i ends a chain
        n = 50_000 * mult
        return (
            spark.range(n)
            .where((F.col("id") % 5) != 4)
            .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        )

    def long_chain(mult: int):
        # 50·mult chains of length 1000: node i links i+1 within its chain
        n, m = 1000, 50 * mult
        return (
            spark.range(n * m)
            .where((F.col("id") % n) != (n - 1))
            .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        )

    def packed(d):
        counted = d.select(
            "doc_id",
            F.size(
                F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
            ).cast("bigint").alias("n"),
        )
        return (
            pack_sequences(counted, "n", budget=512)
            .groupBy("seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    def synth_docs(mult: int):
        # 5k·mult docs of 50 tokens over a 1k-word vocab, text a pure
        # function of the id — distinct across copies, so near-dup pairs
        # come only from chance shingle collisions (plan probe, not a
        # duplicate-density probe)
        return spark.range(5_000 * mult).select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(49)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(F.col("id") * 53 + i * 8191, F.lit(1009)),
                    ),
                ),
                " ",
            ).alias("text"),
        )

    def jaccard_pairs(d):
        from etl_weather_jabar_spark.functions.text import shingles
        from pyspark.sql import Window

        sh = d.select(
            "doc_id", F.explode(shingles(F.col("text"), 3)).alias("sh")
        ).distinct()
        kept = (
            sh.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
            )
            .where(F.col("df") <= 200)
            .drop("df")
        )
        return (
            kept.alias("a")
            .join(kept.alias("b"), "sh")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )

    def synth_graph(mult: int):
        # 2k·mult nodes, avg degree ~30, endpoints hash-derived from the id
        n = 2_000 * mult
        return spark.range(30 * n).select(
            F.pmod(F.col("id") * 2654435761, F.lit(n)).alias("src"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(n)).alias("dst"),
        )

    def recursive_rollup(o):
        # rows accumulate across iterations (input × depth): the default
        # 1M guard dies at ~sf0.1×8 — size it to the data like any limit
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(200_000_000))
        o.createOrReplaceTempView("probe_orders")
        return spark.sql(
            """
            WITH RECURSIVE up AS (
                SELECT o_orderkey AS node, o_orderkey AS anc, 0 AS depth
                FROM probe_orders
                UNION ALL
                SELECT node, anc DIV 10, depth + 1 FROM up WHERE anc >= 10
            )
            SELECT anc AS root, count(*) AS n_nodes, max(depth) AS max_depth
            FROM up WHERE anc < 10 GROUP BY anc
            """
        )

    def decontaminate(d, _):
        from etl_weather_jabar_spark.functions.text import shingles
        from etl_weather_jabar_spark.operators.partitioning import spread

        d = spread(d)  # the 1x parquet is one split; spread before the
        # CPU-dense shingle explode or the baseline runs single-threaded
        sh = d.select(
            "doc_id", F.explode(shingles(F.col("text"), 5)).alias("sh")
        )
        bench = sh.where(F.col("doc_id") % 97 == 0).select("sh").distinct()
        train_sh = (
            sh.where(F.col("doc_id") % 97 != 0)
            .select("doc_id", "sh")
            .distinct()
        )
        return (
            train_sh.join(F.broadcast(bench), "sh").select("doc_id").distinct()
        )

    def pricing(lineitem):
        return (
            lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                _dec_sum(F.col("l_quantity")).alias("sum_qty"),
                _dec_sum(F.col("l_extendedprice")).alias("sum_price"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def _pii(d):
        from etl_weather_jabar_spark.functions.text import pii_counts, redact_pii

        seeded = d.withColumn(
            "t",
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.concat(F.lit(" mail u"), F.col("doc_id").cast("string"),
                             F.lit("@example.com now")),
                ).otherwise(F.lit("")),
            ),
        )
        return seeded.select(
            "source",
            pii_counts(F.col("t"), "email").alias("ne"),
            redact_pii(F.col("t"), kinds=("email",)).alias("clean"),
        ).groupBy("source").agg(
            F.sum("ne").alias("e"), F.sum(F.length("clean")).alias("c")
        )

    def _wmedian(lineitem):
        from pyspark.sql.window import Window as W

        u = lineitem.select(
            F.col("l_returnflag").alias("rf"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
            F.round(F.col("l_quantity")).cast("bigint").alias("q"),
        )
        wc = W.partitionBy("rf").orderBy("cents").rangeBetween(
            W.unboundedPreceding, W.currentRow
        )
        c = u.select(
            "rf", "cents",
            F.sum("q").over(wc).alias("cumq"),
            F.sum("q").over(W.partitionBy("rf")).alias("totq"),
        )
        return (
            c.where(2 * F.col("cumq") >= F.col("totq"))
            .groupBy("rf").agg(F.min("cents").alias("wm"))
        )

    def join_agg(lineitem, o):
        return (
            lineitem.join(o, lineitem.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def _coords(df, idc, salt_x, salt_y):
        def h(salt):
            return F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(salt), F.col(idc).cast("string"))),
                        1, 8,
                    ), 16, 10,
                ).cast("bigint"),
                F.lit(5000),
            )
        return df.select(F.col(idc), h(salt_x).alias("x"), h(salt_y).alias("y"))

    def _radius(evd, sup):
        from etl_weather_jabar_spark.operators.joins import radius_join_gridded

        return radius_join_gridded(
            _coords(evd, "event_id", "ev:", "ve:"),
            _coords(sup, "s_suppkey", "st:", "ts:"),
            ("event_id", "x", "y"), ("s_suppkey", "x", "y"), radius=200,
        ).groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("n"))

    def _matview(o):
        cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
        view0 = build_agg_view(
            o, ["o_orderpriority"], measures={"cents": cents}
        )
        changes = (
            o.where(F.col("o_orderkey") % 17 == 0)
            .withColumn("op", F.lit("D"))
            .unionByName(
                o.where(F.col("o_orderkey") % 19 == 0).withColumn(
                    "op", F.lit("I")
                )
            )
        )
        delta = delta_agg(
            changes, ["o_orderpriority"], measures={"cents": cents}
        )
        return merge_view(view0, delta, ["o_orderpriority"])

    def _classifier(d):
        from etl_weather_jabar_spark.functions.text import (
            feature_hash_slot,
            hashed_weight,
        )

        slotted = d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        ).select("doc_id", feature_hash_slot(F.col("tok"), 64).alias("slot"))
        cnt = slotted.groupBy("doc_id", "slot").agg(
            F.count(F.lit(1)).alias("c")
        )
        return cnt.groupBy("doc_id").agg(
            *[
                F.sum(F.col("c") * hashed_weight(F.col("slot"), kk)).alias(
                    f"s{kk}"
                )
                for kk in range(3)
            ]
        )

    def _grank(o):
        from etl_weather_jabar_spark.operators.windows import (
            global_rank_scalable,
        )

        return global_rank_scalable(
            o.select("o_orderkey", "o_totalprice"),
            ["o_totalprice", "o_orderkey"],
        ).groupBy().agg(F.sum("rank").alias("s"), F.count(F.lit(1)).alias("n"))

    def _bigram_lm(d):
        from etl_weather_jabar_spark.ext.lm import bigram_lm_score

        return bigram_lm_score(d)

    def _bm25(d):
        from etl_weather_jabar_spark.ext.search import bm25_scores

        qterms = (
            d.select(F.explode(F.split("text", " ")).alias("tok"))
            .where(F.length("tok") >= 5)
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("tok").asc())
            .limit(8)
            .select(F.substring(F.md5("tok"), 1, 16).alias("th"))
        )
        return bm25_scores(d, qterms)

    def _phrase(d):
        from etl_weather_jabar_spark.ext.search import (
            build_postings,
            phrase_match,
        )

        # a phrase that actually occurs: the first three tokens of the
        # smallest doc (probe tool — a 1-row collect is fine here)
        first = d.orderBy("doc_id").select("text").first()["text"]
        w = first.split(" ")[:3]
        terms = spark.createDataFrame(
            list(enumerate(w)), ["off", "w"]
        ).select(
            F.col("off").cast("bigint"),
            F.substring(F.md5("w"), 1, 16).alias("th"),
        )
        return phrase_match(build_postings(d), terms)

    def _pq_encode(e):
        from etl_weather_jabar_spark.ext.similarity import (
            pq_encode,
            pq_seed_codebooks,
        )

        return pq_encode(e, pq_seed_codebooks(emb))

    def _knn(e, n_bits=8):
        from etl_weather_jabar_spark.ext.similarity import srp_knn_graph

        return srp_knn_graph(e, k=3, n_bits=n_bits, max_bucket=200)

    def _kmv(ev_):
        from pyspark.sql import Window

        w = Window.partitionBy("event_type").orderBy(F.col("hv").asc())
        h = (
            ev_.select(
                "event_type",
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("user_id").cast("string"),
                                F.lit(":kmv"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                )
                .cast("bigint")
                .alias("hv"),
            ).distinct()
        )
        return (
            h.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 64)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("k_used"), F.max("hv").alias("kth"))
        )

    ev = events

    cases = {
        "scan_agg_pricing": (
            lambda: pricing(li),
            lambda: pricing(replicate(li, k)),
        ),
        # coords derive from ids, so offset replicas spread over the same
        # 5000x5000 region -> density (and pair count) scales with k
        "spatial_radius_join": (
            lambda: _radius(events, supplier),
            lambda: _radius(
                replicate(events, k, "event_id"), replicate(supplier, k, "s_suppkey")
            ),
        ),
        "global_rank_one_shuffle": (
            lambda: _grank(orders),
            lambda: _grank(replicate(orders, k, "o_orderkey")),
        ),
        # both sides replicated with offset orderkeys -> join cardinality
        # scales linearly, not k-squared
        "fact_fact_join_agg": (
            lambda: join_agg(li, orders),
            lambda: join_agg(
                replicate(li, k, "l_orderkey"), replicate(orders, k, "o_orderkey")
            ),
        ),
        "window_dedup_keep_first": (
            lambda: dedupe_keep_first(
                li, ["l_orderkey", "l_linenumber"], order_by=["l_partkey"]
            ),
            lambda: dedupe_keep_first(
                replicate(li, k, "l_orderkey"),
                ["l_orderkey", "l_linenumber"],
                order_by=["l_partkey"],
            ),
        ),
        "exact_dedup_docs": (
            lambda: exact_dedup(docs),
            lambda: exact_dedup(replicate(docs, k, "doc_id")),
        ),
        "minhash_signatures": (
            lambda: minhash_signatures(docs),
            lambda: minhash_signatures(replicate(docs, k, "doc_id")),
        ),
        # 3× row replication before the shuffle is the cost model of overlap
        "sliding_window_30m": (
            lambda: sliding_30m(events),
            lambda: sliding_30m(replicate(events, k, "event_id")),
        ),
        # the Q16 bridge: distinct pair shuffle dominates
        "bridge_pair_distinct": (
            lambda: li.select("l_partkey", "l_suppkey").distinct(),
            lambda: replicate(li, k, "l_partkey")
            .select("l_partkey", "l_suppkey")
            .distinct(),
        ),
        # iterative min-label propagation on 5-node chains (10k vs 10k·K
        # components); rounds are identical (chain diameter fixed), so the
        # ratio isolates the per-round join+agg volume scaling
        "connected_components": (
            lambda: connected_components(chain_edges(1), "src", "dst"),
            lambda: connected_components(chain_edges(k), "src", "dst"),
        ),
        # star contraction on LONG chains (length 1000): round count is
        # ~log(chain length) = constant across mult, so the ratio isolates
        # per-round volume; label propagation would need 1000 rounds here
        "star_contraction_cc": (
            lambda: connected_components_star(long_chain(1), "src", "dst"),
            lambda: connected_components_star(long_chain(k), "src", "dst"),
        ),
        # global prefix sum via range partition + broadcast offsets; the
        # probe is the whole packing pipeline (tokenize → cumsum → bin agg)
        "sequence_packing_prefix_sum": (
            lambda: packed(docs),
            lambda: packed(replicate(docs, k, "doc_id")),
        ),
        # narrow explode+substring — embarrassingly parallel, no shuffle
        "chunk_documents": (
            lambda: chunk_documents(docs, "text", 120, 90),
            lambda: chunk_documents(replicate(docs, k, "doc_id"), "text", 120, 90),
        ),
        # posexplode → D-row stats broadcast → per-element codes
        "int8_quantize": (
            lambda: quantize_int8(emb),
            lambda: quantize_int8(replicate(emb, k, "vec_id")),
        ),
        # one key-partitioned window shuffle + HOF weighted sum; offset
        # user ids so key cardinality (and sort-run count) scales too
        "dyadic_ewma": (
            lambda: dyadic_ewma(
                events, "user_id", [F.col("ts"), F.col("event_id")],
                F.round(F.col("value") * 100).cast("bigint"),
            ),
            lambda: dyadic_ewma(
                replicate(events, k, "user_id"),
                "user_id", [F.col("ts"), F.col("event_id")],
                F.round(F.col("value") * 100).cast("bigint"),
            ),
        ),
        # native session merge: state per key bounded by open sessions
        "session_window_agg": (
            lambda: events.groupBy(
                "user_id", F.session_window("ts", "30 minutes")
            ).agg(F.count(F.lit(1)).alias("n")),
            lambda: replicate(events, k, "user_id")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n")),
        ),
        # full-outer key join, both snapshots replicated -> linear output
        "snapshot_diff": (
            lambda: snapshot_diff(
                orders, orders.where(F.col("o_orderkey") % 97 != 0),
                ["o_orderkey"], ["o_totalprice", "o_orderstatus"],
            ),
            lambda: snapshot_diff(
                replicate(orders, k, "o_orderkey"),
                replicate(orders, k, "o_orderkey").where(
                    F.col("o_orderkey") % 97 != 0
                ),
                ["o_orderkey"], ["o_totalprice", "o_orderstatus"],
            ),
        ),
        # shuffle capped at k_counters·partitions rows however large the
        # input; vocabulary constant across mult, volume scales
        "mg_heavy_hitters": (
            lambda: heavy_hitters(
                docs.select(
                    F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
                ),
                "t", 200,
            ),
            lambda: heavy_hitters(
                replicate(docs, k, "doc_id").select(
                    F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
                ),
                "t", 200,
            ),
        ),
        # CDC apply: union + keep-last window on the key, linear in input
        "apply_cdc": (
            lambda: apply_cdc(
                orders.select("o_orderkey", "o_totalprice"),
                orders.where(F.col("o_orderkey") % 5 == 0).select(
                    "o_orderkey",
                    "o_totalprice",
                    (F.col("o_orderkey") % 7 + 1).alias("seq"),
                    F.when(F.col("o_orderkey") % 10 == 5, F.lit("D"))
                    .otherwise(F.lit("U"))
                    .alias("op"),
                ),
                ["o_orderkey"],
            ),
            lambda: apply_cdc(
                replicate(orders, k, "o_orderkey").select(
                    "o_orderkey", "o_totalprice"
                ),
                replicate(orders, k, "o_orderkey")
                .where(F.col("o_orderkey") % 5 == 0)
                .select(
                    "o_orderkey",
                    "o_totalprice",
                    (F.col("o_orderkey") % 7 + 1).alias("seq"),
                    F.when(F.col("o_orderkey") % 10 == 5, F.lit("D"))
                    .otherwise(F.lit("U"))
                    .alias("op"),
                ),
                ["o_orderkey"],
            ),
        ),
        # shingle explode → df-cap window → pair join on a SYNTHETIC corpus
        # with distinct texts (replicating real docs k× would multiply true
        # duplicate density and grow output k² by construction — a data
        # property, not plan degeneracy; distinct texts isolate the plan)
        "jaccard_pair_pipeline": (
            lambda: jaccard_pairs(synth_docs(1)),
            lambda: jaccard_pairs(synth_docs(k)),
        ),
        # wedge-closure triangle count on a constant-degree synthetic graph:
        # nodes ×k at fixed avg degree → wedges and triangles scale ~k
        "triangle_count": (
            lambda: count_triangles(synth_graph(1), "src", "dst"),
            lambda: count_triangles(synth_graph(k), "src", "dst"),
        ),
        # recursive CTE ancestor walk: one-parent recursion, depth fixed by
        # key width, volume per iteration scales with input
        "recursive_cte_rollup": (
            lambda: recursive_rollup(orders),
            lambda: recursive_rollup(replicate(orders, k, "o_orderkey")),
        ),
        # decontamination: train side scales, benchmark shingle set constant
        # (broadcast) — the scan dominates
        "benchmark_decontaminate": (
            lambda: decontaminate(docs, 1),
            lambda: decontaminate(replicate(docs, k, "doc_id"), 1),
        ),
        # typed stats agg + two-level hash-agg distinct (zero sorts); the
        # distinct-pair shuffle scales with distinct values, not rows
        "table_profile": (
            lambda: profile_columns(
                orders,
                [
                    ("o_orderkey", F.col("o_orderkey")),
                    ("o_orderstatus", F.col("o_orderstatus")),
                    (
                        "o_totalprice_cents",
                        F.round(F.col("o_totalprice") * 100).cast("bigint"),
                    ),
                ],
            ),
            lambda: profile_columns(
                replicate(orders, k, "o_orderkey"),
                [
                    ("o_orderkey", F.col("o_orderkey")),
                    ("o_orderstatus", F.col("o_orderstatus")),
                    (
                        "o_totalprice_cents",
                        F.round(F.col("o_totalprice") * 100).cast("bigint"),
                    ),
                ],
            ),
        ),
        # exact-integer OLS moment sums: partial-agg combine, 3-row shuffle
        "regression_moments": (
            lambda: li.groupBy("l_returnflag").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round("l_quantity").cast("bigint")).alias("sx"),
                F.sum(
                    F.round(F.col("l_quantity"))
                    .cast("bigint")
                    * F.round(F.col("l_extendedprice") * 100).cast("bigint")
                ).alias("sxy"),
            ),
            lambda: replicate(li, k, "l_orderkey")
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round("l_quantity").cast("bigint")).alias("sx"),
                F.sum(
                    F.round(F.col("l_quantity"))
                    .cast("bigint")
                    * F.round(F.col("l_extendedprice") * 100).cast("bigint")
                ).alias("sxy"),
            ),
        ),
        # narrow regexp chain (seed + count + redact) — embarrassingly
        # parallel, no shuffle before the tiny per-source aggregate
        "pii_redact": (
            lambda: _pii(docs),
            lambda: _pii(replicate(docs, k, "doc_id")),
        ),
        # RANGE-framed cumulative weight + crossing filter: one window
        # shuffle on the group key, linear in input
        "weighted_median_window": (
            lambda: _wmedian(li),
            lambda: _wmedian(replicate(li, k, "l_orderkey")),
        ),
        # t-digest bounds + broadcast-back clip (the 100 TB winsorize path)
        "winsorize_approx": (
            lambda: winsorize(
                events, ["event_type"],
                F.round(F.col("value") * 100).cast("bigint"), approx=True,
            ),
            lambda: winsorize(
                replicate(events, k, "event_id"), ["event_type"],
                F.round(F.col("value") * 100).cast("bigint"), approx=True,
            ),
        ),
        # shingle-hash explode → min/max-per-key dup test → key join →
        # per-doc rollup, on SYNTHETIC distinct texts (plan probe — the
        # dup-key set stays near-empty, so the ratio isolates the explode
        # + two shuffles, not duplicate density)
        "crossdoc_repeated_ngrams": (
            lambda: crossdoc_repeated_ngrams(synth_docs(1), n=8),
            lambda: crossdoc_repeated_ngrams(synth_docs(k), n=8),
        ),
        # SRP signatures over the corpus (one narrow pass), broadcast
        # query side, bucket equi-join candidates: corpus ×k, queries
        # fixed → candidate count scales with bucket occupancy (~k)
        "srp_lsh_topk": (
            lambda: lsh_bucketed_topk(
                emb,
                emb.where(F.col("vec_id") < 5).select(
                    F.col("vec_id").alias("query_id"), "embedding"
                ),
                k=10,
            ),
            lambda: lsh_bucketed_topk(
                replicate(emb, k, "vec_id"),
                emb.where(F.col("vec_id") < 5).select(
                    F.col("vec_id").alias("query_id"), "embedding"
                ),
                k=10,
            ),
        ),
        # incremental view maintenance: base view build + signed delta agg
        # + union merge — both aggregations partial-combine map-side, the
        # merge shuffle carries |groups| rows regardless of input size
        "matview_maintenance": (
            lambda: _matview(orders),
            lambda: _matview(replicate(orders, k, "o_orderkey")),
        ),
        # content-defined chunk dedup: token explode + per-doc window +
        # three hash-keyed consumers of one checkpointed chunk table;
        # replicated copies make every chunk boilerplate (df = k), so
        # removal volume scales while the plan stays hash-keyed
        "cdc_chunk_dedup": (
            lambda: cdc_chunk_dedup(docs),
            lambda: cdc_chunk_dedup(replicate(docs, k, "doc_id")),
        ),
        # BPE training: the corpus is touched ONCE (word count); every
        # round is bounded by the vocabulary, which is CONSTANT across
        # replication — the ratio should sit far below k
        "bpe_train_2rounds": (
            lambda: bpe_train_merges(docs, rounds=2),
            lambda: bpe_train_merges(
                replicate(docs, k, "doc_id"), rounds=2
            ),
        ),
        # hashing-trick classifier inference: token explode + two
        # uniform-keyed partial aggregations, weights evaluated once
        # per occupied slot
        "classifier_inference": (
            lambda: _classifier(docs),
            lambda: _classifier(replicate(docs, k, "doc_id")),
        ),
        # JL ±1 projection: posexplode + out_dim fan-out + one
        # uniform-keyed partial agg
        "jl_projection": (
            lambda: jl_project(emb),
            lambda: jl_project(replicate(emb, k, "vec_id")),
        ),
        # CMS build: depth-way union + groupBy whose output (and
        # shuffle) is capped at d·w·partitions rows at ANY input size
        "count_min_sketch": (
            lambda: count_min_sketch(
                docs.select(F.explode(F.split("text", " ")).alias("t")),
                "t",
            ),
            lambda: count_min_sketch(
                replicate(docs, k, "doc_id").select(
                    F.explode(F.split("text", " ")).alias("t")
                ),
                "t",
            ),
        ),
        # exact PCA: the corpus-scaling stage is the d²-group moment
        # aggregate; the matvec round is a d²-sized constant
        "pca_power_1round": (
            lambda: pca_top_direction(emb, rounds=1),
            lambda: pca_top_direction(replicate(emb, k, "vec_id"), rounds=1),
        ),
        # ExactSubstr span dedup: k-gram hash agg (partial-aggregatable
        # packed argmin), removal-start join, one per-doc coverage
        # window — replicated copies make every k-gram duplicated, so
        # removal volume scales with input while keys stay uniform
        "exact_substring_dedup": (
            lambda: exact_substring_dedup(docs),
            lambda: exact_substring_dedup(replicate(docs, k, "doc_id")),
        ),
        # bigram LM scoring: bigram explode + two uniform-keyed counts +
        # stats join back; the stats table is vocab²-bounded and does
        # NOT grow under replication (same text, higher counts)
        "bigram_lm_score": (
            lambda: _bigram_lm(docs),
            lambda: _bigram_lm(replicate(docs, k, "doc_id")),
        ),
        # inverted-index phrase search: postings explode + 3-row term
        # broadcast + anchor aggregation; match volume scales linearly
        "phrase_search": (
            lambda: _phrase(docs),
            lambda: _phrase(replicate(docs, k, "doc_id")),
        ),
        # PQ encode: subspace explode (×8) + codebook broadcast join +
        # one (id, s)-keyed argmin agg — linear in vectors, model-sized
        # broadcast
        "pq_encode": (
            lambda: _pq_encode(emb),
            lambda: _pq_encode(replicate(emb, k, "vec_id")),
        ),
        # kNN graph via SRP buckets: the documented dial is n_bits ~
        # log2(n) - log2(target_bucket), so the K× side widens the
        # signature by log2(K) to hold bucket size constant. Holding
        # n_bits FIXED instead measured 21.5× at 8× data (buckets
        # densify K×, per-node candidates K×, pair work K²) — the
        # honest LSH behavior the dial exists to prevent; noted in the
        # quadratic-knobs section.
        "srp_knn_graph": (
            lambda: _knn(emb),
            lambda: _knn(
                replicate(emb, k, "vec_id"),
                n_bits=8 + max(1, round(__import__("math").log2(k))),
            ),
        ),
        # BM25 lexical ranking: postings aggs (dl/tf/df) + 8-row query
        # broadcast + per-doc sum - every stage partial-aggregates;
        # term selection re-derives per side but is itself one
        # vocab-bounded aggregate
        "bm25_scores": (
            lambda: _bm25(docs),
            lambda: _bm25(replicate(docs, k, "doc_id")),
        ),
        # KMV bottom-k distinct sketch: distinct + group-bounded window;
        # sketch stays k rows per group at any cardinality
        "kmv_sketch": (
            lambda: _kmv(ev),
            lambda: _kmv(replicate(ev, k, "user_id")),
        ),
    }

    lines = [
        "# SCALING — K× replicated-input probe",
        "",
        f"`python tools/scaling_probe.py {sf_dir} {k}` — each core operator "
        f"on its sf0.1 input vs the same input replicated {k}× in memory "
        "(keys offset per copy so cardinalities scale too). Fixed local "
        f"cores, so ideal scaling is a time ratio ≈ {k}; materially above "
        "that means a super-linear plan; far below means fixed overhead "
        "dominates at 1×.",
        "",
        f"| operator | t(1×) s | t({k}×) s | ratio |",
        "|---|---|---|---|",
    ]
    for name, (one, many) in cases.items():
        timed(one)  # warm: codegen + parquet footers
        # best-of-2 on both sides: a GC pause or host blip landing on a
        # single measurement in this long session otherwise fabricates a
        # super-linear ratio (seen: decontaminate 24.7x in-session vs
        # 3.5x isolated)
        t1 = min(timed(one), timed(one))
        tk = min(timed(many), timed(many))
        lines.append(f"| {name} | {t1:.2f} | {tk:.2f} | {tk / t1:.1f}× |")
        print(lines[-1], flush=True)
    path = os.path.join(REPO, "SCALING.md")
    # preserve the hand-written deployment-sizing section (everything from
    # its heading on) across regenerations — only the table is generated
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        # preserve everything from the first hand-maintained section on:
        # the 32× dedup-chain probe (written by scaling_dedup32.py) and
        # the deployment-sizing notes both live below the 8× table
        for marker in ("## 32x dedup-chain probe", "## Deployment sizing"):
            if marker in old:
                tail = "\n" + old[old.index(marker):].rstrip() + "\n"
                break
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
