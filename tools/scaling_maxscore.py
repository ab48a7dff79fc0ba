"""MaxScore-prune win probe (round-6 verdict item 5 'measured win'):
the driver's synthetic documents table has a UNIFORM vocabulary (every
length≥5 token has df ≈ 3850/5000 at sf0.1), where no top-k prune can
structurally win — so the registry query `bm25_pruned_topk` certifies
TRANSPARENCY on that corpus, and this probe measures the WIN on the
realistic regime: a Zipf-distributed vocabulary (real text), where a
mixed rare+common query lets MaxScore skip the common terms' huge
posting lists.

Corpus: hash-derived tokens (NOT affine — see FIXTURES.md) with token
rank = floor(V^u), u uniform from xxhash64 → density ∝ 1/rank (Zipf
s≈1). Query = 2 head terms (rank 1-2, df ≈ corpus) + 2 torso terms
(df ≈ 10²) — the torso terms' idf sets θ; the head terms become
non-essential and the docs matching only them are never scored.

Run: python tools/scaling_maxscore.py [n_docs=20000]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_weather_jabar_spark.ext.search import (  # noqa: E402
    bm25_topk_indexed,
    save_search_index,
)
from etl_weather_jabar_spark.session import get_spark  # noqa: E402

V = 50_000
DOC_LEN = 60


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("scaling-maxscore")
    spark.sparkContext.setLogLevel("ERROR")

    def tok(p):
        u = F.pmod(
            F.xxhash64(F.col("id"), F.lit(":zipf:"), p), F.lit(1_000_000)
        ) / F.lit(1_000_000.0)
        return F.concat(F.lit("w"), F.floor(F.pow(F.lit(float(V)), u)).cast("string"))

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(0), F.lit(DOC_LEN - 1)), tok)
        ).alias("text"),
    )
    idx = tempfile.mkdtemp(prefix="maxscore_") + "/idx"
    save_search_index(docs, idx)

    # query: 2 head tokens + the 2 tokens nearest df=150 (torso)
    tokc = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count_distinct(F.lit(1)).alias("_"), F.count(F.lit(1)).alias("c"))
    )
    head = [
        r["tok"]
        for r in tokc.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(2)
        .collect()
    ]
    torso = [
        r["tok"]
        for r in tokc.withColumn("d", F.abs(F.col("c") - 150))
        .orderBy(F.col("d").asc(), F.col("tok").asc())
        .limit(2)
        .collect()
    ]
    words = head + torso
    print(f"{n_docs} docs, V={V}, query = {words}")
    terms = spark.createDataFrame([(w,) for w in words], ["w"]).select(
        F.substring(F.md5("w"), 1, 16).alias("th")
    )

    def bench(prune):
        runs = []
        for _ in range(3):
            t0 = time.time()
            df = bm25_topk_indexed(spark, idx, terms, prune_k=prune)
            df.orderBy(F.col("score_u").desc(), F.col("doc_id").asc()).limit(
                20
            ).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        return min(runs)

    n_full = bm25_topk_indexed(spark, idx, terms).count()
    n_pruned = bm25_topk_indexed(spark, idx, terms, prune_k=20).count()
    t_full = bench(None)
    t_pruned = bench(20)
    full20 = sorted(
        map(
            tuple,
            bm25_topk_indexed(spark, idx, terms)
            .orderBy(F.col("score_u").desc(), F.col("doc_id").asc())
            .limit(20)
            .collect(),
        )
    )
    pr20 = sorted(
        map(
            tuple,
            bm25_topk_indexed(spark, idx, terms, prune_k=20)
            .orderBy(F.col("score_u").desc(), F.col("doc_id").asc())
            .limit(20)
            .collect(),
        )
    )
    assert full20 == pr20, "prune must be transparent for the top-k"
    print(
        f"docs scored: unpruned {n_full}, maxscore {n_pruned} "
        f"({n_full / max(n_pruned, 1):.0f}x fewer)"
    )
    print(
        f"serve time:  unpruned {t_full:.2f}s, maxscore {t_pruned:.2f}s "
        f"(top-20 identical)"
    )


if __name__ == "__main__":
    main()
