"""Scaling probe: the WordPiece loop costs VOCABULARY, not corpus.

Runs wordpiece_doc_stats at increasing scale factors. The distinct-word
table (and so the iterative encode loop) is the same size at every sf —
only the corpus-side counts grow — so the probe separates:

* total query time (corpus stats + loop),
* the loop-only time (word_counts collected once, then encode on the
  cached distinct-word frame),
* distinct words and loop iterations actually run.

A flat loop column across 100× corpus growth is the designed behavior
(ext/tokenize.py: "segment the vocabulary, not the corpus").
Run: python tools/scaling_tokenize.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_weather_jabar_spark.ext.tokenize import (  # noqa: E402
    substring_vocab,
    word_counts,
    wordpiece_encode,
)
from etl_weather_jabar_spark.queries import QUERIES  # noqa: E402
from etl_weather_jabar_spark.session import get_spark  # noqa: E402
from etl_weather_jabar_spark.sources.parquet import load_table  # noqa: E402


def main():
    spark = get_spark("scaling-tokenize")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'sf':8s} {'docs':>6s} {'words':>6s} {'total_s':>8s} "
          f"{'loop_s':>7s} {'uni_s':>7s}")
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()

        best_total = None
        for _ in range(2):
            t0 = time.time()
            QUERIES["wordpiece_encode_stats"](spark, sf_dir).count()
            dt = time.time() - t0
            best_total = dt if best_total is None else min(best_total, dt)

        wc = word_counts(docs).localCheckpoint()
        n_words = wc.count()
        vocab = substring_vocab(wc).localCheckpoint()
        vocab.count()
        best_loop = None
        for _ in range(2):
            t0 = time.time()
            wordpiece_encode(wc, vocab).agg(
                F.count(F.lit(1))
            ).collect()
            dt = time.time() - t0
            best_loop = dt if best_loop is None else min(best_loop, dt)

        # unigram (round 8): the SAME vocabulary-not-corpus contract for
        # the Viterbi-EM chain — both DP loops run on the cached
        # distinct-word frame, so this column must stay flat too
        from etl_weather_jabar_spark.ext.tokenize import (
            unigram_pieces,
            unigram_train_scores,
            unigram_viterbi_encode,
        )

        best_uni = None
        for _ in range(2):
            t0 = time.time()
            sc = unigram_train_scores(wc)
            unigram_pieces(unigram_viterbi_encode(wc, sc)).agg(
                F.count(F.lit(1))
            ).collect()
            dt = time.time() - t0
            best_uni = dt if best_uni is None else min(best_uni, dt)

        print(f"{sf:8s} {n_docs:6d} {n_words:6d} {best_total:8.2f} "
              f"{best_loop:7.2f} {best_uni:7.2f}")


if __name__ == "__main__":
    main()
