"""SemDeDup max_cluster cap probe — the degenerate-assignment scenario
the cap exists for (round-5 verdict item 2).

Corpus: n near-identical embeddings (one template document embedded n
times with md5-derived micro-noise) plus a small healthy tail, against
16 spread-out centroids: the template mass all lands in ONE cluster, so
the uncapped within-cluster pair join is ~n²/2 regardless of k — the
anisotropic-embedding failure mode. The probe measures, capped vs
uncapped: candidate pair counts (semantic_cluster_stats), wall time,
and shuffle-write bytes (UI REST stage totals — the signal a quadratic
stage cannot hide).

Usage: python tools/scaling_semdedup_cap.py [n] [cap]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_weather_jabar_spark.ext.similarity import (  # noqa: E402
    semantic_cluster_stats,
    semantic_dedup,
)
from etl_weather_jabar_spark.session import get_spark  # noqa: E402
from tools.scaling_dedup32 import shuffle_write_total  # noqa: E402


def _noise(i: int, j: int) -> float:
    h = hashlib.md5(f"sem:{i}:{j}".encode()).digest()
    return (int.from_bytes(h[:4], "big") / 2**32 - 0.5) * 0.01


def synth_embeddings(spark, n: int, dim: int = 16):
    rows = []
    for i in range(n):
        # template mass: e0 direction + tiny hash noise (all pairwise
        # cosine ≈ 1, all assigned to the e0-nearest centroid)
        rows.append(
            (i, [1.0 + _noise(i, 0)] + [_noise(i, j) for j in range(1, dim)])
        )
    for i in range(n, n + n // 10):
        # healthy tail spread over the other directions
        d = 1 + (i % (dim - 1))
        rows.append(
            (
                i,
                [
                    (1.0 if j == d else 0.0) + _noise(i, j)
                    for j in range(dim)
                ],
            )
        )
    return spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    dim = 16
    spark = get_spark()
    emb = synth_embeddings(spark, n, dim).persist()
    emb.count()
    cents = [
        (c, [1.0 if j == c % dim else 0.0 for j in range(dim)])
        for c in range(16)
    ]

    stats_c = semantic_cluster_stats(emb, cents, max_cluster=cap).collect()[0]
    print(
        f"corpus={emb.count()} max_cluster_size={stats_c['max_cluster_size']} "
        f"pairs_uncapped={stats_c['pairs_uncapped']} "
        f"pairs_capped={stats_c['pairs_capped']} "
        f"members_past_cap={stats_c['members_past_cap']}"
    )

    for label, mc in ((f"cap={cap}", cap), ("uncapped", None)):
        s0 = shuffle_write_total(spark)
        t0 = time.time()
        kept = (
            semantic_dedup(emb, cents, threshold=0.95, max_cluster=mc)
            .where("is_kept")
            .count()
        )
        t = time.time() - t0
        sh = shuffle_write_total(spark) - s0
        print(
            f"{label}: kept={kept} time={t:.2f}s "
            f"shuffle={sh / 1e6:.1f} MB"
        )
    spark.stop()


if __name__ == "__main__":
    main()
