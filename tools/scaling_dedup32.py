"""32× scale-stress of the dedup chain (round-3 verdict item 6).

The four dedup tiers + cluster assembly are the 100 TB workhorses, so
they get a deeper probe than the general 8× sweep in scaling_probe.py:
each pipeline runs on a SYNTHETIC corpus (text a pure function of the
doc id — distinct across replicas, with planted near-dup clones every
10th doc so the detectors and the cluster stage have real work that
scales LINEARLY with the corpus) at 1× and 32×, recording wall time AND
shuffle-write bytes (Spark UI REST totals, diffed around each run).
Linear-or-below ratios on a fixed-core machine are the evidence that
none of the tiers hides a super-linear plan.

A second section demonstrates the quadratic-control knobs on a
template corpus (48 shared tokens + 4 id-derived per doc — pairwise
shingle Jaccard high enough that LSH bands genuinely collide): with the
bucket cap at the default the pair stage stays bounded; with the cap
disabled the SAME corpus explodes the candidate set — measured, not
asserted.

    python tools/scaling_dedup32.py [K]

Rewrites the "## 32x dedup-chain probe" section of SCALING.md, leaving
the rest of the file untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from functools import reduce

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from etl_weather_jabar_spark.ext.dedup_text import (  # noqa: E402
    exact_dedup,
    jaccard_verify,
    lsh_band_buckets,
    minhash_lsh_candidates,
    simhash_candidates,
)
from etl_weather_jabar_spark.ext.graph import connected_components  # noqa: E402
from etl_weather_jabar_spark.session import get_spark  # noqa: E402


def shuffle_write_total(spark) -> int:
    """Sum of shuffle-write bytes over all completed stages (UI REST)."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=COMPLETE"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return sum(int(s.get("shuffleWriteBytes", 0)) for s in stages)


def timed(spark, thunk) -> tuple[float, int]:
    s0 = shuffle_write_total(spark)
    t0 = time.time()
    thunk().write.format("noop").mode("overwrite").save()
    t = time.time() - t0
    return t, shuffle_write_total(spark) - s0


def synth_docs(
    spark,
    mult: int,
    n_base: int = 5_000,
    boilerplate: int = 0,
    distinct_tokens: int = 50,
):
    """n_base·mult docs of ~50 tokens over a 1k-word vocab; text is a
    pure function of the id (distinct across replicas). Every 10th doc
    gets a clone (id+n_base·mult·10 offset) differing in ONE token —
    a planted near-dup, one per ten docs, at every scale. With
    ``boilerplate`` > 0 every doc starts with that many SHARED tokens
    (the degenerate-bucket / stop-shingle scenario the caps bound)."""
    n = n_base * mult

    def text_of(idc, perturb):
        return F.array_join(
            F.concat(
                F.transform(
                    F.sequence(F.lit(0), F.lit(boilerplate - 1)),
                    lambda i: F.concat(F.lit("same"), i),
                )
                if boilerplate
                else F.array().cast("array<string>"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(distinct_tokens - 1)),
                    # token = hash(id, position): an affine generator here
                    # (id·53 + i·8191 mod V) makes ~9% of doc PAIRS share
                    # long shingle runs (the affine map aligns windows),
                    # which floods every near-dup tier with fake
                    # candidates — hash-derived tokens make chance
                    # shingle collisions genuinely ~V^-5
                    lambda i: F.when(
                        perturb & (i == distinct_tokens // 2), F.lit("PERTURBED")
                    ).otherwise(
                        F.concat(
                            F.lit("w"),
                            F.pmod(F.xxhash64(idc, i), F.lit(1009)),
                        )
                    ),
                ),
            ),
            " ",
        )

    base = spark.range(n).select(
        F.col("id").alias("doc_id"), text_of(F.col("id"), F.lit(False)).alias("text")
    )
    clones = (
        spark.range(n)
        .where(F.col("id") % 10 == 0)
        .select(
            (F.col("id") + n * 10).alias("doc_id"),
            text_of(F.col("id"), F.lit(True)).alias("text"),
        )
    )
    return base.unionByName(clones)


def cluster_pipeline(docs):
    """The lsh_neardup_clusters shape: band buckets → star edges → CC →
    every doc labeled."""
    banded = lsh_band_buckets(docs, hash_fn="xxhash64")
    star = banded.withColumn(
        "v", F.min("doc_id").over(Window.partitionBy("band", "bucket"))
    ).where(F.col("doc_id") != F.col("v"))
    edges = star.select(
        F.col("doc_id").alias("src"), F.col("v").alias("dst")
    ).distinct()
    comp = connected_components(edges)
    return (
        docs.select("doc_id")
        .join(comp, docs.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        )
    )


def fmt_bytes(b: int) -> str:
    return f"{b / 1e6:.0f} MB" if b >= 1e6 else f"{b / 1e3:.0f} kB"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    # 32× in-memory replication needs real heap (local mode: driver IS
    # the executor); the default 1g OOMs in the pair stages
    spark = get_spark(
        "scaling-dedup32", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def minhash_tier(d):
        return jaccard_verify(
            minhash_lsh_candidates(d, hash_fn="xxhash64"), d, threshold=0.5
        )

    cases = {
        "exact_dedup (tier 1)": lambda m: exact_dedup(synth_docs(spark, m)),
        "simhash_candidates (tier 2)": lambda m: simhash_candidates(
            synth_docs(spark, m)
        ),
        "minhash_lsh + jaccard_verify (tier 3)": lambda m: minhash_tier(
            synth_docs(spark, m)
        ),
        "crossdoc_repeated_ngrams (tier 4)": lambda m: __import__(
            "etl_weather_jabar_spark.ext.dedup_text", fromlist=["x"]
        ).crossdoc_repeated_ngrams(synth_docs(spark, m), n=8),
        "lsh_neardup_clusters (star edges + CC)": lambda m: cluster_pipeline(
            synth_docs(spark, m)
        ),
        # ExactSubstr span removal: duplicated k-gram argmin is
        # partial-aggregatable, coverage is one per-doc window — the
        # clone-per-10-docs planting makes removal volume scale with m
        "exact_substring_dedup (span removal)": lambda m: __import__(
            "etl_weather_jabar_spark.ext.dedup_text", fromlist=["x"]
        ).exact_substring_dedup(synth_docs(spark, m), k=8),
    }

    rows = []
    for name, make in cases.items():
        timed(spark, lambda: make(1))  # warm codegen
        t1, s1 = timed(spark, lambda: make(1))
        tk, sk = timed(spark, lambda: make(k))
        rows.append((name, t1, tk, tk / t1, s1, sk, sk / max(s1, 1)))
        print(rows[-1], flush=True)

    # knob demo at 1×: boilerplate corpus, capped vs uncapped candidates
    # template corpus: 48 shared tokens + 4 id-derived — pairwise shingle
    # Jaccard ~0.6, so LSH bands genuinely collide across the whole corpus
    # (the template-spam scenario the bucket cap exists for)
    boiler = synth_docs(
        spark, 1, n_base=2_000, boilerplate=48, distinct_tokens=4
    )
    t_cap, s_cap = timed(
        spark, lambda: minhash_lsh_candidates(boiler, max_bucket=200)
    )
    t_off, s_off = timed(
        spark, lambda: minhash_lsh_candidates(boiler, max_bucket=10_000_000)
    )
    n_cap = minhash_lsh_candidates(boiler, max_bucket=200).count()
    n_off = minhash_lsh_candidates(boiler, max_bucket=10_000_000).count()

    lines = [
        "## 32x dedup-chain probe",
        "",
        f"`python tools/scaling_dedup32.py {k}` — the four dedup tiers + "
        f"cluster assembly on a synthetic corpus (distinct texts, one "
        f"planted near-dup clone per 10 docs) at 1x and {k}x. Fixed "
        f"local cores: ideal time ratio <= {k}; shuffle-write bytes are "
        "the Spark-UI stage totals diffed around each run (the signal a "
        "super-linear pair stage cannot hide).",
        "",
        f"| pipeline | t(1x) s | t({k}x) s | time ratio | shuffle(1x) "
        f"| shuffle({k}x) | shuffle ratio |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, t1, tk, rt, s1, sk, rs in rows:
        lines.append(
            f"| {name} | {t1:.2f} | {tk:.2f} | {rt:.1f}x "
            f"| {fmt_bytes(s1)} | {fmt_bytes(sk)} | {rs:.1f}x |"
        )
    lines += [
        "",
        "### Quadratic-control knobs, observed",
        "",
        "Template corpus (2.2k docs, 48 shared tokens + 4 id-derived "
        "each — the template-spam degenerate-bucket scenario):",
        "",
        f"- `max_bucket=200` (default-ish): {n_cap} candidate pairs, "
        f"{t_cap:.2f}s, {fmt_bytes(s_cap)} shuffled;",
        f"- cap disabled: {n_off} candidate pairs, {t_off:.2f}s, "
        f"{fmt_bytes(s_off)} shuffled.",
        "",
        "The cap drops the shared-prefix buckets (their members pair "
        "through the other bands or the exact tier), bounding the worst "
        "bucket's pair expansion at cap^2 regardless of data skew; the "
        "same dial exists as the shingle df-cap in the n-gram Jaccard "
        "tier and `max_bucket` in ext/similarity.py::srp_neardup_pairs.",
        "",
        "**SimHash width bound (analytical caveat).** The tier-2 ratio "
        "above is linear at this corpus size, but pigeonhole banding "
        "over a FIXED 60-bit fingerprint has expected chance-collision "
        "pairs ~ (max_hamming+1) * n^2 / 2^(60/(max_hamming+1)) — a "
        "birthday bound, quadratic in corpus size at fixed width. The "
        "dials: lower `max_hamming` widens each chunk key (max_hamming=1 "
        "-> 30-bit chunks -> fine to ~10^7 docs), `max_bucket` hard-caps "
        "any degenerate bucket, and beyond that SimHash runs per shard "
        "or AFTER MinHash-LSH blocking (tier 3, whose banded keys are "
        "effectively 256-bit and collision-free at any corpus size — "
        "its ratio above stays linear).",
        "",
    ]

    path = os.path.join(REPO, "SCALING.md")
    old = open(path).read() if os.path.exists(path) else ""
    marker = "## 32x dedup-chain probe"
    if marker in old:
        head = old[: old.index(marker)].rstrip()
        after = old[old.index(marker) :]
        nxt = after.find("\n## ", 1)
        tail = after[nxt + 1 :] if nxt != -1 else ""
    else:
        anchor = "## Deployment sizing"
        if anchor in old:
            head = old[: old.index(anchor)].rstrip()
            tail = old[old.index(anchor) :]
        else:
            head, tail = old.rstrip(), ""
    with open(path, "w") as f:
        f.write(head + "\n\n" + "\n".join(lines) + "\n" + tail)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
