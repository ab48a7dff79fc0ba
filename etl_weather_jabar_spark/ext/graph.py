"""Distributed connected components for dedup-cluster assembly.

After any near-dup detector emits pairs (MinHash-LSH, SimHash, embedding
cosine — ext/dedup_text.py / ext/similarity.py), turning pairs into
canonical groups ("keep one doc per cluster") is a connected-components
problem: detector edges chain transitively (A~B, B~C ⇒ {A,B,C} even when
A~C was never emitted).

The reference has no graph operators (SURVEY §2 — its dedup is single-key
groupBy, transform_raw_weather.py:78-97); this is a training-pipeline
extension. Algorithm: iterative min-label propagation —

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until a fixpoint. Each round is one join + one aggregation, both
keyed on the node id; rounds needed = graph diameter (dedup clusters are
shallow — near-dup components have tiny diameters, so 3-5 rounds in
practice). For adversarial long-chain graphs the published fix is
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond"), which converges in O(log n) rounds; the loop
below accepts any edge set, so a star-contraction pre-pass can feed it.

Scale notes (100 TB): labels and edges shuffle on node id every round —
partitioning is stable across rounds so AQE reuses the layout; the only
driver-side data is the one-row convergence flag per round. Lineage is cut
with localCheckpoint each round — without it the plan doubles per
iteration and analysis time, not compute, becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the minimum node id reachable. Isolated nodes (no edges) are absent —
    callers left-join and coalesce to the node's own id.

    ``max_iter`` bounds the propagation rounds; convergence (no label
    changed) stops earlier. Raises if the graph hasn't converged at the
    bound — a silent partial closure would merge clusters wrongly.
    """
    sym = edges.select(
        F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v")
    )
    sym = sym.union(
        edges.select(
            F.col(dst).cast("bigint").alias("u"), F.col(src).cast("bigint").alias("v")
        )
    ).distinct()
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
