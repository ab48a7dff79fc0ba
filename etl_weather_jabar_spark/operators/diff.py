"""Snapshot reconciliation: what changed between two versions of a table.

The nightly question every warehouse asks — "what did today's load add,
drop, or mutate vs yesterday?" — as one distributed plan: a full outer
join on the business key plus null-safe column comparison. No row hashes
travel anywhere (hashing is a lossy shortcut that can't name WHICH column
changed); the comparison is a per-column ``<=>`` disjunction that Catalyst
codegens inline.

Scale shape: one shuffle per side on the key — and zero shuffles if both
snapshots are written bucketed by the key (sinks.py::write_bucketed),
which is how a 100 TB nightly diff should store its inputs. Output is
narrow (key + change_type + changed column names), so downstream
aggregation is cheap.

Reference parity: the reference reconciles nothing (append-only loads,
load_to_postgres.py); this extends its keyed-upsert sink (S6) with the
audit view a mutable pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    *,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change log onto a base snapshot → the new snapshot.

    The inverse of :func:`snapshot_diff`: given yesterday's table and a log
    of keyed upserts/deletes (``op_col`` ∈ {'U','D'}, ordered per key by
    ``seq_col``), materialize today's table. Keep-last semantics: for each
    key the highest-``seq_col`` record wins; a winning 'D' removes the key
    (a later 'U' resurrects it — the upsert-after-delete case). The base
    rows participate at ``seq = 0``, so change sequences must be positive.

    One plan: union → per-key keep-last window → filter. The only shuffle
    is the window partition on the key — the same exchange a MERGE would
    need, with none of the per-row lookup cost the reference's
    find-then-update sink pays (daily_compile_weather.py:136-142). Output
    keeps the winning row's full width plus ``seq_col`` (lineage: which
    change produced this row; 0 = carried over from base).

    At 100 TB: base >> changes, so the cost is one full shuffle of the
    base (the union discards any pre-existing layout — bucketing the base
    does NOT remove this exchange). When the change set is small and the
    base is bucketed on the key, the cheaper plan is to pre-reduce the
    log per key (keep-last within changes only), then full-outer-join it
    against the base bucket-aligned and pick the winner per row — same
    semantics, no base shuffle. This function keeps the general
    union+window form; the join form is a layout-specific rewrite.
    """
    cols = [c for c in base.columns if c not in (seq_col, op_col)]
    b = base.select(*cols).withColumn(
        seq_col, F.lit(0).cast("bigint")
    ).withColumn(op_col, F.lit("U"))
    c = changes.select(
        *cols, F.col(seq_col).cast("bigint").alias(seq_col), op_col
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        b.unionByName(c)
        .withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col(op_col) == "U"))
        .select(*cols, seq_col)
    )


def apply_cdc_joined(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    *,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """The layout-aware rewrite of :func:`apply_cdc` for base >> changes:
    pre-reduce the change log to its per-key winner (window over CHANGES
    only — the small side), then resolve against the base with one
    full-outer join. Same semantics, including delete and
    upsert-after-delete; tested equivalent.

    Why it exists: the union+window form must shuffle base+changes
    together. Here the only data-sized exchange is on the changes side —
    if the base is written bucketed on the key (sinks.py::write_bucketed)
    the base scan feeds the join with NO exchange, so a 100 TB base pays
    zero shuffle to absorb a 100 GB change log. The window's hash
    partitioning on the key is exactly the join's requirement, so
    Catalyst reuses it (one exchange total on the changes side).
    """
    cols = [c for c in base.columns if c not in (seq_col, op_col)]
    data_cols = [c for c in cols if c not in keys]
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    last = (
        changes.select(
            *cols, F.col(seq_col).cast("bigint").alias(seq_col), op_col
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    j = base.select(*cols).alias("b").join(last.alias("c"), on=keys, how="full_outer")
    has_change = F.col(f"c.{op_col}").isNotNull()
    picked = [
        F.when(has_change, F.col(f"c.{x}")).otherwise(F.col(f"b.{x}")).alias(x)
        for x in data_cols
    ]
    return (
        j.where(~has_change | (F.col(f"c.{op_col}") == "U"))
        .select(
            *keys,
            *picked,
            F.when(has_change, F.col(f"c.{seq_col}"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias(seq_col),
        )
        .select(*cols, seq_col)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    *,
    keep_unchanged: bool = False,
) -> DataFrame:
    """Classify every key as added / removed / changed (/ unchanged).

    Returns ``keys..., change_type, changed_cols`` where ``changed_cols``
    is a sorted array of the differing column names (empty unless
    ``change_type == 'changed'``). Null-safe throughout: a column moving
    NULL→value or value→NULL counts as a change.
    """
    # presence flags are literal markers on each side — a present row whose
    # compare columns are all NULL must still count as present
    o = old.select(*keys, *compare_cols).withColumn("__present_o", F.lit(1))
    n = new.select(*keys, *compare_cols).withColumn("__present_n", F.lit(1))
    joined = o.alias("o").join(n.alias("n"), on=keys, how="full_outer")
    changed_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change_type = (
        F.when(F.col("o.__present_o").isNull(), F.lit("added"))
        .when(F.col("n.__present_n").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *keys,
        change_type.alias("change_type"),
        F.when(change_type == "changed", changed_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    if not keep_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out


def hash_range_reconcile(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    n_buckets: int = 1024,
) -> DataFrame:
    """Merkle-style table reconciliation: find WHICH key ranges differ
    between two copies of a table without shipping either copy — the
    anti-entropy primitive for verifying a replicated/migrated/
    re-ingested 100 TB table, where a row-level full-outer diff
    (:func:`snapshot_diff`) would shuffle everything.

    Each row folds to a 60-bit md5 digest of (keys + values); rows hash
    into ``n_buckets`` by key digest, and each side aggregates ONE row
    per bucket: (row count, XOR of digests) — order-independent,
    overflow-free, partial-aggregatable, so the shuffle carries
    2 * n_buckets rows total regardless of table size. Buckets whose
    (count, xor) pairs disagree localize the damage; re-running on the
    suspect buckets with a larger ``n_buckets`` (or falling back to
    snapshot_diff on that key range) drills down — log-style narrowing,
    classic anti-entropy.

    Caveat (documented, inherent to XOR folding): a bucket containing
    the SAME multiset of digests matches even if different keys carry
    them, and a duplicated-row pair XORs away — the count catches even
    multiplicities only. For corruption/drift detection this is the
    standard tradeoff; the digest covers values, so any single-row edit
    flips the bucket.

    md5-derived digests keep the scheme engine-portable (bit-identical
    in any engine with md5 — the registry query's DuckDB twin recomputes
    both sides in SQL).

    Row serialization is UNAMBIGUOUS: each column contributes a
    fixed-width field — 'n' for NULL, 'v'+md5(value) otherwise — so a
    delimiter appearing IN a value cannot shift field boundaries
    ('a|b','c' vs 'a','b|c' collide under naive concat_ws, which also
    silently SKIPS nulls, conflating (NULL,'x') with ('x',NULL)).
    """
    def folded(df: DataFrame, side: str) -> DataFrame:
        def h(cols: list[str]):
            fields = [
                F.when(F.col(c).isNull(), F.lit("n")).otherwise(
                    F.concat(F.lit("v"), F.md5(F.col(c).cast("string")))
                )
                for c in cols
            ]
            return F.conv(
                F.substring(F.md5(F.concat(*fields)), 1, 15),
                16,
                10,
            ).cast("bigint")

        return (
            df.select(
                F.pmod(h(key_cols), F.lit(n_buckets)).alias("bucket"),
                h(key_cols + value_cols).alias("__d"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias(f"n_{side}"),
                F.expr("bit_xor(__d)").alias(f"x_{side}"),
            )
        )

    lf = folded(left, "l")
    rf = folded(right, "r")
    return (
        lf.join(rf, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_l", F.lit(0)).alias("n_l"),
            F.coalesce("n_r", F.lit(0)).alias("n_r"),
            F.coalesce("x_l", F.lit(0)).alias("x_l"),
            F.coalesce("x_r", F.lit(0)).alias("x_r"),
        )
        .where(
            (F.col("n_l") != F.col("n_r")) | (F.col("x_l") != F.col("x_r"))
        )
    )
