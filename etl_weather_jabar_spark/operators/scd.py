"""Slowly-changing-dimension (type 2) assembly from a change log.

Turn an ordered stream of per-key attribute observations into validity
intervals: one row per *distinct run* of attribute values, stamped
``valid_from`` / ``valid_to`` / ``is_current``. This is how a dimension
(user profile, document metadata, supplier status) is versioned in a
warehouse so facts can join "as of" their event time — the batch
complement of the as-of join (operators/joins.py::asof_join_backward).

Plan shape: one shuffle (partition by key, order by time) drives both
window passes — the change-point filter (lag) and the interval close
(lead) share the partitioning, so Catalyst sorts once and the second
window rides the first's exchange. State per key is O(1); no collect, no
iteration — scales to any number of keys.

Reference parity: the reference keeps only latest-value dimensions
(master_location.json, SURVEY §1.1); versioned history is a
driver-mandated warehouse extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    df: DataFrame,
    key: str,
    order: list[str | Column],
    attrs: list[str],
) -> DataFrame:
    """Collapse consecutive duplicate attribute tuples per key into SCD2
    validity intervals.

    ``order`` must be a total order (include a tie-breaker column).
    Returns ``key, attrs..., valid_from..., valid_to..., is_current``
    where the from/to columns are the order columns' values at the run's
    first row and at the next run's first row (NULL for the open run).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    w = Window.partitionBy(key).orderBy(*cols)
    tup = F.struct(*[F.col(a) for a in attrs])
    # change point: first row of the key, or attribute tuple differs from
    # the previous observation (null-safe via struct equality on lag)
    prev = F.lag(tup).over(w)
    changes = df.withColumn(
        "__chg", prev.isNull() | ~tup.eqNullSafe(prev)
    ).where(F.col("__chg"))
    # close each interval at the next change point of the same key
    w2 = Window.partitionBy(key).orderBy(*cols)
    out = changes.select(
        key,
        *attrs,
        *[c.alias(f"valid_from_{i}") for i, c in enumerate(cols)],
        *[
            F.lead(c).over(w2).alias(f"valid_to_{i}")
            for i, c in enumerate(cols)
        ],
    )
    return out.withColumn("is_current", F.col("valid_to_0").isNull())
