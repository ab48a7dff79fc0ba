"""Arrow-batched Python escape hatches: cogrouped applyInPandas + UDTF.

The engine's rule (SURVEY §2.9) is that NOTHING on the hot path is a
row-at-a-time Python UDF — every reference operator is Column arithmetic.
But a complete engine still needs the sanctioned escape hatches for
semantics Spark genuinely can't express, and they must be the FAST kind:
Arrow-batched, grouped, vectorized. This module holds the two surfaces the
rest of the package doesn't already demonstrate (`ext/multimodal.py` covers
``mapInPandas``):

* ``cogroup().applyInPandas`` — align TWO tables per key inside one Python
  function (pandas in, pandas out). The canonical use is per-key
  reconciliation/alignment logic too stateful for a join projection.
* Python UDTF (Spark ≥3.5) — a table function emitting N rows per input
  row from imperative logic. Registered as the escape hatch for
  generators that ``explode(F.sequence(...))`` can't express.

Both carry the same health warning in-code: if the body is expressible as
DataFrame ops, write the DataFrame ops. Each function's pytest twin proves
the Python result EQUALS a native plan on the same input, so the escape
hatch is exercised without ever being load-bearing.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile_order_totals(
    orders: DataFrame, lineitem: DataFrame, tol_cents: int = 0
) -> DataFrame:
    """Per-order reconciliation of header total vs Σ line gross, computed
    cogrouped in pandas → ``(o_orderkey, header_cents, lines_cents,
    delta_cents, n_lines, status)``.

    status: 'match' within ``tol_cents``, 'mismatch' otherwise, 'no_lines'
    for header-only orders, 'orphan_lines' for lines without a header.

    Scale shape: ``cogroup`` shuffles both sides on the key once (exactly
    what the equivalent outer-join plan would do) and streams each key
    group through Arrow. Grouping keys must not be skewed — one giant
    order lands in one Python worker. The pytest twin asserts equality
    with the native join form; prefer that form in production — this
    exists to pin the cogroup surface.
    """

    def rec(key: tuple, o: pd.DataFrame, li: pd.DataFrame) -> pd.DataFrame:
        header = (
            int(round(float(o["o_totalprice"].iloc[0]) * 100))
            if len(o)
            else None
        )
        lines = int(
            (li["l_extendedprice"] * 100).round().astype("int64").sum()
        ) if len(li) else 0
        if header is None:
            status = "orphan_lines"
            delta = None
        elif not len(li):
            status = "no_lines"
            delta = None
        else:
            delta = header - lines
            status = "match" if abs(delta) <= tol_cents else "mismatch"
        return pd.DataFrame(
            {
                "o_orderkey": [int(key[0])],
                "header_cents": pd.array([header], dtype="Int64"),
                "lines_cents": pd.array(
                    [lines if len(li) else None], dtype="Int64"
                ),
                "delta_cents": pd.array([delta], dtype="Int64"),
                "n_lines": [len(li)],
                "status": [status],
            }
        )

    o = orders.select("o_orderkey", "o_totalprice")
    li = lineitem.select("l_orderkey", "l_extendedprice")
    return (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy(F.col("l_orderkey").alias("o_orderkey")))
        .applyInPandas(
            rec,
            "o_orderkey bigint, header_cents bigint, lines_cents bigint, "
            "delta_cents bigint, n_lines bigint, status string",
        )
    )


def reconcile_order_totals_native(
    orders: DataFrame, lineitem: DataFrame, tol_cents: int = 0
) -> DataFrame:
    """The DataFrame-native twin of :func:`reconcile_order_totals` — the
    form production should use (full outer join of two partial
    aggregates; no Python boundary)."""
    o = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("header_cents"),
    )
    li = (
        lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("lines_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    j = o.join(li, "o_orderkey", "full_outer")
    delta = F.col("header_cents") - F.col("lines_cents")
    status = (
        F.when(F.col("header_cents").isNull(), F.lit("orphan_lines"))
        .when(F.col("lines_cents").isNull(), F.lit("no_lines"))
        .when(F.abs(delta) <= tol_cents, F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    return j.select(
        "o_orderkey",
        "header_cents",
        "lines_cents",
        F.when(
            F.col("header_cents").isNotNull()
            & F.col("lines_cents").isNotNull(),
            delta,
        ).alias("delta_cents"),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        status.alias("status"),
    )


def register_chunk_udtf(spark) -> None:
    """Register ``chunk_spans(n_chars, size, overlap)`` — a Python UDTF
    (Spark ≥3.5) emitting one ``(start, end)`` row per chunk of an
    ``n_chars``-long document, same arithmetic as
    ext/sequencing.py::chunk_documents. The UDTF form exists to pin the
    table-function escape hatch; the sequencing module's
    ``explode(sequence(...))`` form is the production path (JVM-side,
    zero Python). Use from SQL: ``LATERAL chunk_spans(n_chars, 512, 64)``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_start int, chunk_end int")
    class ChunkSpans:
        def eval(self, n_chars: int, size: int, overlap: int):
            if n_chars is None or size <= 0 or not (0 <= overlap < size):
                return
            step = size - overlap
            start = 0
            while start < n_chars:
                yield start, min(start + size, n_chars)
                if start + size >= n_chars:
                    break
                start += step

    spark.udtf.register("chunk_spans", ChunkSpans)


def groupwise_ols(
    df,
    group_col: str,
    x_col,
    y_cents,
):
    """Per-group OLS slope/intercept via grouped-map ``applyInPandas`` —
    the Python escape hatch for per-group MODEL FITTING (the general
    case: scikit-style estimators per key). This instance reproduces the
    closed-form integer arithmetic of queries.regression_surface
    EXACTLY: moments accumulate as arbitrary-precision python ints
    inside the worker, the half-up division is the same floor identity —
    so the test pins it bit-identical to the pure-Column form. At scale
    each group must fit one executor's memory (grouped-map contract);
    groups beyond that belong to the moment-sum Column form, which has
    no such limit.
    """
    import pandas as pd

    out_schema = (
        f"{group_col} STRING, n_rows BIGINT, "
        "slope_dollars_per_qty DOUBLE, intercept_dollars DOUBLE"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(x) for x in pdf["__x"]]
        ys = [int(y) for y in pdf["__y"]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))

        def halfup(num: int, den: int) -> int:
            a, b = 2 * num + den, 2 * den
            return (a - (a % b + b) % b) // b

        den = n * sxx - sx * sx
        slope = halfup((n * sxy - sx * sy) * 1000000, den * 100) / 1e6
        intercept = halfup(sy * sxx - sx * sxy, den) / 100.0
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_rows": [n],
                "slope_dollars_per_qty": [slope],
                "intercept_dollars": [intercept],
            }
        )

    from pyspark.sql import functions as F

    prepared = df.select(
        F.col(group_col),
        F.round(x_col).cast("bigint").alias("__x"),
        y_cents.cast("bigint").alias("__y"),
    )
    return prepared.groupBy(group_col).applyInPandas(fit, schema=out_schema)


def asof_join_pandas(
    left,
    right,
    on: str,
    left_ts: str,
    right_ts: str,
    carried: list[str],
    tolerance_seconds: int | None = None,
    direction: str = "backward",
):
    """Backward as-of join via cogrouped ``applyInPandas`` +
    ``pd.merge_asof`` — the guide-book escape hatch for when the
    union+running-last Column form (operators/joins.py::
    asof_join_backward) can't express the semantics (``direction`` passes
    through to pandas: "backward" / "forward" / "nearest" — the native
    Column forms cover backward and forward; NEAREST exists only here). Each key's rows meet in one
    pandas callback, sorted there; the test pins this equal to the
    native form on the same inputs. Per-key rows must fit one executor
    (cogroup contract) — the Column form has no such limit, which is why
    it stays the default.
    """
    import pandas as pd

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"{f.name} {f.dataType.simpleString()}"
            for f in right.select(*carried).schema.fields
        ]
    )

    def merge(_key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(left_ts, kind="mergesort")
        r = r.sort_values(right_ts, kind="mergesort")[[right_ts, *carried]]
        kwargs = {}
        if tolerance_seconds is not None:
            kwargs["tolerance"] = pd.Timedelta(seconds=tolerance_seconds)
        out = pd.merge_asof(
            l,
            r,
            left_on=left_ts,
            right_on=right_ts,
            direction=direction,
            **kwargs,
        )
        return out[[*l.columns, *carried]]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, schema=schema)
    )
