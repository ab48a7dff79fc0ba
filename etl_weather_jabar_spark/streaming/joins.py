"""Stream-stream interval join (dual watermarks).

Nothing in the reference joins two live feeds — its only cross-feed logic
is the batch anti-join of incoming vs stored rows (SURVEY §2.3 J3). This is
the engine extension for the canonical streaming case: attribute one
stream's events to another's within a time bound (impression→click,
order→ship, sensor→alarm).

State design for scale: Spark buffers each side's rows until the OTHER
side's watermark passes the join-condition horizon, so state size =
rate × (watermark + within_seconds) per side — both bounds are explicit
arguments here, never unbounded. The equi-key is the shuffle partition key;
the time bound only prunes state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static equi-join — the streaming form of the reference's
    broadcast dimension lookup (SURVEY §2.3 J1, daily_compile_weather.py:
    25-30's id→name dict probe): every micro-batch of the stream joins the
    static side.

    Unlike stream-stream joins this is STATELESS — no watermark, no state
    store, nothing buffered across batches: the static side is simply
    (re-)evaluated per micro-batch. With ``broadcast_dim`` the stream side
    never shuffles (27-row dims at the reference; keep it for any dim that
    fits an executor). ``how`` is left by default so unmatched facts pass
    through null-extended rather than silently dropping (Spark also allows
    inner/leftSemi/leftAnti for stream-static).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, key, how)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    within_seconds: int = 600,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right-events to the left-event they follow within
    ``within_seconds``: ``l.key == r.key AND l.ts <= r.ts <= l.ts + bound``.

    Column names must be disjoint between the sides (rename before
    calling) — keeps the output schema unambiguous. ``how`` supports
    inner and the outer variants Spark allows for stream-stream joins
    (leftOuter/rightOuter need the time bound, which this always has).
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
        )
    )
    return l.join(r, cond, how)
