"""Custom stateful streaming operator: gap-based session windows via
``applyInPandasWithState``.

The reference has no stateful operators (SURVEY §2.8 notes "no session
windows"); this is the driver-mandated extension showing how the engine
hosts arbitrary per-key streaming state. Semantics match the batch
``sessionize_users`` query (queries.py): a session closes after
``gap_seconds`` of inactivity.

State design for scale: one state object per user — (session start, last
event ts, event count). State size is O(active keys), eviction via event-time
timeout = watermark + gap, so the store never grows beyond keys active
inside the watermark horizon.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        # canonical "%Y-%m-%d %H:%M:%S" strings (the reference's own time
        # representation) — also sidesteps the Arrow/session-tz round-trip,
        # which shifts naive timestamps emitted from pandas state functions
        StructField("session_start", StringType(), True),
        StructField("session_end", StringType(), True),
        StructField("n_events", LongType(), False),
        StructField("status", StringType(), False),  # closed | open
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType(), True),
        StructField("last_ms", LongType(), True),
        StructField("n", LongType(), True),
    ]
)


def _fmt(ms: int) -> str:
    return pd.Timestamp(ms, unit="ms").strftime("%Y-%m-%d %H:%M:%S")


def make_sessionizer(gap_seconds: int = 1800):
    """Build the (key, batches, state) -> rows function for
    ``applyInPandasWithState`` with ProcessingTimeTimeout."""

    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [_fmt(start_ms)],
                    "session_end": [_fmt(last_ms)],
                    "n_events": [n],
                    "status": ["closed"],
                }
            )
            return

        ts_ms: list[int] = []
        for pdf in pdfs:
            ts_ms.extend(
                int(t.value // 1_000_000) for t in pd.to_datetime(pdf["event_ts"])
            )
        ts_ms.sort()
        if not ts_ms:
            return

        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        for t in ts_ms:
            if start_ms is None:
                start_ms, last_ms, n = t, t, 1
            elif t - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n))
                start_ms, last_ms, n = t, t, 1
            else:
                last_ms, n = t, n + 1
        state.update((start_ms, last_ms, n))
        state.setTimeoutDuration(gap_ms)

        out = closed + [(start_ms, last_ms, n)]
        statuses = ["closed"] * len(closed) + ["open"]
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "session_start": [_fmt(s) for s, _, _ in out],
                "session_end": [_fmt(e) for _, e, _ in out],
                "n_events": [c for _, _, c in out],
                "status": statuses,
            }
        )

    return fn


def make_event_time_sessionizer(gap_seconds: int = 1800, tz: str = "Asia/Jakarta"):
    """(key, batches, state) function for EventTimeTimeout: a session closes
    when the WATERMARK passes last_event + gap — event-time-correct even
    with late or bursty data, unlike the wall-clock variant."""

    gap_ms = gap_seconds * 1000

    def _fmt_tz(ms: int) -> str:
        return (
            pd.Timestamp(ms, unit="ms", tz="UTC")
            .tz_convert(tz)
            .strftime("%Y-%m-%d %H:%M:%S")
        )

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [_fmt_tz(start_ms)],
                    "session_end": [_fmt_tz(last_ms)],
                    "n_events": [n],
                    "status": ["closed"],
                }
            )
            return

        ts_ms: list[int] = []
        for pdf in pdfs:
            ts_ms.extend(int(v) for v in pdf["event_epoch_ms"])
        ts_ms.sort()
        if not ts_ms:
            return

        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        for t in ts_ms:
            if start_ms is None:
                start_ms, last_ms, n = t, t, 1
            elif t - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n))
                start_ms, last_ms, n = t, t, 1
            else:
                last_ms, n = t, n + 1
        state.update((start_ms, last_ms, n))
        # close when the event-time watermark passes the gap horizon
        state.setTimeoutTimestamp(last_ms + gap_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [_fmt_tz(s) for s, _, _ in closed],
                    "session_end": [_fmt_tz(e) for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                    "status": ["closed"] * len(closed),
                }
            )

    return fn


def sessionize_stream_event_time(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
    ts_col: str = "event_ts",
) -> DataFrame:
    """events(user_id, event_ts) stream → CLOSED session rows, event-time
    variant: the watermark on ``ts_col`` drives both late-data admission and
    session closing (EventTimeTimeout). Emits only closed sessions (append
    semantics); open state lives until the watermark passes its gap.

    The pandas function works on epoch millis computed JVM-side by
    ``unix_timestamp`` — Arrow ships session-TZ-naive wall times, so doing
    tz math in pandas would skew timeouts by the session offset.
    """
    from pyspark.sql import functions as F

    prepped = events.withWatermark(ts_col, watermark).withColumn(
        "event_epoch_ms", F.unix_timestamp(ts_col).cast("bigint") * 1000
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        make_event_time_sessionizer(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events(user_id, event_ts) stream → session rows. Grouped state is
    partitioned by user_id (uniform key); each micro-batch ships only that
    batch's rows through Arrow."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
