"""Datetime scalar functions (SURVEY §2.7 F1-F7).

The reference's temporal values are ``strftime`` strings whose lexicographic
order equals chronological order (dags/transform_raw_weather.py:38-41) — the
engine computes on real timestamps but can round-trip to the canonical string
format for output fidelity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CANONICAL_FMT = "yyyy-MM-dd HH:mm:ss"


def canonical_ts(col: Column | str) -> Column:
    """F1: parse the reference's "%Y-%m-%d %H:%M:%S" string."""
    return F.to_timestamp(col, CANONICAL_FMT)


def to_canonical_string(col: Column | str) -> Column:
    """F2: timestamp → canonical string."""
    return F.date_format(col, CANONICAL_FMT)


def zero_pad(col: Column | str, width: int = 2) -> Column:
    """F5: the f"{m:02d}" grid-key format (daily_compile_weather.py:37,109)."""
    return F.format_string(f"%0{width}d", F.col(col) if isinstance(col, str) else col)
