"""Weather-domain scalar functions.

F9: the Rothfusz heat-index regression the reference computes row-at-a-time
in a Python RDD map (dags/spark/transform_raw_weather.py:45-58) — exactly the
anti-pattern SURVEY §2.9 flags. Here it is pure Column arithmetic: stays in
whole-stage codegen, no Python boundary, vectorized end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Rothfusz regression coefficients (NWS heat index, °F / %RH).
_C1 = -42.379
_C2 = 2.04901523
_C3 = 10.14333127
_C4 = -0.22475541
_C5 = -6.83783e-3
_C6 = -5.481717e-2
_C7 = 1.22874e-3
_C8 = 8.5282e-4
_C9 = -1.99e-6


def heat_index_c(temp_c: Column, humidity: Column) -> Column:
    """Heat index in °C from temp (°C) and relative humidity (%).

    °C→°F, 9-term polynomial in (T, RH), back to °C — mirrors the reference's
    formula (dags/spark/transform_raw_weather.py:45-58) as JVM-side
    arithmetic.
    """
    t = temp_c * 9.0 / 5.0 + 32.0
    rh = humidity.cast("double")
    hi_f = (
        F.lit(_C1)
        + _C2 * t
        + _C3 * rh
        + _C4 * t * rh
        + _C5 * t * t
        + _C6 * rh * rh
        + _C7 * t * t * rh
        + _C8 * t * rh * rh
        + _C9 * t * t * rh * rh
    )
    return (hi_f - 32.0) * 5.0 / 9.0
