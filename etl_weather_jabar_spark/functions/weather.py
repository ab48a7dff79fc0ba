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


_EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (lat, lon) degree pairs.

    Haversine form — 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))) —
    as pure Column trigonometry: stays in whole-stage codegen, no UDF.
    Well-conditioned for the station-distance range (meters to a few
    thousand km); antipodal cancellation error (~meter scale) is far
    below station-spacing precision.
    """
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2.0
    dlmb = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(p1) * F.cos(p2) * F.sin(dlmb) * F.sin(dlmb)
    )
    return 2.0 * _EARTH_RADIUS_KM * F.asin(F.sqrt(a))
