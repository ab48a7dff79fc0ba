"""Exact integer/decimal arithmetic helpers shared by the registry's
integer-unit aggregation layer (queries.py) and the ext/ operators.

ONE implementation of the cross-engine round-half-up division — the
formula every oracle twin mirrors (`queries._sql_halfup`). Keeping a
single copy is itself a correctness property: the engine's exactness
guarantees depend on every call site agreeing bit-for-bit with the SQL
twin, so a fix here propagates everywhere at once.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def half_up_div(num: Column, den: Column) -> Column:
    """round-half-up(num/den) as floor((2·num+den)/(2·den)), exact.
    Ties round toward +inf (−0.5 → 0), identically in every engine.

    Operands are promoted to decimal(38,0) BEFORE the (2·num+den)
    scaling: in 64-bit the scaling silently wraps for |num| ≳ 2^62
    (Spark non-ANSI), producing garbage where the SQL twin errors —
    callers with products of two bigints (e.g. value-delta × time-delta
    in linear interpolation) must promote the MULTIPLICATION too, by
    casting one factor to decimal first. pmod makes the numerator an
    exact multiple of the divisor, so the decimal divide is exact over
    the full 38-digit range (a double divide is only exact below 2^53).
    """
    a = num.cast(_DEC) * 2 + den.cast(_DEC)
    b = den.cast(_DEC) * 2
    return ((a - F.pmod(a, b)) / b).cast("bigint")


def floor_div(num: Column, den: Column) -> Column:
    """floor(num/den) exact over the decimal(38,0) range — the engine
    twin of SQL `//`/`div` for operands that may exceed int64 (where
    Spark's bigint `div` would wrap and a double division would round).
    Same exact-multiple trick as :func:`half_up_div`: subtract pmod so
    the decimal divide has no fractional part to round. Positive den."""
    a = num.cast(_DEC)
    b = den.cast(_DEC)
    return ((a - F.pmod(a, b)) / b).cast("bigint")
