"""Decimal-exact aggregation helpers.

Summing doubles is non-associative, so two engines (or two partitionings of
the same engine — which is exactly what changes on a 1000-executor cluster)
can disagree in the last ulps. For money-like columns that are really
fixed-point (prices, discounts, quantities), we cast to DECIMAL before
aggregating: integer arithmetic is exact and order-independent, so results
are bit-stable across engines, partition counts, and AQE re-plans. The final
value is cast back to DOUBLE for a compact output schema.

This mirrors how the reference sidesteps float trouble by never aggregating
at all (its only aggregate is COUNT — reference reader.py:181-206).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column, alias: str, precision: int = 12, scale: int = 2) -> Column:
    """Exact decimal sum, output as double."""
    return F.sum(dec(col, precision, scale)).cast("double").alias(alias)


def davg(col: Column, alias: str, precision: int = 12, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum ÷ count, in double.

    ``avg(double)`` directly would re-introduce order-dependence; this form
    performs exactly one double division on two order-independent values.
    """
    s = F.sum(dec(col, precision, scale)).cast("double")
    n = F.count(F.col(col) if isinstance(col, str) else col).cast("double")
    return (s / n).alias(alias)


def qfloor(col: Column, digits: int = 6) -> Column:
    """Tie-free quantization to ``digits`` decimals: floor(x·10^d)/10^d.

    ``round(x, d)`` diverges between engines when the exact rational value
    of x sits on a .5 tie at digit d+1 (Spark rounds the shortest decimal
    repr via BigDecimal HALF_UP; DuckDB rounds the binary double, which for
    non-dyadic ties is slightly below) — and means/rates over integer or
    cent-exact sums produce such ties whenever the divisor carries enough
    factors of two. floor of the identical IEEE double can never split:
    same input bits, same multiply, same floor. Use for any rounded value
    whose exact form is RATIONAL (sums/counts/rates); round() stays fine
    after irrational ops (sqrt, ln) where ties have measure zero.
    SQL twin: ``floor((x) * 1e6) / 1e6``.
    """
    scale = float(10**digits)
    return F.floor(col * scale) / F.lit(scale)
