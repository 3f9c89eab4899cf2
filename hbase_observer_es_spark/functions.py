"""Cross-engine-deterministic expression helpers.

The driver hash-compares Spark results against DuckDB (order-insensitive value hash),
so every floating aggregate must be bit-identical across engines. Double summation is
order-dependent and Spark's partition order is not DuckDB's, so:

* ``dsum``: cast each input to DECIMAL (exact, associative — order-independent), sum,
  cast the total back to DOUBLE. Both engines produce the same decimal, and
  decimal→double conversion is IEEE round-to-nearest in both.
* ``davg``: decimal sum cast to double FIRST, then a single double division by the
  count — one deterministic IEEE op, identical in DuckDB.

SQL twins (``sql_dsum`` / ``sql_davg``) emit the mirrored DuckDB expression; use them
when building ``oracle_sql()`` strings so the two sides can never drift.

Scale note: decimal aggregation stays inside whole-stage codegen with map-side partial
aggregation — the determinism costs no extra shuffle and survives 1000-executor plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits / chosen scale comfortably hold fixture magnitudes (prices < 1e6) even
# summed over 100 TB-scale row counts once widened by Spark's sum(decimal) -> +10 digits.
DEC = "decimal(18,{scale})"


def _as_col(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM over a double column, emitted as DOUBLE."""
    c = _as_col(col).cast(DEC.format(scale=scale))
    return F.sum(c).cast("double").alias(alias)


def davg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum → double, / count in double."""
    c = _as_col(col).cast(DEC.format(scale=scale))
    return (F.sum(c).cast("double") / F.count(F.lit(1))).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT(*) AS {alias}"
    )


def lsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Scaled-integer SUM: fast twin of ``dsum`` for bounded linear columns.

    Rounds each value to 10^scale units, sums as LONG, divides once in double.
    Spark's sum(decimal(18,s)) widens to precision 28 — past the compact
    long-backed representation, onto the BigDecimal slow path (~5× slower per
    aggregate, measured); a long sum stays in codegen.

    Bit-identical to dsum whenever the integer sum fits in 2^53: the long sum S
    is then exactly representable in double, and S/10^scale is one
    correctly-rounded division from the same exact rational the decimal path
    rounds in its decimal→double cast. Rounding to units is unambiguous because
    the inputs carry ≤scale dp (x·10^scale lands within float error of an
    integer, never near .5), so HALF_UP vs half-even cannot disagree.

    Use ONLY where max|col|·10^scale·rowcount < 9·10^15 at the TARGET scale
    (e.g. quantities/prices/rates at 100 TB row counts); products and
    wide-magnitude columns keep dsum's 128-bit decimal accumulator.
    """
    c = F.round(_as_col(col) * F.lit(10**scale)).cast("long")
    return (F.sum(c).cast("double") / F.lit(float(10**scale))).alias(alias)


def lavg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Scaled-integer AVG (see lsum): (long sum / 10^scale) / count, both
    divisions in double in this exact order — mirrored by sql_lavg."""
    c = F.round(_as_col(col) * F.lit(10**scale)).cast("long")
    return (
        (F.sum(c).cast("double") / F.lit(float(10**scale))) / F.count(F.lit(1))
    ).alias(alias)


def sql_lsum(expr: str, alias: str, scale: int = 2) -> str:
    u = 10**scale
    return (
        f"CAST(SUM(CAST(round(({expr}) * {u}) AS BIGINT)) AS DOUBLE) / {u}.0"
        f" AS {alias}"
    )


def sql_lavg(expr: str, alias: str, scale: int = 2) -> str:
    u = 10**scale
    return (
        f"(CAST(SUM(CAST(round(({expr}) * {u}) AS BIGINT)) AS DOUBLE) / {u}.0)"
        f" / COUNT(*) AS {alias}"
    )
