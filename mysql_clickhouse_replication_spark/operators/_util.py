"""Shared helpers for oracle-deterministic operator results.

The driver's correctness gate is an order-insensitive VALUE-HASH of the
result vs a DuckDB oracle (BASELINE.json:2).  Doubles summed in different
partition orders differ in the last ulps, so every aggregate over the
DOUBLE fixture columns is computed over an exact DECIMAL cast in BOTH
engines and only converted to DOUBLE at the very end.  Decimal precision
is sized so Spark's and DuckDB's result-type rules both stay exact:

* base money/qty columns  -> DECIMAL(12,2)   (values < 10^10)
* rates (discount/tax <1) -> DECIMAL(4,2)
* one product step        -> precision grows ~+5/+13, scale +2 — two
  chained multiplies stay under precision 38 in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark-side decimal casts (exact: fixture doubles carry >=2-decimal values
# generated from 2-decimal domains; DuckDB applies the identical cast).
# Width policy: D12 for PLAIN SUM operands (sum precision 22 — headroom for
# trillions of rows); D8/D4 for PRODUCT operands — products stay at
# precision <= 18, Spark's compact (64-bit Long) decimal representation,
# ~2.5x faster than the Int128 path that DECIMAL(12,2) products take.
# Fixture domains: prices < 10^6 (fit D8), rates/quantities < 100 (fit D4).
D12 = "decimal(12,2)"
D8 = "decimal(8,2)"
D4 = "decimal(4,2)"


def dec(col: str | Column, typ: str = D12) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column, alias: str, typ: str = D12) -> Column:
    """Exact decimal SUM surfaced as DOUBLE (matches oracle pattern
    CAST(SUM(CAST(x AS DECIMAL(..))) AS DOUBLE))."""
    return F.sum(dec(col, typ)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, typ: str = D12) -> Column:
    """Exact decimal SUM / COUNT in double — deterministic because the
    operands (one exact decimal-as-double, one long) are identical in both
    engines; oracle: CAST(SUM(CAST(x AS DEC)) AS DOUBLE)/COUNT(x)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, typ)).cast("double") / F.count(c)).alias(alias)


# Oracle-side SQL fragments mirroring the helpers above.
def sql_dsum(expr: str, alias: str, typ: str = "DECIMAL(12,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, typ: str = "DECIMAL(12,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT({expr}) AS {alias}"
