"""Shared expression helpers enforcing SURVEY.md §5.3 hash-stability.

Money math goes through DECIMAL(18,2) *before* aggregation (double
sums are order-dependent across engines; decimal sums are exact), and
the final aggregate is cast back to DOUBLE so Spark and DuckDB
materialize bit-identical float64 values for the driver's value-hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def money(col: str | Column) -> Column:
    """Exact-decimal view of a 2-dp money column stored as double."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: str | Column, alias: str) -> Column:
    """Decimal-exact SUM materialized as double (hash-stable)."""
    return F.sum(money(col)).cast("double").alias(alias)


def revenue_expr() -> Column:
    """lineitem revenue: extendedprice * (1 - discount), decimal-exact.

    Mirrors the reference's money semantics (fact-table measures,
    ``/root/reference/sql/airlines.sql``) with TPC-H's canonical
    revenue formula.
    """
    one = F.lit(1).cast(MONEY)
    return money("l_extendedprice") * (one - money("l_discount"))


# SQL fragment equivalents (DuckDB oracle side).
SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)
