"""Bit-deterministic numeric helpers for oracle-comparable aggregates.

Cross-engine float comparison policy (learned the hard way — Spark and
DuckDB round doubles differently at decimal midpoints, and money data lands
on midpoints constantly):

- **Per-row arithmetic** (+,-,*,/ on the same doubles) is IEEE-deterministic
  → emit raw, never round.
- **Aggregated sums** are order-dependent in floating point (Spark partials
  combine in nondeterministic order) → compute in exact DECIMAL, cast the
  final result to DOUBLE. Exact decimal totals are equal regardless of
  order, and decimal→double conversion is correctly rounded in both
  engines.
- **Averages** = CAST(decimal_sum AS DOUBLE) / count — one IEEE division of
  identical operands.

Precisions are chosen so no intermediate exceeds DECIMAL(38, s) in either
engine (Spark reduces precision lossily past 38 — a silent divergence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: str | Column) -> Column:
    """Money/quantity column as exact DECIMAL(12,2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def rate(expr: str) -> Column:
    """Small factor like (1 - l_discount) as DECIMAL(4,2) (SQL expr in)."""
    return F.expr(expr).cast("decimal(4,2)")


def dsum(col_expr: Column) -> Column:
    """Exact decimal sum emitted as double."""
    return F.sum(col_expr).cast("double")


def davg(col_expr: Column) -> Column:
    """Exact-sum average emitted as double (sum::double / count)."""
    return F.sum(col_expr).cast("double") / F.count(F.lit(1))


# DuckDB spellings of the same operations.
def sql_dec2(col: str) -> str:
    return f"CAST({col} AS DECIMAL(12,2))"


def sql_rate(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(4,2))"


def sql_dsum(inner: str) -> str:
    return f"CAST(sum({inner}) AS DOUBLE)"


def sql_davg(inner: str) -> str:
    return f"CAST(sum({inner}) AS DOUBLE) / count(*)"
