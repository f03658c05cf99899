"""Deterministic numeric aggregation helpers.

Double-precision SUM is order-dependent; on a 1000-executor cluster the
reduction order is nondeterministic, so two runs (or Spark vs the DuckDB
oracle) can differ in the last ulps. For every money/measure aggregate we
therefore sum EXACTLY in decimal (inputs in this corpus have <= 2 decimal
digits; products of two 2-dp values have <= 4) and cast the final result to
double. Exact sum -> deterministic double, independent of partitioning,
AQE re-plans, and engine.

This costs a little over native double sum but keeps whole-stage codegen
(decimal arithmetic is JVM-side, no UDFs) and buys run-to-run reproducibility
at any scale. The same expressions are mirrored in the oracle SQL strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: decimal(18, s) holds +/-9.99e(17-s) — cents-exact up to ~1e13 rows of
#: 1e4-magnitude values, enough for 100 TB fact tables; Spark widens the
#: accumulator to decimal(28+, s) during SUM so overflow is not a concern.
_PREC = 18


def dec(col: Column | str, scale: int = 2) -> Column:
    """Decimal-exact cast with a NON-FINITE ABORT guard.

    Spark casts NaN/±Inf to decimal as NULL even under ANSI (checked on
    4.1: only genuine overflow aborts), so one NaN-poisoned measure row
    would SILENTLY drop value mass from every decimal-exact sum — the
    exact failure the decimal-overflow posture (SURVEY: abort, don't
    NULL value mass) forbids. DuckDB's CAST aborts on non-finite input,
    so this guard also keeps the two engines' contracts identical.
    NULL passes through (absent ≠ poisoned); the branch is two codegen
    comparisons per value — measured noise-level on the hot aggregates.
    """
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast("double")
    bad = F.isnan(d) | (F.abs(d) == F.lit(float("inf")))
    return F.when(
        c.isNull() | ~bad, c.cast(f"decimal({_PREC},{scale})")
    ).otherwise(
        F.raise_error(
            F.lit("non-finite value in decimal-exact measure")
        )
    )


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum, surfaced as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum / exact count, in double.

    IEEE-754 double division of identical operands is deterministic across
    engines, unlike AVG() whose internal accumulation order varies.

    nullif guard: a group whose measure is entirely NULL has COUNT(c)=0 —
    ANSI Spark would throw DIVIDE_BY_ZERO there while DuckDB's x/0 is
    NULL; dividing by NULL instead yields the oracle's NULL average.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.nullif(
        F.count(c), F.lit(0)
    )


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB-side mirror of dsum()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )


# Shared-SQL boundary note (r07): queries whose Spark arm executes the
# SAME SQL text as the oracle (sql_* battery) cast via the engine's bare
# CAST — there Spark's NaN→NULL lenience cannot be intercepted without
# forking the shared text (Spark spells abort `raise_error()`, DuckDB
# `error()`). The python-built plans all route through dec() and abort;
# for the shared-text battery the finite-input contract is enforced by
# the oracle arm (DuckDB aborts), and the boundary is documented in
# SURVEY §robustness.
