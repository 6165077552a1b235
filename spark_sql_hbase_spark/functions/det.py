"""Deterministic (order-independent) aggregate helpers.

Floating-point sums are order-dependent; Spark's shuffle order differs run
to run and from any single-threaded oracle. Every "money" aggregate in this
engine therefore sums **exactly** by casting each per-row double to
``DECIMAL(38,6)`` first (the per-row cast is deterministic; the decimal sum
is exact and associative), then rounds and casts back to double for a
stable, engine-independent result.

The same shape must be used in oracle SQL, e.g.::

    CAST(ROUND(SUM(CAST(expr AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue

At 100 TB this costs one widening per row (JVM-side, codegen'd) and keeps
partial aggregation (map-side combine) fully effective — decimal sum is
still a commutative partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(expr: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact sum of a double expression, rounded, as double."""
    col = F.expr(expr) if isinstance(expr, str) else expr
    return F.round(F.sum(col.cast(DEC)), scale).cast("double").alias(alias)


def davg(expr: Column | str, alias: str, scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum / count, in double space."""
    col = F.expr(expr) if isinstance(expr, str) else expr
    return F.round(F.sum(col.cast(DEC)).cast("double") / F.count(col), scale).cast(
        "double"
    ).alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 2) -> str:
    """Oracle-side (ANSI SQL / DuckDB) rendering of :func:`dsum`."""
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(38,6))), {scale}) AS DOUBLE) AS {alias}"


def davg_sql(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}), {scale}) AS DOUBLE) AS {alias}"
    )
