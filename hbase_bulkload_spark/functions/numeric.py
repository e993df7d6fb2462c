"""Cross-engine-deterministic numeric aggregation helpers.

Floating-point SUM/AVG depend on accumulation order, which differs
between Spark partitions and any oracle engine. These helpers aggregate
in exact DECIMAL space (order-independent) and cast the final value back
to DOUBLE, so a hash comparison against another engine is stable while
the public result type stays double.

At scale this costs one decimal accumulator per group — still
whole-stage-codegen'd, still map-side-partial-aggregated; the shuffle
shape is unchanged.

Oracle-side equivalent (DuckDB): ``CAST(SUM(CAST(x AS DECIMAL(18,4)))
AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-independent SUM of a double column (exact decimal interior)."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, then one double
    division (deterministic given identical operands)."""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias("avg")


def dsum_expr(expr_sql: str) -> str:
    """The DuckDB oracle-side rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr_sql}) AS DECIMAL(18,4))) AS DOUBLE)"


def davg_expr(expr_sql: str) -> str:
    """The DuckDB oracle-side rendering of :func:`davg`."""
    return f"(CAST(SUM(CAST(({expr_sql}) AS DECIMAL(18,4))) AS DOUBLE) / COUNT({expr_sql}))"
