"""Table profiling (ANALYZE-style column statistics) — the dataset-card
/ optimizer-statistics step: one pass over the table producing, per
profiled column, row count, null count, distinct count, and min/max.

Scale shape: a single global aggregate — every statistic has a
map-side partial (count, min, max), so the shuffle carries one partial
row per task, not data. The exception is exact ``count_distinct``:
Catalyst plans one Expand replica per distinct aggregate (k profiled
columns ⇒ k+1× map output), the standard exact-ANALYZE cost. For the
100 TB regime pass ``exact=False`` to swap in HLL-based
``approx_count_distinct`` (map-side sketch partials, Expand-free) —
same output schema, documented ±2% error, rows-only oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: dict[str, Column], exact: bool = True
) -> DataFrame:
    """One row per entry in ``cols`` (name → normalized expression):
    ``(col_name, n_rows, n_null, n_distinct, min_s, max_s)``.

    Callers pass normalization INTO the expression (e.g. cast doubles
    to ``decimal(18,2)``) so distinct/min/max are computed — and later
    string-rendered — in an engine-portable domain.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, expr in cols.items():
        nd = F.count_distinct(expr) if exact else F.approx_count_distinct(expr)
        aggs += [
            F.count(expr).alias(f"{name}__nn"),
            nd.alias(f"{name}__nd"),
            F.min(expr).cast("string").alias(f"{name}__min"),
            F.max(expr).cast("string").alias(f"{name}__max"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                (F.col("_n") - F.col(f"{name}__nn"))
                .cast("bigint")
                .alias("n_null"),
                F.col(f"{name}__nd").cast("bigint").alias("n_distinct"),
                F.col(f"{name}__min").alias("min_s"),
                F.col(f"{name}__max").alias("max_s"),
            )
            for name in cols
        ]
    )
    return row.select(
        F.col("_n").cast("bigint").alias("n_rows"), F.explode(entries).alias("e")
    ).select("e.col_name", "n_rows", "e.n_null", "e.n_distinct", "e.min_s", "e.max_s")
