"""Table profiling (ANALYZE-style column statistics) — the dataset-card
/ optimizer-statistics step: per profiled column, row count, null
count, distinct count, and min/max.

Scale shape (exact path): one ``groupBy(value)`` + global reduce PER
COLUMN. The map-side partial aggregation collapses every partition to
its per-column distinct values before any exchange, so shuffle volume
is Σ per-column cardinality — and each job's parquet scan prunes to
that single column. The obvious single-pass alternative (one agg with k
``count_distinct``s) makes Catalyst plan an Expand that duplicates
EVERY input row k+1× through one shuffle — measured 4.5× slower at
sf0.1 (11.4 s vs 2.5 s) and strictly worse at scale, where the Expand
output is k× the table while the per-column cardinalities are not.
``exact=False`` is the true single-pass form: HLL
``approx_count_distinct`` partials are ordinary (Expand-free)
aggregates, one scan total, rsd-bounded (±2%) on distincts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OUT = ("col_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")


def profile_table(
    df: DataFrame, cols: dict[str, Column], exact: bool = True
) -> DataFrame:
    """One row per entry in ``cols`` (name → normalized expression):
    ``(col_name, n_rows, n_null, n_distinct, min_s, max_s)``.

    Callers pass normalization INTO the expression (e.g. cast doubles
    to ``decimal(18,2)``) so distinct/min/max are computed — and later
    string-rendered — in an engine-portable domain.
    """
    if not exact:
        return _profile_single_pass(df, cols)
    parts = []
    for name, expr in cols.items():
        per = df.groupBy(expr.alias("_v")).agg(F.count(F.lit(1)).alias("_c"))
        parts.append(
            per.agg(
                F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("_v").isNull(), F.col("_c"))), F.lit(0)
                )
                .cast("bigint")
                .alias("n_null"),
                F.count("_v").cast("bigint").alias("n_distinct"),
                F.min("_v").cast("string").alias("min_s"),
                F.max("_v").cast("string").alias("max_s"),
            ).select(F.lit(name).alias("col_name"), *_OUT[1:])
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def _profile_single_pass(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Approx variant: one scan, one 1-row aggregate (all partials are
    plain map-side aggregates — no Expand), unpivoted to the report."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, expr in cols.items():
        aggs += [
            F.count(expr).alias(f"{name}__nn"),
            F.approx_count_distinct(expr, rsd=0.02).alias(f"{name}__nd"),
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
