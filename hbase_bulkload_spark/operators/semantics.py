"""Table-semantics operators (SURVEY.md §2.6 ops 18-20) — the behaviors
the reference encodes in its HBase DDL rather than in Java
(`create_table.rb:1`: `VERSIONS => 3`, `TTL => 7776000` (90 days),
families `c`/`h`):

- version retention: keep the newest N versions per cell;
- TTL expiry: drop cells older than a horizon;
- current-vs-history dual write: latest version → family 'c',
  superseded versions → family 'h' (the reference declares 'h' but
  never writes it — `BulkImporterFromText.java:47-48`; here the
  capability exists).

All are single-shuffle window plans on the version key; the TTL horizon
is resolved with a broadcast 1-row aggregate (no single-partition
window), so every operator scales linearly in the input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_VERSIONS = 3  # create_table.rb:1 VERSIONS => 3
DEFAULT_TTL_DAYS = 90  # create_table.rb:1 TTL => 7776000 s


def _version_window(key_cols: Sequence[str], ts_col: str, tiebreak: Sequence[str]):
    order = [F.desc(ts_col)] + [F.asc(c) for c in tiebreak]
    return Window.partitionBy(*key_cols).orderBy(*order)


def keep_latest_versions(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    n: int = DEFAULT_VERSIONS,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """VERSIONS => n: newest n rows per cell key (deterministic given a
    unique tiebreak)."""
    w = _version_window(key_cols, ts_col, tiebreak)
    return (
        df.withColumn("_v", F.row_number().over(w))
        .filter(F.col("_v") <= n)
        .withColumnRenamed("_v", "version")
    )


def ttl_filter(
    df: DataFrame,
    ts_col: str = "ts",
    days: int = DEFAULT_TTL_DAYS,
    now: Column | None = None,
) -> DataFrame:
    """TTL expiry: keep rows with ts within `days` of `now`.

    `now` defaults to the dataset's max timestamp, resolved via a
    broadcast 1-row aggregate (two scans, zero extra shuffles — safe at
    any scale; in Structured Streaming the same semantic is
    `withWatermark(ts, f'{days} days')`)."""
    if now is None:
        horizon = df.agg(F.max(ts_col).alias("_max_ts"))
        return (
            df.crossJoin(F.broadcast(horizon))
            .filter(F.col(ts_col) >= F.col("_max_ts") - F.expr(f"INTERVAL {days} DAYS"))
            .drop("_max_ts")
        )
    return df.filter(F.col(ts_col) >= now - F.expr(f"INTERVAL {days} DAYS"))


def kv_scan(
    cells: DataFrame,
    start_row: str | None = None,
    stop_row: str | None = None,
    qualifiers: Sequence[str] | None = None,
    min_ts: Column | None = None,
    max_ts: Column | None = None,
    max_versions: int | None = None,
    tiebreak: Sequence[str] = (),
    row_col: str = "rowkey",
    qual_col: str = "qualifier",
    ts_col: str = "ts",
) -> DataFrame:
    """An HBase client *Scan* over a KV cell frame — the reference
    table's primary read path (the DDL at `create_table.rb:1` exists to
    serve exactly these scans). Mirrors the Scan API surface:

    - ``start_row``/``stop_row``: rowkey range, inclusive/exclusive like
      `Scan.withStartRow/withStopRow` — on a sorted store this is a seek;
      here it is a pushable range predicate (parquet row-group pruning,
      and whole-bucket pruning when the store is hex-bucket partitioned);
    - ``qualifiers``: `Scan.addColumn` projection (IN-list predicate);
    - ``min_ts``/``max_ts``: `Scan.setTimeRange(min, max)` — [min, max),
      applied BEFORE version counting, exactly as HBase does;
    - ``max_versions``: `Scan.readVersions(n)` — newest n per cell *after*
      the timerange filter (HBase semantics: timeRange then versions).

    Every predicate is a scan-side filter (no shuffle); only the version
    window exchanges, on the uniformly distributed cell key. Output is
    region-scan-ordered within partitions (rowkey, qualifier, ts desc).
    """
    out = cells
    if start_row is not None:
        out = out.filter(F.col(row_col) >= start_row)
    if stop_row is not None:
        out = out.filter(F.col(row_col) < stop_row)
    if qualifiers is not None:
        out = out.filter(F.col(qual_col).isin(list(qualifiers)))
    if min_ts is not None:
        out = out.filter(F.col(ts_col) >= min_ts)
    if max_ts is not None:
        out = out.filter(F.col(ts_col) < max_ts)
    if max_versions is not None:
        out = keep_latest_versions(
            out, [row_col, qual_col], ts_col, n=max_versions, tiebreak=tiebreak
        )
    return out.sortWithinPartitions(row_col, qual_col, F.desc(ts_col))


def current_vs_history(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """SCD2-style family split: latest version per key → 'c' (current),
    all superseded versions → 'h' (history)."""
    w = _version_window(key_cols, ts_col, tiebreak)
    return df.withColumn(
        "family",
        F.when(F.row_number().over(w) == 1, F.lit("c")).otherwise(F.lit("h")),
    )
