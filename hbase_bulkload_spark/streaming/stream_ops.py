"""Structured-Streaming surface (SURVEY.md §2.12 ops 44-48).

Each transformation is written once against a plain DataFrame, so the
same function serves a batch frame (oracle-checkable; how the driver
verifies it) and a `readStream` frame (how it deploys: readStream →
transform → writeStream, watermarks bounding state). The reference is
batch-only MapReduce; this is the engine's streaming extension.

tests/test_streaming.py runs these through a real file-source
readStream → memory-sink writeStream with `availableNow` and asserts
stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_bulkload_spark.functions.numeric import dsum


def tumbling_agg(df: DataFrame, ts_col: str = "ts", width: str = "1 hour") -> DataFrame:
    """Op 44: tumbling event-time window per event_type."""
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Op 45: sliding (hopping) event-time window; each event lands in
    width/slide overlapping windows."""
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_agg(
    df: DataFrame, key: str = "user_id", ts_col: str = "ts", gap: str = "30 minutes"
) -> DataFrame:
    """Op 46: gap-based session window per key (session start = first
    event; an event exactly `gap` after its predecessor opens a NEW
    session — boundary pinned by tests and the gaps-and-islands oracle)."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def dedup_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Op 48: stateful dedup. Output is the distinct key set — the part
    of dropDuplicates that is deterministic regardless of which physical
    row survives (in streaming, state is bounded by a prior watermark)."""
    return df.dropDuplicates(keys).select(*keys)


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "90 days") -> DataFrame:
    """Op 47: late-data bound — the streaming analog of the TTL filter
    (`create_table.rb:1` TTL => 90 days). No-op on batch frames."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df
