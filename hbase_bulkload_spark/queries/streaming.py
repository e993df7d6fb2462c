"""Streaming-semantics queries (SURVEY.md §2.12 ops 44-48), run in batch
mode so the DuckDB oracle applies; the identical transformations run
against readStream frames (see streaming/stream_ops.py and
tests/test_streaming.py).

Window-alignment notes for the oracles:
- Spark's F.window aligns to the epoch in slide-sized steps; the sliding
  oracle reproduces this with integer µs arithmetic (epoch_us // slide).
- Spark's session windows merge on touch: an event exactly `gap` after
  its predecessor EXTENDS the session (verified by
  tests/test_streaming.py::test_session_gap_boundary) → the
  gaps-and-islands oracle opens a new session only on `>` gap
  (SURVEY.md §7.4 item 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_bulkload_spark.datasets import table
from hbase_bulkload_spark.functions.numeric import dsum_expr
from hbase_bulkload_spark.queries.semantics import EV_CTE
from hbase_bulkload_spark.session import oracle_safe
from hbase_bulkload_spark.streaming import stream_ops


def _events(spark, sf_dir) -> DataFrame:
    return table(oracle_safe(spark), sf_dir, "events")


def q_stream_tumbling(spark, sf_dir) -> DataFrame:
    return stream_ops.tumbling_agg(_events(spark, sf_dir))


def q_stream_sliding(spark, sf_dir) -> DataFrame:
    return stream_ops.sliding_agg(_events(spark, sf_dir))


def q_stream_session(spark, sf_dir) -> DataFrame:
    return stream_ops.session_agg(_events(spark, sf_dir))


def q_stream_dedup(spark, sf_dir) -> DataFrame:
    return stream_ops.dedup_keys(_events(spark, sf_dir), ["user_id", "event_type"])


def q_stream_stateful(spark, sf_dir) -> DataFrame:
    """Op 48b: custom stateful operator (applyInPandasWithState on a
    stream — tests/test_streaming.py; this batch form is the identical
    semantics as one hash aggregate, which the oracle checks)."""
    return stream_ops.user_running_stats(_events(spark, sf_dir))


def q_stream_join(spark, sf_dir) -> DataFrame:
    """Op 48c: stream-stream interval join — each click matched to the
    same user's views in the preceding hour (batch form of the
    watermark-bounded streaming join; parity pinned by
    tests/test_streaming.py)."""
    ev = _events(spark, sf_dir)
    j = stream_ops.interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "view"),
        within="1 hour",
    )
    return j.select(
        "user_id",
        F.col("left_id").alias("click_id"),
        F.col("left_ts").alias("click_ts"),
        F.col("right_id").alias("view_id"),
        F.col("right_ts").alias("view_ts"),
    )


QUERIES = {
    "q_stream_tumbling": q_stream_tumbling,
    "q_stream_sliding": q_stream_sliding,
    "q_stream_session": q_stream_session,
    "q_stream_dedup": q_stream_dedup,
    "q_stream_stateful": q_stream_stateful,
    "q_stream_join": q_stream_join,
}

_SLIDE_US = 15 * 60 * 1_000_000  # 15 minutes
_WIN_PER_SLIDE = 4  # 1 hour / 15 minutes

ORACLES = {
    "q_stream_tumbling": f"""
        WITH {EV_CTE}
        SELECT date_trunc('hour', ts) AS window_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {dsum_expr('value')} AS sum_value
        FROM ev GROUP BY 1, 2, 3
    """,
    "q_stream_sliding": f"""
        WITH {EV_CTE}
        SELECT make_timestamp(
                   (epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US} - k.k * {_SLIDE_US}
               ) AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {dsum_expr('value')} AS sum_value
        FROM ev CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)) k(k)
        GROUP BY 1
    """,
    "q_stream_session": f"""
        WITH {EV_CTE},
        seq AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        isl AS (
            SELECT *, SUM(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM seq
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {dsum_expr('value')} AS sum_value
        FROM isl GROUP BY user_id, sid
    """,
    "q_stream_dedup": "SELECT DISTINCT user_id, event_type FROM events",
    "q_stream_join": f"""
        WITH {EV_CTE}
        SELECT c.user_id,
               c.event_id AS click_id, c.ts AS click_ts,
               v.event_id AS view_id, v.ts AS view_ts
        FROM ev c JOIN ev v
          ON v.user_id = c.user_id
         AND c.event_type = 'click' AND v.event_type = 'view'
         AND v.ts <= c.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
    "q_stream_stateful": """
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(round(value * 10000, 0) AS BIGINT)) AS DOUBLE)
                   / 10000 AS sum_value
        FROM events GROUP BY user_id
    """,
}
