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


def q_events_gapfill(spark, sf_dir) -> DataFrame:
    """Time-series gap fill (stream_ops.gapfill_resample): daily
    resample per user over each user's observed span, absent days
    densified with n_events = 0 and last-observation-carried-forward
    value — the continuous-aggregate read path of a time-series store."""
    return stream_ops.gapfill_resample(_events(spark, sf_dir))


def q_events_anomaly(spark, sf_dir) -> DataFrame:
    """Z-score anomaly detection over the event stream: flag events
    whose value deviates > 3σ from their event_type's mean. Mean and
    variance derive from DECIMAL-exact sum/sum-of-squares (one hash
    aggregate, order-independent → cross-engine deterministic, unlike a
    naive double STDDEV), broadcast back onto the scan. Map-only after
    one tiny aggregate — the streaming form maintains the same two sums
    as running state."""
    ev = _events(spark, sf_dir)
    vdec = F.col("value").cast("decimal(30,10)")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(vdec).alias("s1"),
        F.sum(vdec * vdec).alias("s2"),
    )
    # cast the EXACT decimal sums to double first, then do all division
    # in IEEE double with identical expression shape on both engines —
    # engine-specific decimal-division scale rules never engage
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    mean = s1d / F.col("n")
    var = (s2d - s1d * s1d / F.col("n")) / (F.col("n") - 1)
    enriched = ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        mean.alias("type_mean"),
        F.sqrt(var).alias("type_std"),
    )
    z = (F.col("value") - F.col("type_mean")) / F.col("type_std")
    return enriched.select(
        "event_id",
        "event_type",
        "value",
        F.round(z, 4).alias("zscore"),
    ).filter(F.abs(F.round(z, 4)) > 3)


def q_events_retention(spark, sf_dir) -> DataFrame:
    """Cohort retention — the standard event-analytics matrix: users
    cohorted by first-event week, retention = distinct active users per
    (cohort_week, week_offset). Two hash aggregations (per-user min, then
    the matrix) with the user→cohort frame joined back by its own key —
    one row per user, so AQE broadcasts it; the events side aggregates
    before anything wide happens."""
    ev = _events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("WEEK", F.min("ts")).alias("cohort_week")
    )
    joined = ev.join(first, "user_id").select(
        "user_id",
        "cohort_week",
        (
            F.datediff(F.date_trunc("WEEK", F.col("ts")), F.col("cohort_week")) / 7
        ).cast("int").alias("week_offset"),
    )
    return joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )


def q_events_funnel(spark, sf_dir) -> DataFrame:
    """Sequential-pattern funnel over the event stream: per user, the
    first view, the first click at-or-after that view, and the first
    purchase at-or-after that click — the classic ordered conversion
    funnel. Three per-user min aggregations chained by joins; each
    stage's frame is one row per user (≪ events), so the chaining joins
    broadcast under AQE and the only full-data work is three filtered
    scans' partial aggregations."""
    ev = _events(spark, sf_dir)

    def first_after(event_type: str, prev, prev_col: str, out_col: str):
        f = ev.filter(F.col("event_type") == event_type)
        if prev is not None:
            f = f.join(prev, "user_id").filter(F.col("ts") >= F.col(prev_col))
        return f.groupBy("user_id").agg(F.min("ts").alias(out_col))

    v = first_after("view", None, "", "t_view")
    c = first_after("click", v, "t_view", "t_click")
    p = first_after("purchase", c, "t_click", "t_purchase")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_purchase").isNotNull().alias("converted"),
        )
    )


QUERIES = {
    "q_stream_tumbling": q_stream_tumbling,
    "q_stream_sliding": q_stream_sliding,
    "q_stream_session": q_stream_session,
    "q_stream_dedup": q_stream_dedup,
    "q_stream_stateful": q_stream_stateful,
    "q_stream_join": q_stream_join,
    "q_events_funnel": q_events_funnel,
    "q_events_gapfill": q_events_gapfill,
    "q_events_retention": q_events_retention,
    "q_events_anomaly": q_events_anomaly,
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
    "q_events_funnel": f"""
        WITH {EV_CTE},
        v AS (
            SELECT user_id, MIN(ts) AS t_view FROM ev
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM ev e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts >= v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM ev e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
            GROUP BY e.user_id
        )
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
               p.t_purchase IS NOT NULL AS converted
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id
        LEFT JOIN p ON v.user_id = p.user_id
    """,
    "q_events_anomaly": f"""
        WITH {EV_CTE},
        stats AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS s1d,
                   CAST(SUM(CAST(value AS DECIMAL(30,10))
                            * CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS s2d
            FROM ev GROUP BY event_type
        ),
        enriched AS (
            SELECT e.event_id, e.event_type, e.value,
                   s.s1d / s.n AS type_mean,
                   sqrt((s.s2d - s.s1d * s.s1d / s.n) / (s.n - 1)) AS type_std
            FROM ev e JOIN stats s ON e.event_type = s.event_type
        )
        SELECT event_id, event_type, value,
               round((value - type_mean) / type_std, 4) AS zscore
        FROM enriched
        WHERE abs(round((value - type_mean) / type_std, 4)) > 3
    """,
    "q_events_retention": f"""
        WITH {EV_CTE},
        first AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
            FROM ev GROUP BY user_id
        ),
        j AS (
            SELECT e.user_id, f.cohort_week,
                   CAST(date_diff('day', f.cohort_week,
                                  date_trunc('week', e.ts)) / 7 AS INT)
                       AS week_offset
            FROM ev e JOIN first f ON e.user_id = f.user_id
        )
        SELECT cohort_week, week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM j GROUP BY 1, 2
    """,
    "q_events_gapfill": f"""
        WITH {EV_CTE},
        daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   {dsum_expr('value')} AS sum_value
            FROM ev GROUP BY 1, 2
        ),
        span AS (
            SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
            FROM daily GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span
        )
        SELECT g.user_id, g.day,
               COALESCE(d.n_events, 0) AS n_events,
               d.sum_value,
               LAST_VALUE(d.sum_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS UNBOUNDED PRECEDING) AS locf_value
        FROM grid g LEFT JOIN daily d
          ON g.user_id = d.user_id AND g.day = d.day
    """,
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
