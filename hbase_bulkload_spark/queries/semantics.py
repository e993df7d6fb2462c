"""Table-semantics queries (SURVEY.md §2.6 ops 18-20) over the events
stream table, treating (user_id, event_type) as the cell key and
event_id as the deterministic tiebreak.

All event-time oracles read through EV_CTE, which truncates DuckDB's
TIMESTAMP_NS to microseconds — the same truncation datasets._read_events
applies on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hbase_bulkload_spark.datasets import table
from hbase_bulkload_spark.operators.semantics import (
    current_vs_history,
    keep_latest_versions,
    kv_scan,
    ttl_filter,
)
from hbase_bulkload_spark.session import oracle_safe

EV_CTE = """
ev AS (
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
    FROM events
)
"""

CELL_KEY = ["user_id", "event_type"]

# The fixture spans ~30 days, so the reference's 90-day TTL
# (create_table.rb:1) would be a no-op; the operator is parameterized and
# exercised at 7 days.
TTL_DAYS = 7


def q_versions_top3(spark, sf_dir) -> DataFrame:
    """Op 18: VERSIONS => 3 retention (create_table.rb:1) as a ranking
    window over the cell key."""
    ev = table(oracle_safe(spark), sf_dir, "events")
    kept = keep_latest_versions(ev, CELL_KEY, "ts", n=3, tiebreak=["event_id"])
    return kept.select("user_id", "event_type", "event_id", "ts", "version")


def q_ttl_filter(spark, sf_dir) -> DataFrame:
    """Op 19 (+ op 47's batch analog): TTL expiry relative to the
    dataset horizon, resolved via a broadcast 1-row max — in streaming
    this is withWatermark (stream_ops.with_watermark)."""
    ev = table(oracle_safe(spark), sf_dir, "events")
    return ttl_filter(ev, "ts", days=TTL_DAYS).select("event_id", "ts", "user_id")


def q_current_vs_history(spark, sf_dir) -> DataFrame:
    """Op 20: current ('c') vs history ('h') family split — the
    capability the reference declares but never writes
    (BulkImporterFromText.java:47-48)."""
    ev = table(oracle_safe(spark), sf_dir, "events")
    split = current_vs_history(ev, CELL_KEY, "ts", tiebreak=["event_id"])
    return split.select("user_id", "event_type", "event_id", "family")


def q_compaction(spark, sf_dir) -> DataFrame:
    """Ops 18+19+20 composed — an HBase *major compaction* as one plan:
    events as KV cells (rowkey = md5(user_id), qualifier = event_type)
    → TTL expiry → keep newest 3 versions → current/history family
    split → bucket + region-aligned sort. The file rewrite an HBase
    region server does in-place is here a declarative pipeline whose
    one shuffle is the version window's."""
    from hbase_bulkload_spark.functions.keys import hex_bucket

    ev = table(oracle_safe(spark), sf_dir, "events")
    cells = ev.select(
        F.md5(F.col("user_id").cast("string")).alias("rowkey"),
        F.col("event_type").alias("qualifier"),
        "ts",
        "event_id",
        "value",
    )
    live = ttl_filter(cells, "ts", days=TTL_DAYS)
    kept = keep_latest_versions(
        live, ["rowkey", "qualifier"], "ts", n=3, tiebreak=["event_id"]
    )
    out = kept.select(
        "rowkey",
        F.when(F.col("version") == 1, F.lit("c")).otherwise(F.lit("h")).alias("family"),
        "qualifier",
        "ts",
        "event_id",
        "version",
        "value",
        hex_bucket(F.col("rowkey")).alias("bucket"),
    )
    return out.repartition("bucket").sortWithinPartitions(
        "bucket", "rowkey", "qualifier", "version"
    )


# q_kv_scan parameters: a quarter of the hex keyspace, two qualifiers,
# a two-week time window ending one week before the horizon, 2 versions.
SCAN_START, SCAN_STOP = "2", "6"
SCAN_QUALS = ("click", "view")
SCAN_LO_DAYS, SCAN_HI_DAYS = 21, 7
SCAN_VERSIONS = 2


def q_kv_scan(spark, sf_dir) -> DataFrame:
    """HBase client Scan over the cell store (operators.semantics.kv_scan):
    rowkey range ['2','6') + qualifier set + setTimeRange + readVersions(2).
    The timerange bounds are dataset-relative (broadcast 1-row max-ts
    aggregate, like the TTL horizon) so the query is deterministic at any
    scale factor. Filters all run scan-side; the only exchange is the
    version window's, on the uniform (rowkey, qualifier) cell key."""
    ev = table(oracle_safe(spark), sf_dir, "events")
    cells = ev.select(
        F.md5(F.col("user_id").cast("string")).alias("rowkey"),
        F.col("event_type").alias("qualifier"),
        "ts",
        "event_id",
        "value",
    )
    bounds = cells.agg(
        (F.max("ts") - F.expr(f"INTERVAL {SCAN_LO_DAYS} DAYS")).alias("_t0"),
        (F.max("ts") - F.expr(f"INTERVAL {SCAN_HI_DAYS} DAYS")).alias("_t1"),
    )
    scanned = kv_scan(
        cells.crossJoin(F.broadcast(bounds)),
        start_row=SCAN_START,
        stop_row=SCAN_STOP,
        qualifiers=SCAN_QUALS,
        min_ts=F.col("_t0"),
        max_ts=F.col("_t1"),
        max_versions=SCAN_VERSIONS,
        tiebreak=["event_id"],
    )
    return scanned.select("rowkey", "qualifier", "ts", "event_id", "value", "version")


QUERIES = {
    "q_versions_top3": q_versions_top3,
    "q_kv_scan": q_kv_scan,
    "q_ttl_filter": q_ttl_filter,
    "q_current_vs_history": q_current_vs_history,
    "q_compaction": q_compaction,
}

ORACLES = {
    "q_kv_scan": f"""
        WITH {EV_CTE},
        cells AS (
            SELECT md5(CAST(user_id AS VARCHAR)) AS rowkey,
                   event_type AS qualifier, ts, event_id, value
            FROM ev
        ),
        bounds AS (
            SELECT MAX(ts) - INTERVAL {SCAN_LO_DAYS} DAY AS t0,
                   MAX(ts) - INTERVAL {SCAN_HI_DAYS} DAY AS t1
            FROM cells
        ),
        scanned AS (
            SELECT c.* FROM cells c, bounds b
            WHERE c.rowkey >= '{SCAN_START}' AND c.rowkey < '{SCAN_STOP}'
              AND c.qualifier IN ('click', 'view')
              AND c.ts >= b.t0 AND c.ts < b.t1
        )
        SELECT rowkey, qualifier, ts, event_id, value, CAST(rn AS INT) AS version
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY rowkey, qualifier
                ORDER BY ts DESC, event_id ASC) AS rn
            FROM scanned
        ) WHERE rn <= {SCAN_VERSIONS}
    """,
    "q_versions_top3": f"""
        WITH {EV_CTE}
        SELECT user_id, event_type, event_id, ts, CAST(rn AS INT) AS version FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id ASC) AS rn
            FROM ev
        ) WHERE rn <= 3
    """,
    "q_ttl_filter": f"""
        WITH {EV_CTE}
        SELECT event_id, ts, user_id FROM ev
        WHERE ts >= (SELECT MAX(ts) FROM ev) - INTERVAL {TTL_DAYS} DAY
    """,
    "q_current_vs_history": f"""
        WITH {EV_CTE}
        SELECT user_id, event_type, event_id,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts DESC, event_id ASC) = 1
                    THEN 'c' ELSE 'h' END AS family
        FROM ev
    """,
    "q_compaction": f"""
        WITH {EV_CTE},
        cells AS (
            SELECT md5(CAST(user_id AS VARCHAR)) AS rowkey,
                   event_type AS qualifier, ts, event_id, value
            FROM ev
        ),
        live AS (
            SELECT * FROM cells
            WHERE ts >= (SELECT MAX(ts) FROM cells) - INTERVAL {TTL_DAYS} DAY
        ),
        vers AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY rowkey, qualifier
                ORDER BY ts DESC, event_id ASC) AS rn
            FROM live
        )
        SELECT rowkey,
               CASE WHEN rn = 1 THEN 'c' ELSE 'h' END AS family,
               qualifier, ts, event_id, CAST(rn AS INT) AS version, value,
               substr(rowkey, 1, 1) AS bucket
        FROM vers WHERE rn <= 3
    """,
}
