"""Ingest-surface queries (SURVEY.md §2.1-§2.6 ops 1-17): scans, arity /
null filters, key derivation, KV unpivot, range partitioning, and the
flagship bulk-load pipeline.

Every query's DuckDB oracle reconstructs the same deterministic record
frame (`sources.records.wide9`) relationally from the `lineitem` view, so
scan round-trips and key derivations are checked value-for-value.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_spark.functions.keys import (
    composite_rowkey,
    md5_hex,
    mod_bucket,
    reverse_key,
    salted_key,
    zvalue,
)
from hbase_bulkload_spark.operators.bulkload import (
    bulkload_kv,
    bulkload_pipeline,
    region_align,
)
from hbase_bulkload_spark.operators.kv import pivot_wide, unpivot_kv
from hbase_bulkload_spark.session import oracle_safe
from hbase_bulkload_spark.sources import records
from hbase_bulkload_spark.sources.records import RECORD_COLS

KEY_COLS = RECORD_COLS[:4]  # fields 0..3 → composite key, BulkImporterFromText.java:58-59

# ---------------------------------------------------------------------------
# Shared DuckDB oracle fragments. WIDE9_CTE must mirror sources.records.wide9
# exactly (same casts, same injection predicates).
# ---------------------------------------------------------------------------

WIDE9_CTE = """
wide9 AS (
    SELECT
        CAST(l_orderkey AS VARCHAR)   AS z0,
        CAST(l_partkey AS VARCHAR)    AS z1,
        CAST(l_suppkey AS VARCHAR)    AS z2,
        CAST(l_linenumber AS VARCHAR) AS z3,
        l_returnflag                  AS z4,
        l_linestatus                  AS z5,
        strftime(l_shipdate, '%Y-%m-%d') AS z6,
        CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS z7,
        CASE WHEN l_orderkey % 53 = 0 THEN NULL
             ELSE CAST(l_suppkey AS VARCHAR) END    AS z8,
        l_orderkey AS _seq
    FROM lineitem
)
"""

ROWKEY_SQL = "md5(z0) || md5(z1) || md5(z2) || md5(z3)"

KV_CTE = f"""
keyed AS (
    SELECT {ROWKEY_SQL} AS rowkey, * FROM wide9
),
kv AS (
    SELECT rowkey, 'c' AS family, qualifier, value FROM (
        SELECT rowkey, 'z0' AS qualifier, z0 AS value FROM keyed
        UNION ALL SELECT rowkey, 'z1', z1 FROM keyed
        UNION ALL SELECT rowkey, 'z2', z2 FROM keyed
        UNION ALL SELECT rowkey, 'z3', z3 FROM keyed
        UNION ALL SELECT rowkey, 'z4', z4 FROM keyed
        UNION ALL SELECT rowkey, 'z5', z5 FROM keyed
        UNION ALL SELECT rowkey, 'z6', z6 FROM keyed
        UNION ALL SELECT rowkey, 'z7', z7 FROM keyed
        UNION ALL SELECT rowkey, 'z8', z8 FROM keyed
    ) WHERE value IS NOT NULL
)
"""


# ---------------------------------------------------------------------------
# Query builders
# ---------------------------------------------------------------------------

def q_scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    oracle_safe(spark)
    return records.scan_text(spark, sf_dir)


def q_parse_delimited(spark: SparkSession, sf_dir: str) -> DataFrame:
    oracle_safe(spark)
    return records.parse_delimited(spark, sf_dir)


def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    oracle_safe(spark)
    return records.scan_csv(spark, sf_dir)


def q_scan_columnar(spark: SparkSession, sf_dir: str) -> DataFrame:
    oracle_safe(spark)
    return records.scan_columnar(spark, sf_dir)


def q_scan_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 5: Avro OCF scan. Full-oracle (not rows-only): the fixture is
    derived deterministically from lineitem, so DuckDB reproduces it
    relationally without reading Avro — nulls survive (unlike the text
    fixture, where concat_ws drops them)."""
    oracle_safe(spark)
    return records.scan_avro(spark, sf_dir)


def q_scan_rcfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 4, true wire format: RCFile row-group scan through the
    pure-Python layout codec (`RCFileMapReduceInputFormat`,
    BulkImporterFromRC.java:94-95). Same full oracle as the other scans:
    the fixture derives from lineitem, so DuckDB reproduces it
    relationally without reading RCFile."""
    oracle_safe(spark)
    return records.scan_rcfile(spark, sf_dir)


def q_scan_avro_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 5b: the Avro OCF scan through the registered Spark Python
    DataSource (`spark.read.format("avro_ocf")`) — the same codec as
    q_scan_avro, but Catalyst-planned: header-inferred schema,
    sync-anchored byte-range partitions, Arrow-batch reads. Same full
    oracle, so the DataSource read path is value-checked end to end."""
    from hbase_bulkload_spark.sources.format_datasources import register

    oracle_safe(spark)
    register(spark)
    path = records.avro_path(spark, sf_dir)
    return spark.read.format("avro_ocf").load(path).select(*RECORD_COLS)


def q_scan_rcfile_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 4b: the RCFile scan through the registered Spark Python
    DataSource (`spark.read.format("rcfile")`, names via option) —
    same codec and oracle as q_scan_rcfile."""
    from hbase_bulkload_spark.sources.format_datasources import register

    oracle_safe(spark)
    register(spark)
    path = records.rcfile_path(spark, sf_dir)
    return (
        spark.read.format("rcfile")
        .option("names", ",".join(RECORD_COLS))
        .load(path)
        .select(*RECORD_COLS)
    )


def q_scan_hfile_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 7b read side as a FULL-ORACLE query (round 8 — previously
    pinned only by tests/test_hfile_datasource.py): the bulk-loaded
    HFile base table (fixture-cached, `_hfile_artifacts`) scanned
    through the registered `spark.read.format("hfile")` DataSource with
    a rowkey-prefix predicate. `pushFilters` harvests the prefix into
    [start, stop) block fences, so only bucket-'4' blocks are decoded —
    the HFile-tier analog of parquet partition pruning — and
    `.option("columns", ...)` prunes family/ts decode per cell. The
    oracle recomputes the same cells relationally, so a green row
    certifies DataSource planning, fence pruning, column pruning, and
    cell decode value-for-value (the reader the reference's loaded
    table serves, BulkImporterFromText.java:129-130)."""
    from hbase_bulkload_spark.sources.hfile_datasource import register

    oracle_safe(spark)
    table_dir, _ = _hfile_artifacts(spark, sf_dir)
    register(spark)
    return (
        spark.read.format("hfile")
        .option("columns", "qualifier,value")
        .load(table_dir)
        .filter(F.col("rowkey").startswith("4"))
        .select("rowkey", "qualifier", "value")
    )


def q_filter_arity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 10: emit iff exactly COLUMN_COUNT fields; the skipped branch is
    counted rather than println'd (BulkImporterFromText.java:56,68-70)."""
    oracle_safe(spark)
    lines = records.scan_text(spark, sf_dir)
    return (
        lines.select((F.size(F.split("value", records.SOH)) == records.COLUMN_COUNT).alias("is_valid"))
        .groupBy("is_valid")
        .agg(F.count("*").alias("cnt"))
    )


def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 11: per-field null suppression (BulkImporterFromAvro.java:65-66),
    reported as per-qualifier cell / null counts.

    Aggregate-pushdown form: per-qualifier counts over the exploded KV
    frame are exactly per-column counts over the wide frame, so one
    18-aggregate pass + a 9-row unpivot replaces the 9x Expand."""
    oracle_safe(spark)
    w = records.wide9(spark, sf_dir, floor=False)
    aggs = []
    for c in RECORD_COLS:
        aggs.append(F.count("*").alias(f"c_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_{c}")
        )
    one = w.agg(*aggs)
    stacked = ", ".join(f"'{c}', c_{c}, n_{c}" for c in RECORD_COLS)
    return one.selectExpr(
        f"stack({len(RECORD_COLS)}, {stacked}) AS (qualifier, n_cells, n_null)"
    )


def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 12: positional key projection, fields 0-3 (the RC variant's
    field-20 OOB is a documented deviation, SURVEY.md §2.2 note)."""
    oracle_safe(spark)
    return records.wide9(spark, sf_dir, floor=False).select(*KEY_COLS)


def q_rowkey_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    oracle_safe(spark)
    w = records.wide9(spark, sf_dir, floor=False)
    return w.select("z0", md5_hex("z0").alias("k0"))


def q_rowkey_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    oracle_safe(spark)
    w = records.wide9(spark, sf_dir)
    return w.select(*KEY_COLS, composite_rowkey(*KEY_COLS).alias("rowkey"))


def q_key_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    oracle_safe(spark)
    w = records.wide9(spark, sf_dir, floor=False)
    return w.select("z0", reverse_key("z0").alias("rk"))


def q_salt_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 13d: the reference's disabled salt (RowKeyConverter.java:20-25),
    enabled: pmod bucket + left-padded salted key."""
    oracle_safe(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bucket = mod_bucket("l_orderkey")
    return li.select(
        "l_orderkey",
        bucket.alias("bucket"),
        salted_key(bucket, F.col("l_orderkey").cast("string")).alias("salted"),
    )


def q_unpivot_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    oracle_safe(spark)
    w = records.wide9(spark, sf_dir)
    return unpivot_kv(w, composite_rowkey(*KEY_COLS), RECORD_COLS)


def q_validate_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 10b: declarative data-quality rule summary (the dbt-test /
    expectations pattern, generalizing the reference's arity gate +
    skip-log): one pass over the record frame, one conditional count per
    rule — null keys, malformed date, out-of-domain flag, non-numeric
    quantity. Map-side partial aggregation; the result is rule-count
    sized."""
    oracle_safe(spark)
    w = records.wide9(spark, sf_dir, floor=False)
    rules = {
        "null_key_field": F.col("z0").isNull()
        | F.col("z1").isNull()
        | F.col("z2").isNull()
        | F.col("z3").isNull(),
        "null_z8": F.col("z8").isNull(),
        "bad_date_z6": ~F.col("z6").rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
        "bad_flag_z4": ~F.col("z4").isin("A", "N", "R"),
        "nonnumeric_z7": ~F.col("z7").rlike("^[0-9]+$"),
    }
    return w.agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in rules.items()
        ],
    )


def q_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 59b: deterministic per-group k-sample — keep each language's 20
    smallest-md5 documents (rank over md5(doc_id), a pure function of the
    key: re-runs and other engines pick the identical subset, unlike RNG
    sampling). One window shuffle on the group key; the balanced-subset
    builder for per-language corpus audits."""
    from pyspark.sql import Window

    oracle_safe(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id", "rk")
    )


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 15b: Z-order (Morton) clustering key over two dimensions
    (functions.keys.zvalue, 32-bit lanes so wide keys never wrap) —
    bit-interleaved (l_partkey, l_suppkey) plus a coarse curve-prefix
    bucket (zval >> 28). Range-partitioning and sorting
    by this one key co-locates rows close in BOTH dimensions, so parquet
    min/max stats prune 2-D range predicates (the multi-dim data-skipping
    layout; skipping effectiveness is pinned by tests/test_zorder.py).
    Pure codegen'd expressions — the layout key costs nothing at scan."""
    oracle_safe(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    z = zvalue("l_partkey", "l_suppkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        z.alias("zval"),
        F.shiftright(z, 28).cast("int").alias("zbucket"),
    )


#: Matched-keyset rows above which q_kv_index_lookup stops forcing a
#: broadcast and lets AQE plan the semi-join from observed sizes — the
#: same gated-hint contract as minhash_lsh_pairs' broadcast_pairs_limit
#: (an unconditional hint on an unselective predicate is a forced
#: driver/executor OOM at 100 TB, not a plan improvement).
INDEX_BROADCAST_LIMIT = 1_000_000


def q_kv_index_lookup(
    spark: SparkSession,
    sf_dir: str,
    *,
    predicate=None,
    broadcast_limit: int = INDEX_BROADCAST_LIMIT,
) -> DataFrame:
    """Op 24d: secondary-index point lookup on the KV store (the
    Phoenix-style global index pattern over an HBase-shaped table). The
    index is the (value → rowkey) projection of one qualifier's cells —
    benchmark-selective, so the matched keyset broadcasts into a
    semi-join against the main cell table and the base scan is never
    shuffled. The hint is SIZE-GATED, not hardcoded: the keyset is
    materialized (localCheckpoint) and counted once, and past
    ``broadcast_limit`` the hint
    is omitted so an unselective predicate degrades to an AQE-planned
    shuffle semi-join instead of forcing an unbounded broadcast
    (tests/test_plans.py asserts both regimes). At scale the index is
    itself a persisted sorted table (the same bulkload contract, keyed
    by value), turning this into an index seek + multi-get instead of
    a table scan."""
    oracle_safe(spark)
    w = records.wide9(spark, sf_dir)
    kv = unpivot_kv(w, composite_rowkey(*KEY_COLS), RECORD_COLS)
    # index-side pushdown through the unpivot: a z8 cell with value '42'
    # exists iff the wide row has z8 = '42', so the matched keyset is a
    # filtered scan of the wide frame — the index side never pays the 9x
    # Expand or the full-corpus key derivation (same rewrite as
    # _bucket_stats_frame)
    index = w.filter(
        predicate if predicate is not None else (F.col("z8") == "42")
    ).select(composite_rowkey(*KEY_COLS).alias("rowkey"))
    # materialize before the gate count so the join side reuses the
    # scan instead of re-filtering the corpus. localCheckpoint, not
    # persist: the keyset is ephemeral per call and persist() would pin
    # a CacheManager entry until explicit unpersist — checkpoint blocks
    # free when the frame is GC'd.
    index = index.localCheckpoint(eager=True)
    keyset = F.broadcast(index) if index.count() <= broadcast_limit else index
    return kv.join(keyset, "rowkey", "left_semi").select(
        "rowkey", "qualifier", "value"
    )


def _bucket_stats_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-pushdown-through-unpivot: every KV cell inherits its
    row's (rowkey, bucket), and a row contributes exactly its non-null
    field count in cells — so per-bucket cell counts, distinct keys, and
    key ranges are all computable on the wide frame, never materializing
    the 9× Expand. The same algebraic rewrite an optimizer would apply;
    the oracle still checks against the fully-exploded KV relation."""
    from hbase_bulkload_spark.functions.keys import hex_bucket

    w = records.wide9(spark, sf_dir)
    rowkey = composite_rowkey(*KEY_COLS)
    n_cells_per_row = sum(
        F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in RECORD_COLS
    )
    return w.select(
        rowkey.alias("rowkey"), n_cells_per_row.cast("long").alias("nc")
    ).withColumn("bucket", hex_bucket(F.col("rowkey")))


def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 14 inverse: long KV frame back to one wide row per key (pinned
    qualifier list, so the plan is one shuffle — operators.kv.pivot_wide).
    Composite keys are unique per lineitem row, so the round trip is
    exact for non-null cells (null z8 cells were suppressed → null).

    Variant choice is measured, not argued: tools/bench_pivot.py at
    sf0.1 (3-run median, with the scan parallelism floor) — default
    single-hop scatter pivot 2.34 s vs map-side partial pivot 2.55 s,
    so default stays (pre-floor the gap was 4.97 s vs 11.05 s — the
    partial variant's extra Arrow hop was serialized on the 1-task
    scan). The partial variant shuffles ~9× fewer (but wider) rows; on
    local[32] the exchange never crosses a network, so its extra pandas
    merge pass is still pure overhead — re-measure on a real cluster
    before switching."""
    oracle_safe(spark)
    w = records.wide9(spark, sf_dir)
    kv = unpivot_kv(w, composite_rowkey(*KEY_COLS), RECORD_COLS)
    return pivot_wide(kv, RECORD_COLS)


def q_range_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 15: deterministic bucket assignment (first hex char, 16-way)."""
    oracle_safe(spark)
    # two-level agg instead of countDistinct: a mixed distinct/plain agg
    # makes Catalyst Expand-duplicate every row; collapsing to distinct
    # (bucket, rowkey) first keeps one partial-agg pass + tiny final agg
    per_key = (
        _bucket_stats_frame(spark, sf_dir)
        .groupBy("bucket", "rowkey")
        .agg(F.sum("nc").alias("nc"))
    )
    return per_key.groupBy("bucket").agg(
        F.sum("nc").alias("n_cells"),
        F.count("*").alias("n_keys"),
    )


def q_sorted_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 16: per-bucket key ranges — disjointness of bucket key ranges is
    the relational face of the sorted-file contract (physical sortedness
    is asserted in tests/test_bulkload.py)."""
    oracle_safe(spark)
    return _bucket_stats_frame(spark, sf_dir).groupBy("bucket").agg(
        F.min("rowkey").alias("min_rk"),
        F.max("rowkey").alias("max_rk"),
        F.sum("nc").alias("n_cells"),
    )


def q_bulkload_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full ingest dataflow (ops 1,10,12,13,14,15,16 in one
    plan) — scan → validate → composite MD5 rowkey → bucket → one wide-row
    exchange → KV unpivot → region-aligned sort (shuffle-lean shape, see
    operators.bulkload.bulkload_pipeline)."""
    oracle_safe(spark)
    return bulkload_pipeline(records.wide9(spark, sf_dir), KEY_COLS, RECORD_COLS)


def q_bulkload_hfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops 7+9 end-to-end in the reference's ACTUAL sink format: the KV
    pipeline's cells are written as HFile v3 files by the executors
    (`HFileOutputFormat2`, BulkImporterFromText.java:108-111), placed
    into a 16-region table by the `doBulkLoad` analog
    (BulkImporterFromText.java:129-130), then the loaded table is
    scanned BACK through the index-planned distributed HFile reader
    (checksums verified) and summarized per region. The oracle computes
    the same per-bucket summary relationally from the raw table, so a
    green row certifies the whole write→load→read round trip
    value-for-value."""
    import tempfile

    from hbase_bulkload_spark.operators.hfile_load import (
        bulkload_hfile_roundtrip,
    )

    oracle_safe(spark)
    # range-partitioned alignment: 32 balanced write tasks instead of 16
    # hash-collided ones (multiple HFiles per region are legal — minor
    # compaction merges them; operators.bulkload.bulkload_pipeline doc)
    kv = bulkload_pipeline(
        records.wide9(spark, sf_dir), KEY_COLS, RECORD_COLS, range_partitions=32
    )
    # scratch table on tmpfs when available: the roundtrip writes + reads
    # ~2x the table's on-disk bytes per run, and routing that through a
    # spinning /tmp makes the measured time mostly disk-cache luck
    # (observed 11-30 s swings at sf0.1). The table is a verification
    # scratch artifact, not a deliverable — a real deployment hands the
    # HFiles to HDFS, not local disk.
    scratch_root = "/dev/shm" if os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()
    work = os.path.join(
        scratch_root,
        f"hfile_load_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    boundaries = [format(i, "x").encode() for i in range(16)]
    # columns: the summary below needs only rowkey + value — decode-side
    # pruning skips the family/qualifier/ts slice work per cell
    scanned = bulkload_hfile_roundtrip(kv, work, boundaries, columns=("value",))
    return _hfile_bucket_summary(scanned)


def _hfile_bucket_summary(scanned: DataFrame) -> DataFrame:
    """Per-bucket relational summary of a scanned cell frame — the
    round-trip certificate both bulk-load queries share (the oracle
    computes the identical summary from the raw table)."""
    per_key = (
        scanned.withColumn("bucket", F.substring("rowkey", 1, 1))
        .groupBy("bucket", "rowkey")
        .agg(
            F.count("*").alias("nc"),
            F.sum(F.length("value")).alias("vl"),
        )
    )
    return per_key.groupBy("bucket").agg(
        F.sum("nc").alias("n_cells"),
        F.count("*").alias("n_keys"),
        F.min("rowkey").alias("min_rk"),
        F.max("rowkey").alias("max_rk"),
        F.sum("vl").alias("sum_value_len"),
    )


def q_bulkload_hfile_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 7b WRITE side as a FULL-ORACLE query (round 9 — previously
    pinned only by the test_hfile_datasource.py round trip): the same
    ops-7+9 dataflow as q_bulkload_hfile, but the HFiles are written by
    the registered Python DataSource SINK (`df.write.format("hfile")`,
    two-phase commit via `_MANIFEST.json`), placed by the `doBulkLoad`
    analog from the committed manifest (never a directory glob — files
    from aborted attempts are invisible), and scanned back through the
    `spark.read.format("hfile")` DataSource reader. The oracle computes
    the identical per-bucket summary relationally from the raw table,
    so a green row certifies the ENTIRE DataSource write → manifest
    commit → bulk-load placement → DataSource read round trip
    value-for-value (HFileOutputFormat2 + doBulkLoad,
    BulkImporterFromText.java:108-111,129-130)."""
    import json
    import shutil
    import tempfile

    from hbase_bulkload_spark.operators import hfile_load as hl
    from hbase_bulkload_spark.sources.hfile_datasource import register

    oracle_safe(spark)
    register(spark)
    kv = bulkload_pipeline(
        records.wide9(spark, sf_dir), KEY_COLS, RECORD_COLS, range_partitions=32
    )
    # same tmpfs-scratch rationale as q_bulkload_hfile: verification
    # artifact, not a deliverable
    scratch_root = (
        "/dev/shm" if os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()
    )
    work = os.path.join(
        scratch_root,
        f"hfile_ds_load_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    if os.path.exists(work):
        shutil.rmtree(work)
    staging = os.path.join(work, "staging")
    table_dir = os.path.join(work, "table")
    kv.write.format("hfile").mode("overwrite").save(staging)
    with open(os.path.join(staging, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    boundaries = [format(i, "x").encode() for i in range(16)]
    hl.do_bulk_load(
        [m["path"] for m in manifest], table_dir, boundaries, spark=spark
    )
    register(spark)  # idempotent; keeps the reader registered post-load
    scanned = (
        spark.read.format("hfile")
        .option("columns", "value")
        .load(table_dir)
        .select("rowkey", "value")
    )
    return _hfile_bucket_summary(scanned)


#: Deterministic multi-get keyset: rows with l_orderkey % MULTIGET_MOD
#: == 0 (~0.1% of rows — point-read-selective, like a real Get batch).
MULTIGET_MOD = 991


def _hfile_artifacts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build-once (fixture-cached, like sources.records) bulk-loaded
    HFile BASE TABLE + z8 VALUE INDEX for the storage-tier read-path
    queries (q_index_seek / q_multi_get). A real deployment seeks
    against a table that already exists — the write path is its own
    query (q_bulkload_hfile) — so the read queries measure reads, not
    rebuilds. Returns (table_dir, index_dir)."""
    from hbase_bulkload_spark.operators import hfile_load as hl

    root = records._fixture_path(sf_dir, "hfile_table_v1")
    table_dir = os.path.join(root, "table")
    idx_dir = os.path.join(root, "z8_index")
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        kv = bulkload_pipeline(
            records.wide9(spark, sf_dir), KEY_COLS, RECORD_COLS,
            range_partitions=32,
        )
        boundaries = [format(i, "x").encode() for i in range(16)]
        manifest = hl.write_region_hfiles(kv, os.path.join(root, "_staging"))
        hl.do_bulk_load(
            [m["path"] for m in manifest], table_dir, boundaries, spark=spark
        )
        hl.build_value_index(kv, "z8", idx_dir, boundaries=boundaries)
        with open(marker, "w"):
            pass
    return table_dir, idx_dir


def q_index_seek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 24d at the STORAGE tier (the r4 flagship, now driver-gated):
    seek the materialized (value → rowkey) secondary index for
    z8 = '42' — an exact range scan [v+NUL, v+0x01) that the index
    tree's key fences block-prune — then fetch the matched base rows
    via the distributed multi-get (bloom + index walk per key; each
    touched file is opened once per task batch). Neither the index nor
    the base table is ever scanned in full. The oracle computes the
    same answer relationally (all cells of rows whose z8 cell holds
    '42'), so a green row certifies index build, range-scan pruning,
    key routing, and cell decode value-for-value — the read path the
    reference's table exists to serve (create_table.rb:1,
    BulkImporterFromText.java:129-130)."""
    from hbase_bulkload_spark.operators.hfile_load import index_seek

    oracle_safe(spark)
    table_dir, idx_dir = _hfile_artifacts(spark, sf_dir)
    return index_seek(spark, idx_dir, table_dir, "42").select(
        "rowkey", "qualifier", "value"
    )


def q_multi_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 18c driver-gated: batched point reads (`Table.get(List<Get>)`)
    as a keyed lookup JOIN against the bulk-loaded HFile artifact — the
    keyset derives deterministically from the source frame
    (l_orderkey % MULTIGET_MOD == 0 → composite MD5 rowkeys), executors
    route keys to owning files by bisecting the sorted keyset against
    each file's key range, and each file is batch-read once (bloom,
    index tree and touched blocks cached across the batch). The table
    is never scanned; absent keys cost one bloom probe."""
    from hbase_bulkload_spark.operators.hfile_load import multi_get

    oracle_safe(spark)
    table_dir, _ = _hfile_artifacts(spark, sf_dir)
    keys = (
        records.wide9(spark, sf_dir, floor=False)
        .filter(F.col("_seq") % MULTIGET_MOD == 0)
        .select(composite_rowkey(*KEY_COLS).alias("rowkey"))
    )
    return multi_get(spark, table_dir, keys).select(
        "rowkey", "qualifier", "value"
    )


QUERIES = {
    "q_scan_text": q_scan_text,
    "q_parse_delimited": q_parse_delimited,
    "q_scan_csv": q_scan_csv,
    "q_scan_columnar": q_scan_columnar,
    "q_scan_avro": q_scan_avro,
    "q_scan_rcfile": q_scan_rcfile,
    "q_scan_avro_ds": q_scan_avro_ds,
    "q_scan_rcfile_ds": q_scan_rcfile_ds,
    "q_scan_hfile_ds": q_scan_hfile_ds,
    "q_filter_arity": q_filter_arity,
    "q_filter_notnull": q_filter_notnull,
    "q_project": q_project,
    "q_rowkey_md5": q_rowkey_md5,
    "q_rowkey_concat": q_rowkey_concat,
    "q_key_reverse": q_key_reverse,
    "q_salt_bucket": q_salt_bucket,
    "q_unpivot_kv": q_unpivot_kv,
    "q_validate_records": q_validate_records,
    "q_sample_per_group": q_sample_per_group,
    "q_zorder_layout": q_zorder_layout,
    "q_kv_index_lookup": q_kv_index_lookup,
    "q_pivot_wide": q_pivot_wide,
    "q_range_partition": q_range_partition,
    "q_sorted_ingest": q_sorted_ingest,
    "q_bulkload_pipeline": q_bulkload_pipeline,
    "q_bulkload_hfile": q_bulkload_hfile,
    "q_bulkload_hfile_ds": q_bulkload_hfile_ds,
    "q_index_seek": q_index_seek,
    "q_multi_get": q_multi_get,
}

_Z = ", ".join(RECORD_COLS)


def _spread_sql(e: str) -> str:
    """DuckDB text of functions.keys._spread_bits32's mask ladder
    (32-bit lanes — masks are 0x0000FFFF0000FFFF, 0x00FF00FF00FF00FF,
    0x0F0F0F0F0F0F0F0F, 0x3333…, 0x5555… as decimal literals)."""
    x = f"(CAST({e} AS BIGINT) & 4294967295)"
    x = f"(({x} | ({x} << 16)) & 281470681808895)"
    x = f"(({x} | ({x} << 8)) & 71777214294589695)"
    x = f"(({x} | ({x} << 4)) & 1085102592571150095)"
    x = f"(({x} | ({x} << 2)) & 3689348814741910323)"
    x = f"(({x} | ({x} << 1)) & 6148914691236517205)"
    return x


_ZVAL_SQL = f"({_spread_sql('l_partkey')} | ({_spread_sql('l_suppkey')} << 1))"

ORACLES = {
    "q_scan_text": f"""
        WITH {WIDE9_CTE}
        SELECT CASE WHEN _seq % 97 = 0
                    THEN concat_ws(chr(1), z0, z1, z2, z3, z4, z5, z6, z7)
                    ELSE concat_ws(chr(1), z0, z1, z2, z3, z4, z5, z6, z7, z8)
               END AS value
        FROM wide9
    """,
    "q_parse_delimited": f"""
        WITH {WIDE9_CTE}
        SELECT {_Z} FROM wide9 WHERE _seq % 97 <> 0 AND z8 IS NOT NULL
    """,
    "q_scan_csv": f"WITH {WIDE9_CTE} SELECT {_Z} FROM wide9",
    "q_scan_columnar": f"WITH {WIDE9_CTE} SELECT {_Z} FROM wide9",
    "q_scan_avro": f"WITH {WIDE9_CTE} SELECT {_Z} FROM wide9",
    "q_scan_rcfile": f"WITH {WIDE9_CTE} SELECT {_Z} FROM wide9",
    "q_scan_avro_ds": f"WITH {WIDE9_CTE} SELECT {_Z} FROM wide9",
    "q_scan_rcfile_ds": f"WITH {WIDE9_CTE} SELECT {_Z} FROM wide9",
    "q_scan_hfile_ds": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT rowkey, qualifier, value FROM kv
        WHERE rowkey LIKE '4%'
    """,
    "q_filter_arity": f"""
        WITH {WIDE9_CTE}
        SELECT (_seq % 97 <> 0 AND z8 IS NOT NULL) AS is_valid,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM wide9 GROUP BY 1
    """,
    "q_filter_notnull": f"""
        WITH {WIDE9_CTE}
        SELECT qualifier,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        FROM (
            SELECT 'z0' AS qualifier, z0 AS value FROM wide9
            UNION ALL SELECT 'z1', z1 FROM wide9
            UNION ALL SELECT 'z2', z2 FROM wide9
            UNION ALL SELECT 'z3', z3 FROM wide9
            UNION ALL SELECT 'z4', z4 FROM wide9
            UNION ALL SELECT 'z5', z5 FROM wide9
            UNION ALL SELECT 'z6', z6 FROM wide9
            UNION ALL SELECT 'z7', z7 FROM wide9
            UNION ALL SELECT 'z8', z8 FROM wide9
        ) GROUP BY qualifier
    """,
    "q_project": f"WITH {WIDE9_CTE} SELECT z0, z1, z2, z3 FROM wide9",
    "q_rowkey_md5": f"WITH {WIDE9_CTE} SELECT z0, md5(z0) AS k0 FROM wide9",
    "q_rowkey_concat": f"""
        WITH {WIDE9_CTE}
        SELECT z0, z1, z2, z3, {ROWKEY_SQL} AS rowkey FROM wide9
    """,
    "q_key_reverse": f"WITH {WIDE9_CTE} SELECT z0, reverse(z0) AS rk FROM wide9",
    "q_salt_bucket": """
        SELECT l_orderkey,
               CAST(l_orderkey % 10 AS INT) AS bucket,
               lpad(CAST(l_orderkey % 10 AS VARCHAR), 2, '0') || '|'
                   || CAST(l_orderkey AS VARCHAR) AS salted
        FROM lineitem
    """,
    "q_unpivot_kv": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT rowkey, family, qualifier, value FROM kv
    """,
    "q_validate_records": f"""
        WITH {WIDE9_CTE}
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN z0 IS NULL OR z1 IS NULL OR z2 IS NULL
                                  OR z3 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS null_key_field,
               CAST(SUM(CASE WHEN z8 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS null_z8,
               CAST(SUM(CASE WHEN NOT regexp_matches(z6,
                    '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}$') THEN 1 ELSE 0 END)
                    AS BIGINT) AS bad_date_z6,
               CAST(SUM(CASE WHEN z4 NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)
                    AS BIGINT) AS bad_flag_z4,
               CAST(SUM(CASE WHEN NOT regexp_matches(z7, '^[0-9]+$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS nonnumeric_z7
        FROM wide9
    """,
    "q_sample_per_group": """
        SELECT lang, doc_id, CAST(rk AS INT) AS rk FROM (
            SELECT lang, doc_id, ROW_NUMBER() OVER (
                PARTITION BY lang
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents
        ) WHERE rk <= 20
    """,
    "q_zorder_layout": f"""
        WITH z AS (
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                   CAST({_ZVAL_SQL} AS BIGINT) AS zval
            FROM lineitem
        )
        SELECT *, CAST(zval >> 28 AS INT) AS zbucket FROM z
    """,
    "q_kv_index_lookup": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT rowkey, qualifier, value FROM kv
        WHERE rowkey IN (
            SELECT rowkey FROM kv WHERE qualifier = 'z8' AND value = '42'
        )
    """,
    "q_index_seek": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT rowkey, qualifier, value FROM kv
        WHERE rowkey IN (
            SELECT rowkey FROM kv WHERE qualifier = 'z8' AND value = '42'
        )
    """,
    "q_multi_get": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT rowkey, qualifier, value FROM kv
        WHERE rowkey IN (
            SELECT {ROWKEY_SQL} FROM wide9 WHERE _seq % {MULTIGET_MOD} = 0
        )
    """,
    "q_pivot_wide": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT rowkey,
               {", ".join(f"MAX(CASE WHEN qualifier = '{c}' THEN value END) AS {c}" for c in RECORD_COLS)}
        FROM kv GROUP BY rowkey
    """,
    "q_range_partition": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT substr(rowkey, 1, 1) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(COUNT(DISTINCT rowkey) AS BIGINT) AS n_keys
        FROM kv GROUP BY 1
    """,
    "q_sorted_ingest": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT substr(rowkey, 1, 1) AS bucket,
               MIN(rowkey) AS min_rk,
               MAX(rowkey) AS max_rk,
               CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM kv GROUP BY 1
    """,
    "q_bulkload_pipeline": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT rowkey, family, qualifier, value, substr(rowkey, 1, 1) AS bucket
        FROM kv
    """,
    "q_bulkload_hfile": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT substr(rowkey, 1, 1) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(COUNT(DISTINCT rowkey) AS BIGINT) AS n_keys,
               MIN(rowkey) AS min_rk,
               MAX(rowkey) AS max_rk,
               CAST(SUM(LENGTH(value)) AS BIGINT) AS sum_value_len
        FROM kv GROUP BY 1
    """,
    # DataSource-sink round trip: identical relational certificate —
    # the write/load/read machinery differs, the cells must not
    "q_bulkload_hfile_ds": f"""
        WITH {WIDE9_CTE}, {KV_CTE}
        SELECT substr(rowkey, 1, 1) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(COUNT(DISTINCT rowkey) AS BIGINT) AS n_keys,
               MIN(rowkey) AS min_rk,
               MAX(rowkey) AS max_rk,
               CAST(SUM(LENGTH(value)) AS BIGINT) AS sum_value_len
        FROM kv GROUP BY 1
    """,
}
