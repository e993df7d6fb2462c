"""The bulk-load pipeline (SURVEY.md §2.5-2.6): validate → derive keys →
unpivot to KV cells → range/bucket partition → sort within partitions →
sorted Snappy columnar sink.

Reference dataflow being re-expressed:
- `HFileOutputFormat2.configureIncrementalLoad`
  (`BulkImporterFromText.java:104-108`) installs a TotalOrderPartitioner
  over the table's region start keys plus a PutSortReducer — i.e. a
  total-order repartition + per-partition sort, one sorted Snappy HFile
  per region (`BulkImporterFromText.java:108-111`).
- Regions are pre-split 10 ways on '0'..'9' (`create_table.rb:1`).

Spark-first: the bucket is an *explicit column* (first hex char of the
uniformly-distributed MD5 key — 16-way by default; the reference's raw
digest bytes vs ASCII splits mismatch is a documented deviation,
SURVEY.md §2.14 note). `repartition(n, bucket)` + `sortWithinPartitions`
reproduces the region-aligned sorted-file contract with exactly one
shuffle, and the key's uniform distribution makes that shuffle skew-free
by construction — the property that survives a 100 TB scale-up. Bucket
count is a parameter (the reference hardcodes 10, `RowKeyConverter.java:8`);
at cluster scale set it from data volume, not region count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_bulkload_spark.functions.keys import (
    composite_rowkey,
    hex_bucket,
    positional_qualifier_bytes,
    raw_binary_rowkey,
)
from hbase_bulkload_spark.operators.kv import CURRENT_FAMILY, unpivot_kv


def bulkload_kv(
    df: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    family: str = CURRENT_FAMILY,
    ts: Column | None = None,
    drop_null: bool = True,
    raw_binary_keys: bool = False,
    positional_qualifiers: bool = False,
) -> DataFrame:
    """Wide records → bulk-load-ready KV frame with rowkey + bucket.

    Mirrors the mapper: makeRowKey(fields 0..3) → one cell per column
    (`BulkImporterFromText.java:57-66`). All JVM-side expressions; the
    plan is map-only until the caller's terminal exchange — the same
    shape as the reference's map phase.

    Reference-fidelity opt-ins (both default off — the normalized
    128-hex key + name qualifiers are the engine's canonical contract):

    - ``raw_binary_keys``: rowkey becomes the reference's 64 RAW digest
      bytes (`RowKeyConverter.java:26-29`), binary-typed; the bucket is
      still the first hex nibble, so layout and sort order are
      unchanged (hex is an order-preserving byte encoding).
    - ``positional_qualifiers``: qualifiers become `Bytes.toBytes(i)`
      4-byte big-endian ints (`BulkImporterFromText.java:65`),
      binary-typed, mapped from column names by a literal map — a
      legacy consumer of the reference reads these cells unchanged.
    """
    rowkey = (
        raw_binary_rowkey(*key_cols) if raw_binary_keys
        else composite_rowkey(*key_cols)
    )
    kv = unpivot_kv(df, rowkey, value_cols, family=family, ts=ts, drop_null=drop_null)
    if positional_qualifiers:
        qmap = F.create_map(
            *[
                lit
                for i, c in enumerate(value_cols)
                for lit in (F.lit(c), F.lit(positional_qualifier_bytes(i)))
            ]
        )
        kv = kv.withColumn("qualifier", F.element_at(qmap, F.col("qualifier")))
    bucket = (
        F.lower(F.substring(F.hex(F.col("rowkey")), 1, 1)) if raw_binary_keys
        else hex_bucket(F.col("rowkey"))
    )
    return kv.withColumn("bucket", bucket)


def bulkload_pipeline(
    df: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    family: str = CURRENT_FAMILY,
    n_buckets: int = 16,
    range_partitions: int | None = None,
) -> DataFrame:
    """Shuffle-lean flagship plan: exchange *wide* rows, unpivot after.

    ``bulkload_kv → region_align`` shuffles the exploded cell frame —
    every 128-hex rowkey crosses the wire 9×. Deriving key + bucket on
    the wide frame and repartitioning *before* the unpivot moves ~7-8×
    fewer bytes through the one exchange; `unpivot` is a narrow Generate,
    so the bucket partitioning survives it and the terminal
    `sortWithinPartitions` needs no further exchange. At 100 TB the
    shuffle is the bottleneck, so this is the shape that scales.

    ``range_partitions`` switches the exchange to
    ``repartitionByRange(n, rowkey)`` — for sinks that allow multiple
    files per region (HFile bulk load does; minor compaction merges
    them). Hash-partitioning 16 bucket labels into 16 partitions leaves
    collision stragglers holding 2-3 buckets each (observed: ~10 of 16
    partitions occupied); range partitioning balances write tasks and
    lets the partition count exceed the region count. Since the bucket
    is the rowkey's first hex char, rowkey ranges never interleave
    buckets — each task still writes whole sorted bucket fragments.
    """
    wide = df.select(
        composite_rowkey(*key_cols).alias("rowkey"),
        *[F.col(c).cast("string").alias(c) for c in value_cols],
    ).withColumn("bucket", hex_bucket(F.col("rowkey")))
    if range_partitions is not None:
        wide = wide.repartitionByRange(range_partitions, "rowkey")
    else:
        wide = wide.repartition(n_buckets, "bucket")
    # NOTE (round-7 A/B): sorting the WIDE frame before the unpivot and
    # relying on Generate's order-preservation is ~9x less sort work on
    # paper, but it is WRONG for duplicate rowkeys (each duplicate row
    # re-emits its qualifiers from the top — ...z8, z0... inversions),
    # and the measured win was nil (2.2 s -> 2.4 s noop materialization
    # at sf0.1: the Expand + string copy dominates, not the sort). The
    # exploded-frame sort is both correct and no slower.
    long = (
        wide.unpivot(["rowkey", "bucket"], list(value_cols), "qualifier", "value")
        .filter(F.col("value").isNotNull())
    )
    return long.select(
        "rowkey", F.lit(family).alias("family"), "qualifier", "value", "bucket"
    ).sortWithinPartitions("bucket", "rowkey", "qualifier")


def region_align(kv: DataFrame, n_buckets: int = 16) -> DataFrame:
    """The one global shuffle: co-locate each bucket, sort cells within
    each partition by (rowkey, qualifier) — HBase cell order, the
    PutSortReducer contract (`BulkImporterFromText.java:108`)."""
    return kv.repartition(n_buckets, "bucket").sortWithinPartitions(
        "bucket", "rowkey", "qualifier"
    )


def write_bulkload(kv: DataFrame, path: str, n_buckets: int = 16) -> None:
    """Sorted, bucket-partitioned, Snappy columnar sink — the analog of
    the HFile directory handed to `LoadIncrementalHFiles.doBulkLoad`
    (`BulkImporterFromText.java:129-130`); the engine's contract ends at
    region-aligned sorted files (SURVEY.md §2.1 op 9).

    AQE partition coalescing is disabled for this write so the
    partition↔bucket correspondence (and hence per-file sortedness)
    survives planning (SURVEY.md §4.2).
    """
    spark = kv.sparkSession
    prior = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        (
            region_align(kv, n_buckets)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .option("compression", "snappy")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prior)
