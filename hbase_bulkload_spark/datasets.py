"""Table registry over the driver-generated parquet test data.

Tables (see TESTDATA.md): TPC-H-ish star schema + an event stream +
LLM-pipeline tables (documents, embeddings). All loads are plain
``spark.read.parquet`` so Catalyst gets full pushdown/pruning; at 100 TB
the same call pattern reads a partitioned table and prunes partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "customer", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(
    spark: SparkSession, sf_dir: str, name: str, floor_parallelism: bool = False
) -> DataFrame:
    """``floor_parallelism=True`` is for compute-heavy consumers (per-row
    hashing, GEMM, signature UDFs): see :func:`parallelism_floor`."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = _read_events(spark, path)
    else:
        df = spark.read.parquet(path)
    return parallelism_floor(spark, df) if floor_parallelism else df


def parallelism_floor(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Guarantee a scan feeds at least half the cluster's cores.

    A parquet split cannot cross a row-group boundary, so a file written
    as one giant row group planwise collapses to a single task — and any
    compute-heavy consumer (per-row MD5, rolling hashes, Arrow-batch
    GEMM) runs on 1 of N cores. When the planned scan parallelism is
    already ≥ cores/2 (any well-laid-out multi-file / multi-row-group
    input — i.e. every real cluster dataset), this is a NO-OP: no
    exchange is added. Only a pathologically unsplittable input pays one
    round-robin exchange of the scanned frame to unlock the compute
    stage's parallelism. Reserve it for consumers whose per-row work
    dwarfs an exchange of the input; a plain filter/agg never needs it.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS). Spark 4.x reads it
    natively as timestamp_ntz with the same ns→µs truncation DuckDB
    applies, so both engines see identical timestamps with no session
    conf involved. (An earlier version set
    spark.sql.legacy.parquet.nanosAsLong=true session-wide — verified
    a no-op on Spark 4.1 and a conf leak besides, so it is gone; the
    bigint fallback below keeps Spark 3.x sessions working when the
    caller sets that conf themselves.)"""
    from pyspark.sql import functions as F  # local: avoid cycle at import

    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df
