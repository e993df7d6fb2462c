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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
