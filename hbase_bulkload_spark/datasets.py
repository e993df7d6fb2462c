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
    return parallelism_floor(spark, df, path=path) if floor_parallelism else df


#: Memoized floor decisions — the probe reads file footers (path mode)
#: or runs an extra planning pass (fallback), neither of which should
#: repeat per query construction. Keyed by (path, threshold, mtime):
#: threshold because the decision depends on the session's core count
#: (a later session in the same process may differ), mtime so a
#: rewritten file with a different row-group layout re-probes.
_FLOOR_DECISIONS: dict[tuple[str, int, float], bool] = {}


def parallelism_floor(
    spark: SparkSession, df: DataFrame, path: str | None = None
) -> DataFrame:
    """Guarantee a scan feeds at least half the cluster's cores.

    A parquet split cannot cross a row-group boundary, so a file
    written as few giant row groups collapses to that many non-empty
    tasks no matter how many byte-range splits Spark PLANS (splits
    without a row-group midpoint decode zero rows). The probe therefore
    measures true splittability, not planned partitions:

    - ``path`` given (parquet): if the table has ≥ cores/2 files,
      NO-OP with no I/O (file count alone bounds parallelism from
      below). Otherwise read the few footers and use the total
      row-group count — the real upper bound on scan parallelism.
    - no ``path``: fall back to the planned partition count
      (``df.rdd.getNumPartitions()``; an extra planning pass, and an
      under-estimate of the pathology for large single-row-group files
      — prefer passing ``path``).

    Any well-laid-out cluster dataset (many files or many row groups)
    is a no-op; only a pathologically unsplittable input pays one
    round-robin exchange of the scanned frame to unlock the compute
    stage's parallelism. Reserve it for consumers whose per-row work
    dwarfs an exchange of the input; a plain filter/agg never needs it.
    Decisions are memoized per path (probe I/O and the fallback's
    planning pass run once per table, not once per query).
    """
    target = spark.sparkContext.defaultParallelism
    threshold = max(target // 2, 2)
    if path is not None:
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            mtime = -1.0
        memo_key = (path, threshold, mtime)
        needs = _FLOOR_DECISIONS.get(memo_key)
        if needs is None:
            needs = _effective_parallelism(path, threshold) < threshold
            _FLOOR_DECISIONS[memo_key] = needs
        return df.repartition(target) if needs else df
    if df.rdd.getNumPartitions() < threshold:
        return df.repartition(target)
    return df


def _effective_parallelism(path: str, cap: int) -> int:
    """Row-group-level splittability of a parquet path: number of files
    if ≥ cap (no footer I/O), else total row groups across the files."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
    else:
        files = [path]
    if len(files) >= cap:
        return len(files)
    return sum(pq.ParquetFile(f).num_row_groups for f in files)


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a registry table from parquet footer metadata
    — zero Spark jobs (the same probe machinery as
    :func:`_effective_parallelism`). For sizing decisions (GEMM block
    counts, gate thresholds) that would otherwise pay a driver-side
    ``df.count()`` scan."""
    import pyarrow.parquet as pq

    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
    else:
        files = [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def parquet_column_minmax(
    sf_dir: str, name: str, column: str
) -> tuple[int, int] | None:
    """(min, max) of an integer column from parquet row-group footer
    statistics — zero Spark jobs, metadata-scale I/O at any corpus size
    (the same probe machinery as :func:`parquet_row_count`). Returns
    None when any row group lacks stats for the column (the caller must
    then take its conservative branch). Powers runtime gates that need
    a VALUE bound, not a row count — e.g. the LSH candidate pair-packing
    gate (ids must fit u32) that cannot be assumed statically at
    100 TB."""
    import pyarrow.parquet as pq

    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
    else:
        files = [path]
    lo = hi = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        try:
            idx = md.schema.names.index(column)
        except ValueError:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)


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
