"""Adaptive byte-range split sizing for the Python-codec container
scans (Avro OCF, RCFile, and their DataSource forms).

Spark's own file-source planner sizes splits as
``min(maxPartitionBytes, max(openCostInBytes, totalBytes/cores))``
(`FilePartition.maxSplitBytes`) so small datasets still fan out across
the cluster. The fixed 128 MB default here had the small-data half of
that policy missing: a 28 MB, 8-file table planned 8 single-split tasks
on 32 cores, capping a CPU-bound Python decode at ¼ of the machine.

``open_cost`` is deliberately smaller than Spark's 4 MB default: these
codecs decode in Python at tens of MB/s/core (vs GB/s for the JVM
parquet reader), so a 1 MB split still carries far more decode work
than its scheduling overhead.
"""

from __future__ import annotations

DEFAULT_MAX_SPLIT = 128 << 20  # HDFS-block-ish upper bound
DEFAULT_OPEN_COST = 1 << 20  # Python decode ≫ task overhead at 1 MB


def adaptive_split_size(
    total_bytes: int,
    parallelism: int,
    max_split: int = DEFAULT_MAX_SPLIT,
    open_cost: int = DEFAULT_OPEN_COST,
) -> int:
    """Spark's maxSplitBytes formula: fill ``parallelism`` tasks when
    the data is small, never exceed ``max_split`` when it is large,
    and never go below ``open_cost`` per split."""
    bytes_per_core = total_bytes // max(parallelism, 1) + 1
    return int(min(max_split, max(open_cost, bytes_per_core)))
