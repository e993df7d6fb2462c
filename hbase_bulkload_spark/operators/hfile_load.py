"""HFile bulk-load orchestration (SURVEY.md §2.1 op 9): executor-written
region HFiles → `doBulkLoad`-style handoff → distributed verification
scan.

Reference dataflow: `HFileOutputFormat2` writes one sorted HFile per
region partition (`BulkImporterFromText.java:104-111`), then the client
calls `LoadIncrementalHFiles.doBulkLoad(tmpPath, table)`
(`BulkImporterFromText.java:129-130`), which for each HFile reads first/
last keys, assigns it to the region containing its first key, SPLITS any
file that straddles a region boundary, and moves the file into the
region's family directory. This module reproduces that contract against
a local filesystem "table" (no HBase cluster exists in-container; the
region-server RPC is the one piece with no runnable analog — the file
placement, splitting, and resulting on-disk layout are the loadable
artifact and are verified by reading the table back).

Scale posture:
- the HFiles are written by the EXECUTORS, one per region bucket, off
  the same single wide-row exchange the parquet sink uses — the driver
  only collects a tiny per-file manifest;
- `do_bulk_load` reads ~4 KB of metadata per file (trailer + index) to
  place it; split rounds are dispatched back through Spark so
  rewriting crossing files is cluster-parallel, mirroring
  LoadIncrementalHFiles' bulk-load thread pool;
- the verification scan plans block-range splits from each file's root
  index, so read parallelism tracks bytes, not file count.
"""

from __future__ import annotations

import os
import shutil
from bisect import bisect_left, bisect_right
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

from hbase_bulkload_spark.sources import hfile as hf


def task_file_label() -> str:
    """``{partitionId}-{taskAttemptId}`` — file names must be unique
    PER ATTEMPT, not per partition: with speculative execution (or a
    zombie original racing a retry) two live attempts of one partition
    would otherwise open the same path with 'wb' and interleave writes
    into a corrupted HFile. Attempt-unique names make the losing
    attempt's file an unreferenced orphan instead (only the winning
    attempt's manifest rows are collected/committed)."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    return f"{ctx.partitionId():05d}-{ctx.taskAttemptId()}"


def write_partition_cells_arrow(
    batches,
    out_dir: str,
    task_label: str,
    compression: str | None = "snappy",
    ts: int = 0,
) -> list[dict]:
    """Executor-side body shared by `write_region_hfiles` (mapInArrow)
    and the `format("hfile")` DataSource writer: stream Arrow record
    batches of the region-aligned KV contract (rowkey, family,
    qualifier, value, bucket — sorted by (bucket, rowkey, qualifier))
    into one open HFileWriter per bucket; returns one manifest dict per
    file. ``task_label`` should come from :func:`task_file_label`.
    Batch columns feed ``HFileWriter.add_many_arrow`` directly — no
    pandas object arrays, no per-cell Python bytes on the write path at
    all (string columns are cast to binary once, C-level — the
    reference-fidelity raw-key/positional modes pass binary already).
    Contract (stronger than the old pandas groupby's): the bucket
    column is NON-NULL and equal buckets are CONTIGUOUS within the
    partition — grouping is a run-length split over the bucket column
    (one C-level compare pass per batch), so a non-contiguous bucket
    would open a second writer mid-file and nulls would propagate
    through ``pc.not_equal`` and silently merge adjacent runs into the
    wrong bucket's HFile. The KV contract (sorted by (bucket, rowkey,
    qualifier), bucket from a non-null key) guarantees both; the null
    half is asserted loudly per batch. A writer per bucket persists
    across batches.

    Attempts stream into a ``.tmp``-suffixed name (outside the
    ``part-*.hfile`` namespace committed readers and the job-commit
    orphan sweep look at) and rename to the final name only on task
    completion, so a file is visible under its final name either fully
    written or not at all — a killed/zombie attempt leaves at worst a
    ``.tmp`` straggler, not a half-written ``part-*`` file."""
    import numpy as np
    import pyarrow.compute as pc

    writers: dict[str, hf.HFileWriter] = {}
    finals: dict[str, str] = {}
    for rb in batches:
        n = rb.num_rows
        if n == 0:
            continue
        names = rb.schema.names
        col = {c: rb.column(names.index(c)) for c in
               ("rowkey", "family", "qualifier", "value", "bucket")}
        bkt = col["bucket"]
        if bkt.null_count:
            raise ValueError(
                f"bucket column has {bkt.null_count} null(s); the KV "
                "contract guarantees a non-null bucket and the "
                "run-length split would silently merge runs across a "
                "null boundary"
            )
        if n > 1:
            neq = pc.not_equal(bkt.slice(1), bkt.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            starts = np.concatenate(([0], np.flatnonzero(neq) + 1, [n]))
        else:
            starts = np.array([0, n])
        for s, e in zip(starts[:-1], starts[1:]):
            s, e = int(s), int(e)
            bucket = bkt[s].as_py()
            w = writers.get(bucket)
            if w is None:
                path = os.path.join(out_dir, f"part-{task_label}-{bucket}.hfile")
                finals[bucket] = path
                w = writers[bucket] = hf.HFileWriter(path + ".tmp", compression)
            w.add_many_arrow(
                col["rowkey"].slice(s, e - s),
                col["family"].slice(s, e - s),
                col["qualifier"].slice(s, e - s),
                ts,
                col["value"].slice(s, e - s),
            )
    out = []
    for bucket, w in writers.items():
        m = w.close()
        os.replace(m["path"], finals[bucket])  # task-commit rename
        out.append(
            {
                "path": finals[bucket],
                "bucket": bucket,
                "entry_count": m["entry_count"],
                "n_blocks": m["n_blocks"],
            }
        )
    return out


_MANIFEST_SCHEMA = "path string, bucket string, entry_count long, n_blocks long"


def write_region_hfiles(
    kv: DataFrame,
    out_dir: str,
    ts: int = 0,
    compression: str | None = "snappy",
) -> list[dict]:
    """Write one HFile per region bucket from a region-aligned KV frame
    (columns rowkey, family, qualifier, value, bucket — sorted within
    partitions by (bucket, rowkey, qualifier), i.e. the output of
    `operators.bulkload.region_align`). Executors stream Arrow batches
    into at most a handful of open writers (buckets are contiguous in
    the sort); the returned manifest is one row per file.

    Cell columns are cast to binary JVM-side before the Python hop:
    codegen does the UTF-8 encode once per value, so the executor loop
    never runs 4×n_cells Python ``str.encode`` calls (measured ~5-10%
    off the write wall at sf0.1, byte-identical output; a no-op for
    callers already passing binary columns). The hop itself is
    ``mapInArrow`` feeding ``add_many_arrow`` — the mapInPandas
    object-array materialization was ~2 s of a ~4.7 s write wall at
    sf0.1 (A/B with a no-op executor body, round 7)."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    cell_cols = ("rowkey", "family", "qualifier", "value")
    kv = kv.select(
        *[
            F.col(c).cast("binary").alias(c) if c in cell_cols else F.col(c)
            for c in kv.columns
        ]
    )

    os.makedirs(out_dir, exist_ok=True)

    def write_parts(batches):
        out = write_partition_cells_arrow(
            batches, out_dir, task_file_label(), compression, ts
        )
        yield pa.RecordBatch.from_pydict(
            {
                "path": [m["path"] for m in out],
                "bucket": [m["bucket"] for m in out],
                "entry_count": [m["entry_count"] for m in out],
                "n_blocks": [m["n_blocks"] for m in out],
            },
            schema=pa.schema(
                [
                    ("path", pa.string()),
                    ("bucket", pa.string()),
                    ("entry_count", pa.int64()),
                    ("n_blocks", pa.int64()),
                ]
            ),
        )

    manifest = kv.mapInArrow(write_parts, _MANIFEST_SCHEMA).collect()
    return [r.asDict() for r in manifest]


def _region_dirs(table_dir: str, boundaries: list[bytes], family: str) -> list[str]:
    dirs = []
    for i, start in enumerate(boundaries):
        # directory label: the start key if it is printable ASCII (the
        # canonical hex-nibble boundaries), else its hex — raw-binary
        # boundaries (e.g. b"\x80") are not valid path text
        printable = all(0x20 <= b < 0x7F for b in start)
        label = start.decode("ascii") if (start and printable) else start.hex()
        d = os.path.join(
            table_dir, f"region-{i:04d}-{label or 'START'}", family
        )
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
    return dirs


def do_bulk_load(
    src_paths: list[str],
    table_dir: str,
    boundaries: list[bytes],
    family: str = "c",
    spark: SparkSession | None = None,
    compression: str | None = "snappy",
) -> list[dict]:
    """`LoadIncrementalHFiles.doBulkLoad` against a local-FS table layout.

    ``boundaries`` are the region start keys, sorted; region i covers
    [boundaries[i], boundaries[i+1]). Each file is placed by its first
    row; files whose last row crosses the owning region's end are split
    at the boundary (`groupOrSplit` → `splitStoreFile`) and both halves
    re-queued — split rounds run as Spark tasks when a session is given,
    serially otherwise. Placement is an atomic rename, matching the
    region server's commitStoreFile move. Returns one manifest row per
    loaded file: {region, path, entry_count}."""
    if boundaries != sorted(boundaries):
        raise ValueError("region boundaries must be sorted")
    region_dirs = _region_dirs(table_dir, boundaries, family)
    loaded: list[dict] = []
    queue = list(src_paths)
    round_no = 0
    while queue:
        placements: list[tuple[str, int]] = []
        splits: list[tuple[str, bytes]] = []
        for path in queue:
            first_row, last_row = hf.file_key_range(path)
            idx = bisect_right(boundaries, first_row) - 1
            if idx < 0:
                raise ValueError(
                    f"{path}: first row {first_row!r} precedes the first "
                    f"region start {boundaries[0]!r}"
                )
            if idx + 1 < len(boundaries) and last_row >= boundaries[idx + 1]:
                splits.append((path, boundaries[idx + 1]))
            else:
                placements.append((path, idx))

        for path, idx in placements:
            dest = os.path.join(region_dirs[idx], os.path.basename(path))
            os.rename(path, dest)
            with open(dest, "rb") as f:
                entry_count = hf.read_trailer(f).entry_count
            loaded.append({"region": idx, "path": dest, "entry_count": entry_count})

        def run_split(task: tuple[str, bytes]) -> list[str]:
            path, split_row = task
            stem = path[: -len(".hfile")] if path.endswith(".hfile") else path
            bottom, top = hf.split_hfile(
                path,
                split_row,
                stem + ".bottom.hfile",
                stem + ".top.hfile",
                compression,
            )
            os.unlink(path)
            return [m["path"] for m in (bottom, top) if m]

        if splits and spark is not None:
            halves = (
                spark.sparkContext.parallelize(splits, len(splits))
                .map(run_split)
                .collect()
            )
        else:
            halves = [run_split(t) for t in splits]
        queue = [p for pair in halves for p in pair]
        round_no += 1
        if round_no > 64:  # a file can only split log(regions) times
            raise RuntimeError("bulk load did not converge")
    return loaded


def bulkload_to_table(
    kv: DataFrame,
    out_dir: str,
    boundaries: list[bytes],
    family: str = "c",
    compression: str | None = "snappy",
) -> list[dict]:
    """Ops 7+9 as a sink (no read-back): executor-written region HFiles
    staged under ``out_dir/_staging``, then doBulkLoad placement into
    ``out_dir`` — the loaded-table layout the reference leaves behind.
    ``kv`` must be region-aligned (`operators.bulkload.region_align`).
    Returns the per-file load manifest."""
    spark = kv.sparkSession
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    staging = os.path.join(out_dir, "_staging")
    manifest = write_region_hfiles(kv, staging, compression=compression)
    loaded = do_bulk_load(
        [m["path"] for m in manifest],
        out_dir,
        boundaries,
        family=family,
        spark=spark,
        compression=compression,
    )
    # rmtree, not rmdir: attempt-unique file names mean a failed or
    # losing speculative attempt can leave an orphan HFile in staging
    # (only manifest-listed files were moved) — exactly the retry case
    # the naming scheme exists for; an orphan must not fail the load
    shutil.rmtree(staging)
    return loaded


# scan split granularity FLOOR: small enough that a 16-file local
# verification table (~60-200 MB) still fans out past the core count.
# Since r11 the effective split size is SCALE-ADAPTIVE (split_bytes=None
# → _adaptive_split_bytes): a fixed 2 MiB split would mint ~50M scan
# tasks over a 100 TB table (guide §2.2 — quadratic shuffle-block /
# task-overhead growth), while a fixed large split would starve a
# local[32] read of a 60 MB table. The derived size targets
# OVERSUB_TASKS_PER_CORE tasks per core and clamps to
# [DEFAULT_SPLIT_BYTES, MAX_SPLIT_BYTES]; at the driver's gate scales
# the clamp floor makes the plan byte-identical to the fixed-2 MiB
# rounds (verified: same split count at sf0.1).
DEFAULT_SPLIT_BYTES = 2 << 20
#: Per-task on-disk-byte ceiling for the adaptive solve — at cluster
#: scale task overhead amortizes over ≥64 MiB sequential reads (the
#: same band HBase scan chunking and parquet maxPartitionBytes target).
MAX_SPLIT_BYTES = 64 << 20
#: Adaptive target: ~4 scan tasks per core — enough slack that one slow
#: split doesn't tail the stage, few enough that per-task overhead
#: stays negligible.
OVERSUB_TASKS_PER_CORE = 4


#: Per-DECODE-CALL on-disk-byte bound inside a scan task. Separate knob
#: from the split (task) size on purpose: the r11 sf3-density A/B
#: measured 24 MiB whole-split decodes 2.6× SLOWER than 2 MiB ones —
#: decode_cells_arrow's gathers allocate index/scratch arrays several
#: times the payload (the fixed-width rowkey gather builds an
#: (n_cells × key_len) int64 index ≈ 8× the column), so 32 concurrent
#: workers at tens of MB each thrash. Chunking the decode keeps task
#: scratch flat at the measured-good 2 MiB granularity while the
#: adaptive SPLIT size keeps the task count scale-bounded.
DECODE_CHUNK_BYTES = 2 << 20


def _iter_block_chunks(blocks, chunk_bytes: int = DECODE_CHUNK_BYTES):
    """Group a split's (off, size) block list into ≤ ~chunk_bytes runs
    (always at least one block per run) — the decode-call granularity."""
    chunk, acc = [], 0
    for b in blocks:
        chunk.append(b)
        acc += b[1] if isinstance(b, (tuple, list)) else b["size"]
        if acc >= chunk_bytes:
            yield chunk
            chunk, acc = [], 0
    if chunk:
        yield chunk


def _adaptive_split_bytes(total_bytes: int, cores: int | None) -> int:
    """split_bytes for ``total_bytes`` of on-disk data blocks: target
    OVERSUB_TASKS_PER_CORE tasks per core, clamped to
    [DEFAULT_SPLIT_BYTES, MAX_SPLIT_BYTES]."""
    if cores is None or cores <= 0:
        cores = int(
            os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32)
        )
    want = total_bytes // max(OVERSUB_TASKS_PER_CORE * cores, 1)
    return max(DEFAULT_SPLIT_BYTES, min(MAX_SPLIT_BYTES, want))


def plan_block_splits(
    table_dir: str,
    split_bytes: int | None = None,
    start_row: bytes | None = None,
    stop_row: bytes | None = None,
    cores: int | None = None,
) -> list[tuple[str, str, str, list[tuple[int, int]]]]:
    """Driver-side scan planning shared by `scan_hfiles` and the
    `format("hfile")` Python DataSource: read each file's trailer + root
    index (a few KB), prune whole files by key range from metadata
    alone, prune blocks against the index's first-key fences, and pack
    surviving blocks into ~``split_bytes`` chunks — one task each.
    ``split_bytes=None`` (the default) derives the chunk size from the
    surviving files' total data-block bytes via
    :func:`_adaptive_split_bytes` (``cores`` = the scan's available
    parallelism; falls back to $SPARK_GRAFT_CPUS / os.cpu_count()).
    Returns (path, region, codec, [(off, size), ...]) per split."""
    import glob as _glob

    files = sorted(
        _glob.glob(os.path.join(table_dir, "region-*", "*", "*.hfile"))
    )
    if not files:
        raise FileNotFoundError(f"no hfiles under {table_dir}")

    # metadata pass: trailer + root index per surviving file (a few KB
    # each); collected first so the adaptive solve sees total bytes
    metas: list[tuple[str, str, object, list]] = []
    for path in files:
        region = os.path.basename(os.path.dirname(os.path.dirname(path)))
        if start_row is not None or stop_row is not None:
            first_row, last_row = hf.file_key_range(path)
            if start_row is not None and last_row < start_row:
                continue
            if stop_row is not None and first_row >= stop_row:
                continue
        with open(path, "rb") as f:
            t = hf.read_trailer(f)
            entries = hf.read_data_index(f, t)
        metas.append((path, region, t, entries))

    if split_bytes is None:
        split_bytes = _adaptive_split_bytes(
            sum(size for _, _, _, entries in metas for _, size, _ in entries),
            cores,
        )

    plan: list[tuple[str, str, str, list[tuple[int, int]]]] = []
    for path, region, t, entries in metas:
        first_rows = [hf.decode_key(k)[0] for _, _, k in entries]
        chunk: list[tuple[int, int]] = []
        acc = 0
        for i, (off, size, _key) in enumerate(entries):
            # block i holds rows in [first_rows[i], first_rows[i+1])
            if (
                start_row is not None
                and i + 1 < len(first_rows)
                and first_rows[i + 1] <= start_row
            ):
                continue
            if stop_row is not None and first_rows[i] >= stop_row:
                break
            chunk.append((off, size))
            acc += size
            if acc >= split_bytes:
                plan.append((path, region, t.compression or "", chunk))
                chunk, acc = [], 0
        if chunk:
            plan.append((path, region, t.compression or "", chunk))
    return plan


#: Separator between the indexed value and the base rowkey in a
#: value-index key. NUL sorts below every printable byte, so index keys
#: for one value are contiguous and [v+NUL, v+0x01) is an exact range
#: scan. Canonical rowkeys are hex and reference values are text, so
#: NUL never appears inside either — documented contract, matching
#: Phoenix's 0-byte column separators.
INDEX_KEY_SEP = "\x00"


def build_value_index(
    kv: DataFrame,
    qualifier: str,
    index_dir: str,
    boundaries: list[bytes] | None = None,
    compression: str | None = "snappy",
) -> list[dict]:
    """Phoenix-style GLOBAL secondary index, materialized: the
    (value → base rowkey) projection of one qualifier's cells as its
    own bulk-loaded sorted table — the stored artifact the
    q_kv_index_lookup docstring's scale story names. Index cell =
    (value ‖ NUL ‖ base_rowkey, family 'i', qualifier 'r',
    value = base rowkey): the composite key makes entries unique and
    clusters them by indexed value, so a lookup is an exact range scan.
    Built with the SAME machinery as the base table (executor-written
    region HFiles → doBulkLoad placement with boundary splits), so the
    index shares the table's operational contract: compaction,
    multi-level block indexes, blooms, block-range scan splits."""
    from pyspark.sql import functions as F

    idx = kv.filter(F.col("qualifier") == qualifier).select(
        F.concat(
            F.col("value"), F.lit(INDEX_KEY_SEP), F.col("rowkey")
        ).alias("rowkey"),
        F.lit("i").alias("family"),
        F.lit("r").alias("qualifier"),
        F.col("rowkey").alias("value"),
        F.substring(F.col("value"), 1, 1).alias("bucket"),
    )
    from hbase_bulkload_spark.operators.bulkload import region_align

    staging = os.path.join(index_dir, "_staging")
    manifest = write_region_hfiles(
        region_align(idx), staging, compression=compression
    )
    return do_bulk_load(
        [m["path"] for m in manifest],
        index_dir,
        boundaries if boundaries is not None else [b""],
        family="i",
        spark=kv.sparkSession,
        compression=compression,
    )


def index_seek(
    spark: SparkSession,
    index_dir: str,
    base_table_dir: str,
    value: str,
) -> DataFrame:
    """Index seek + multi-get — the scale form of the secondary-index
    lookup: an exact range scan of the stored value index (block-pruned
    by the index tree's key fences; [v+NUL, v+0x01) covers exactly the
    entries for ``value``) yields the matched base rowkeys, which fetch
    their rows from the base table via the distributed multi-get
    (bloom + index walk per key). Neither table is ever scanned in
    full, and nothing but file metadata touches the driver."""
    start = (value + INDEX_KEY_SEP).encode()
    stop = (value + "\x01").encode()
    from pyspark.sql import functions as F

    rks = scan_hfiles(
        spark, index_dir, start_row=start, stop_row=stop, columns=("value",)
    ).select(F.col("value").alias("rowkey"))
    return multi_get(spark, base_table_dir, rks)


def multi_get(
    spark: SparkSession,
    table_dir: str,
    rowkeys: Sequence[str] | DataFrame,
    binary: bool = False,
) -> DataFrame:
    """Distributed HBase multi-get (`Table.get(List<Get>)`) against a
    bulk-loaded table directory. The driver reads only metadata — one
    key range per file (trailer + file info, a few KB each, O(files))
    — and closure-broadcasts the (path, region, first, last) routing
    table; executors route their keys to the owning files by range and
    batch-get each file ONCE (`hfile_multi_get`: bloom, index tree and
    touched blocks cached across the batch — the block-cache analog).
    Absent rows cost one bloom check, no index or data IO.

    ``rowkeys`` is a list of canonical (string) keys or a DataFrame
    with a ``rowkey`` column — the DataFrame form makes this a keyed
    lookup JOIN against the HBase artifact: cells come back only for
    requested keys, the table is never scanned. Output matches
    scan_hfiles: (region, rowkey, family, qualifier, ts, value)."""
    import pandas as pd

    import glob as _glob

    files = sorted(
        _glob.glob(os.path.join(table_dir, "region-*", "*", "*.hfile"))
    )
    if not files:
        raise FileNotFoundError(f"no hfiles under {table_dir}")
    routing = []
    for path in files:
        region = os.path.basename(os.path.dirname(os.path.dirname(path)))
        first_row, last_row = hf.file_key_range(path)
        routing.append((path, region, first_row, last_row))

    if isinstance(rowkeys, DataFrame):
        keys_df = rowkeys.select("rowkey").distinct()
    else:
        keys_df = spark.createDataFrame(
            [(k,) for k in rowkeys], "rowkey string"
        ).distinct()

    cell_t = "binary" if binary else "string"
    out_schema = (
        f"region string, rowkey {cell_t}, family {cell_t}, "
        f"qualifier {cell_t}, ts long, value {cell_t}"
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # route by bisecting the sorted keyset against each file's
            # range: O(files · log keys + hits), never O(keys · files) —
            # file ranges may overlap (multiple HFiles per region), so
            # the per-file range probe, not a per-key bisect, is the
            # correct inversion
            ks = sorted(
                {
                    k if isinstance(k, bytes) else k.encode()
                    for k in pdf["rowkey"]
                }
            )
            per_file: dict[str, tuple[str, list[bytes]]] = {}
            for path, region, fr, lr in routing:
                lo = bisect_left(ks, fr)
                hi = bisect_right(ks, lr)
                if lo < hi:
                    per_file[path] = (region, ks[lo:hi])
            cols: dict[str, list] = {
                "region": [], "rowkey": [], "family": [],
                "qualifier": [], "ts": [], "value": [],
            }
            for path, (region, kbs) in sorted(per_file.items()):
                for r, fam, qual, ts, value in hf.hfile_multi_get(path, kbs):
                    cols["region"].append(region)
                    if binary:
                        cols["rowkey"].append(r)
                        cols["family"].append(fam)
                        cols["qualifier"].append(qual)
                        cols["value"].append(value)
                    else:
                        cols["rowkey"].append(r.decode())
                        cols["family"].append(fam.decode())
                        cols["qualifier"].append(qual.decode())
                        cols["value"].append(value.decode())
                    cols["ts"].append(ts)
            yield pd.DataFrame(cols)

    return keys_df.mapInPandas(fetch, out_schema)


def scan_hfiles(
    spark: SparkSession,
    table_dir: str,
    split_bytes: int | None = None,
    verify_checksums: bool = True,
    start_row: bytes | None = None,
    stop_row: bytes | None = None,
    binary: bool = False,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Distributed scan of a bulk-loaded table directory: the driver
    reads each file's trailer + root index (a few KB) and plans
    block-range splits of ~``split_bytes``; tasks decode their block
    subset and emit cells. Output: region, rowkey, family, qualifier,
    ts, value — or the subset named by ``columns`` (region/rowkey always
    kept): decode-side column pruning, the HFile analog of a parquet
    ReadSchema — a pruned column's slice+str cost is never paid.

    ``start_row``/``stop_row`` give HBase `Scan(startRow, stopRow)`
    semantics ([start, stop), row granularity): whole files outside the
    range are skipped from their metadata alone, blocks are pruned
    against the index's first-key fences before any data byte is read,
    and the residual cell filter runs in the decode task — the same
    prune-then-filter discipline as a parquet min/max scan."""
    plan = plan_block_splits(
        table_dir,
        split_bytes,
        start_row,
        stop_row,
        cores=spark.sparkContext.defaultParallelism,
    )

    # binary mode keeps raw cell bytes — required for tables written in
    # the reference-fidelity raw-key/positional modes, whose keys and
    # qualifiers are not UTF-8
    cell_t = "binary" if binary else "string"
    keep = (
        ("family", "qualifier", "ts", "value")
        if columns is None
        else tuple(c for c in ("family", "qualifier", "ts", "value") if c in columns)
    )
    _types = {"family": cell_t, "qualifier": cell_t, "ts": "long", "value": cell_t}
    out_schema = ", ".join(
        [f"region string, rowkey {cell_t}"] + [f"{c} {_types[c]}" for c in keep]
    )
    if not plan:  # fully pruned range
        return spark.createDataFrame([], out_schema)

    sdf = spark.createDataFrame(
        spark.sparkContext.parallelize(plan, len(plan)),
        "path string, region string, codec string, "
        "blocks array<struct<off: long, size: long>>",
    )

    def decode(batches):
        # mapInArrow: decode_cells_arrow already yields pa.Arrays, so
        # the batch goes back to the JVM as-is — the old mapInPandas
        # body round-tripped every cell through a pandas object array
        # (to_pandas here, re-Arrow in the serializer) for nothing
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        wants = {f"want_{c}": (c in keep) for c in ("family", "qualifier", "ts", "value")}
        for rb in batches:

            for task in rb.to_pylist():
                # cells never straddle blocks: concatenate a CHUNK's
                # payloads and decode once, vectorized — chunked at
                # DECODE_CHUNK_BYTES so decode scratch stays flat no
                # matter how large the (scale-adaptive) split is (see
                # _iter_block_chunks; hfile_datasource.read mirrors it)
                with open(task["path"], "rb") as f:
                    for chunk in _iter_block_chunks(task["blocks"]):
                        plain = b"".join(
                            hf._read_block(
                                f, b["off"], task["codec"] or None,
                                hf.DATA_MAGIC, verify_checksums,
                            )
                            for b in chunk
                        )
                        cols = hf.decode_cells_arrow(
                            plain, binary=binary, **wants
                        )
                        rowkey = cols["rowkey"]
                        mask = None
                        if start_row is not None:
                            lo = start_row if binary else start_row.decode()
                            mask = pc.greater_equal(rowkey, lo)
                        if stop_row is not None:
                            hi = stop_row if binary else stop_row.decode()
                            m2 = pc.less(rowkey, hi)
                            mask = m2 if mask is None else pc.and_(mask, m2)
                        n = len(rowkey)
                        # constant column via a C-level take, not a
                        # Python list multiply (chunks run to ~50k cells)
                        region_arr = pc.take(
                            pa.array([task["region"]], pa.string()),
                            pa.array(np.zeros(n, np.int32)),
                        )
                        arrays = [region_arr, rowkey] + [cols[c] for c in keep]
                        out = pa.RecordBatch.from_arrays(
                            arrays, ["region", "rowkey", *keep]
                        )
                        if mask is not None:
                            out = out.filter(mask)
                        yield out

    return sdf.mapInArrow(decode, out_schema)


def compact_region(
    family_dir: str,
    compression: str | None = "snappy",
    max_versions: int | None = None,
    ttl_min_ts: int | None = None,
) -> dict:
    """Region (major) compaction: k-way-merge every HFile in a region's
    family directory into one, applying the table semantics the
    reference's DDL encodes (`create_table.rb:1`): keep at most
    ``max_versions`` newest cells per (row, qualifier) and drop cells
    with ts < ``ttl_min_ts`` — the file-level face of the logical
    `q_versions_top3` / `q_ttl_filter` / `q_compaction` operators
    (`operators/semantics.py`). Successive bulk loads leave a region
    with overlapping files (exactly why region servers compact); the
    merged file restores the one-sorted-file invariant. Inputs must
    hold cells in HBase order — (row, qualifier, ts desc) — which is
    what every writer in this package emits. Replacement is
    write-to-temp + rename, so a crash leaves the originals intact."""
    import glob as _glob
    import heapq

    files = sorted(_glob.glob(os.path.join(family_dir, "*.hfile")))
    if not files:
        raise FileNotFoundError(f"no hfiles under {family_dir}")
    tmp = os.path.join(family_dir, "_compact.tmp")
    w = hf.HFileWriter(tmp, compression)
    dropped_versions = 0
    dropped_expired = 0
    merged = heapq.merge(
        *[hf.iter_hfile(p) for p in files],
        # HBase cell order: row, qualifier, newest ts first
        key=lambda c: (c[0], c[2], -c[3]),
    )
    current: tuple[bytes, bytes] | None = None
    n_versions = 0
    for row, fam, qual, ts, value in merged:
        if ttl_min_ts is not None and ts < ttl_min_ts:
            dropped_expired += 1
            continue
        if (row, qual) != current:
            current = (row, qual)
            n_versions = 0
        n_versions += 1
        if max_versions is not None and n_versions > max_versions:
            dropped_versions += 1
            continue
        w.add(row, fam, qual, ts, value)
    if w.entry_count:
        m = w.close()
    else:  # every cell expired: the compacted region holds no file
        w._f.close()
        os.unlink(tmp)
        m = {"path": None, "entry_count": 0, "n_blocks": 0}
    for p in files:
        os.unlink(p)
    final = None
    if m["path"] is not None:
        final = os.path.join(family_dir, "compacted-00000.hfile")
        os.rename(tmp, final)
    m["path"] = final
    m["n_input_files"] = len(files)
    m["dropped_versions"] = dropped_versions
    m["dropped_expired"] = dropped_expired
    return m


def compact_table(
    table_dir: str,
    compression: str | None = "snappy",
    max_versions: int | None = None,
    ttl_min_ts: int | None = None,
) -> list[dict]:
    """Major-compact every region family directory under ``table_dir``
    (see compact_region) — the table-wide pass a region server runs
    after repeated incremental bulk loads leave overlapping files."""
    import glob as _glob

    out = []
    for fam_dir in sorted(_glob.glob(os.path.join(table_dir, "region-*", "*"))):
        if os.path.isdir(fam_dir) and _glob.glob(os.path.join(fam_dir, "*.hfile")):
            m = compact_region(fam_dir, compression, max_versions, ttl_min_ts)
            m["family_dir"] = fam_dir
            out.append(m)
    return out


def bulkload_hfile_roundtrip(
    kv: DataFrame,
    work_dir: str,
    boundaries: list[bytes],
    family: str = "c",
    compression: str | None = "snappy",
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """The full op-7+9 dataflow: executor-written region HFiles →
    doBulkLoad placement (splitting any boundary-crossers) → distributed
    read-back of the loaded table. Returns the scanned cell frame."""
    spark = kv.sparkSession
    if os.path.exists(work_dir):
        shutil.rmtree(work_dir)
    staging = os.path.join(work_dir, "staging")
    table_dir = os.path.join(work_dir, "table")
    manifest = write_region_hfiles(kv, staging, compression=compression)
    do_bulk_load(
        [m["path"] for m in manifest],
        table_dir,
        boundaries,
        family=family,
        spark=spark,
        compression=compression,
    )
    return scan_hfiles(spark, table_dir, columns=columns)
