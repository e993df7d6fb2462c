"""`spark.read.format("hfile")` — the HFile v3 codec as a first-class
Spark Python DataSource (pyspark.sql.datasource, Spark 4.x).

Where `operators.hfile_load.scan_hfiles` wires the distributed scan by
hand (parallelize a plan + mapInPandas), this registers the same codec
inside Catalyst's source framework, so the read IS a scan node:

- `partitions()` returns one `InputPartition` per ~split_bytes of
  block ranges — the planner creates exactly that many tasks (the
  DSv2 analog of parquet's split planning).
- `pushFilters()` receives the query's predicates; rowkey range
  predicates (`>=`, `>`, `<`, `<=`, `=`, and `startswith`) tighten the
  driver-side plan so whole files and blocks are pruned from metadata
  before any data byte is read. Every filter is reported back as
  unsupported, so Spark re-applies them post-scan — pruning is a
  performance contract here, correctness stays Spark's (the safe
  default for a range prune that inspects only block fences).
- `read()` yields Arrow RecordBatches (one per decoded block chunk),
  the vectorized path through the Python worker.

Registration is per-session and explicit:

    from hbase_bulkload_spark.sources.hfile_datasource import register
    register(spark)
    df = spark.read.format("hfile").load(table_dir)

The HFile layout itself lives in `sources.hfile`; the planning helper
is shared with the operator path (`operators.hfile_load.
plan_block_splits`), so both read paths prune identically.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)

_PRUNABLE = ("family", "qualifier", "ts", "value")


def _hfile_schema(binary: bool, keep: tuple[str, ...]) -> str:
    cell_t = "binary" if binary else "string"
    types = {"family": cell_t, "qualifier": cell_t, "ts": "long", "value": cell_t}
    return ", ".join(
        [f"region string, rowkey {cell_t}"] + [f"{c} {types[c]}" for c in keep]
    )


def _opt_binary(options) -> bool:
    """`.option("binary", "true")` keeps raw cell bytes — required for
    tables written in the reference-fidelity raw-key/positional modes,
    whose keys and qualifiers are not UTF-8 (same knob as
    `operators.hfile_load.scan_hfiles(binary=True)`)."""
    return str(options.get("binary", "false")).lower() == "true"


def _opt_columns(options) -> tuple[str, ...]:
    """`.option("columns", "value,ts")` — decode-side column pruning,
    the HFile analog of a parquet ReadSchema (same knob as
    `scan_hfiles(columns=...)`): a pruned column's per-cell slice +
    decode cost is never paid. region/rowkey are always kept."""
    if "columns" not in options:
        return _PRUNABLE
    want = {c.strip() for c in options["columns"].split(",")}
    unknown = want - set(_PRUNABLE) - {"region", "rowkey"}
    if unknown:
        raise ValueError(
            f"unknown columns {sorted(unknown)}; prunable: {_PRUNABLE}"
        )
    return tuple(c for c in _PRUNABLE if c in want)


class HFileScanPartition(InputPartition):
    def __init__(self, path: str, region: str, codec: str, blocks: list):
        self.path = path
        self.region = region
        self.codec = codec
        self.blocks = blocks


class HFileReader(DataSourceReader):
    def __init__(self, options):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError("format('hfile') requires .load(<table_dir>)")
        # split_bytes unset → scale-adaptive sizing (plan_block_splits
        # derives it from total data-block bytes; cores from
        # $SPARK_GRAFT_CPUS / os.cpu_count(), the DataSource API has no
        # SparkContext handle on the driver planning path).
        # CLUSTER DEPLOYMENT NOTE (r11 verdict): that cores fallback
        # sees only the DRIVER's cores, so on a small driver fronting a
        # big cluster the adaptive solve over-sizes splits toward the
        # 64 MiB ceiling — bounded and correct (~1.6 M tasks at 100 TB)
        # but coarser than ideal; set .option("split_bytes", ...) from
        # the cluster's (total cores × target tasks/core) when the
        # driver's core count is not representative.
        sb = options.get("split_bytes")
        self.split_bytes = int(sb) if sb is not None else None
        self.verify = str(options.get("verify_checksums", "true")).lower() == "true"
        self.binary = _opt_binary(options)
        self.keep = _opt_columns(options)
        self.start_row: bytes | None = None
        self.stop_row: bytes | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Harvest rowkey bounds for block-fence pruning; yield ALL
        filters back (Spark re-applies them), so pruning can use a
        superset range (e.g. `>` pruned as `>=`) without owning
        exactness."""

        def tighten_start(b: bytes) -> None:
            if self.start_row is None or b > self.start_row:
                self.start_row = b

        def tighten_stop(b: bytes) -> None:
            if self.stop_row is None or b < self.stop_row:
                self.stop_row = b

        for f in filters:
            if getattr(f, "attribute", None) == ("rowkey",):
                v = getattr(f, "value", None)
                if isinstance(v, str):
                    b = v.encode()
                    if isinstance(f, (GreaterThanOrEqual, GreaterThan)):
                        tighten_start(b)
                    elif isinstance(f, LessThan):
                        tighten_stop(b)
                    elif isinstance(f, LessThanOrEqual):
                        # [.., v] as a block prune: stop just past v
                        tighten_stop(b + b"\x00")
                    elif isinstance(f, EqualTo):
                        tighten_start(b)
                        tighten_stop(b + b"\x00")
                    elif isinstance(f, StringStartsWith):
                        tighten_start(b)
                        # stop = successor of the prefix: increment the
                        # last non-0xFF byte (dropping any 0xFF tail).
                        # An empty or all-0xFF prefix has NO successor —
                        # skip stop tightening entirely rather than use
                        # prefix+b'\xff', which is NOT a superset of the
                        # prefix range (rows at prefix+b'\xff...' would
                        # be physically pruned and unrecoverable by
                        # Spark's re-applied filter)
                        trimmed = b.rstrip(b"\xff")
                        if trimmed:
                            tighten_stop(trimmed[:-1] + bytes([trimmed[-1] + 1]))
            yield f  # never claimed: Spark keeps correctness

    def partitions(self) -> Sequence[InputPartition]:
        from hbase_bulkload_spark.operators.hfile_load import plan_block_splits

        return [
            HFileScanPartition(path, region, codec, blocks)
            for path, region, codec, blocks in plan_block_splits(
                self.table_dir,
                split_bytes=self.split_bytes,
                start_row=self.start_row,
                stop_row=self.stop_row,
            )
        ]

    def read(self, partition: HFileScanPartition):
        import pyarrow as pa

        from hbase_bulkload_spark.sources import hfile as hf

        cell_pa = pa.binary() if self.binary else pa.string()
        pa_types = {
            "family": cell_pa,
            "qualifier": cell_pa,
            "ts": pa.int64(),
            "value": cell_pa,
        }
        arrow_schema = pa.schema(
            [("region", pa.string()), ("rowkey", cell_pa)]
            + [(c, pa_types[c]) for c in self.keep]
        )
        import numpy as np
        import pyarrow.compute as pc

        from hbase_bulkload_spark.operators.hfile_load import (
            _iter_block_chunks,
        )

        with open(partition.path, "rb") as f:
            # cells never straddle blocks (writer rolls at row
            # boundaries), so a CHUNK's payloads concatenate into one
            # buffer and decode in a single vectorized pass. Chunked at
            # DECODE_CHUNK_BYTES (~2 MiB ≈ ~50k cells — the numpy/Arrow
            # setup amortizes, decode scratch stays flat) while the
            # partition itself is split_bytes (scale-adaptive since
            # r11, up to 64 MiB) of blocks.
            for chunk in _iter_block_chunks(partition.blocks):
                plain = b"".join(
                    hf._read_block(
                        f, off, partition.codec or None, hf.DATA_MAGIC,
                        self.verify,
                    )
                    for off, _size in chunk
                )
                cols = hf.decode_cells_arrow(
                    plain,
                    binary=self.binary,
                    want_family="family" in self.keep,
                    want_qualifier="qualifier" in self.keep,
                    want_ts="ts" in self.keep,
                    want_value="value" in self.keep,
                )
                n = len(cols["rowkey"])
                # constant column via a C-level take, not a Python list
                # multiply
                region_arr = pc.take(
                    pa.array([partition.region], pa.string()),
                    pa.array(np.zeros(n, np.int32)),
                )
                yield pa.RecordBatch.from_arrays(
                    [region_arr, cols["rowkey"]] + [cols[c] for c in self.keep],
                    schema=arrow_schema,
                )


class HFileCommit(WriterCommitMessage):
    def __init__(self, manifest: list[dict]):
        self.manifest = manifest


class HFileSinkWriter(DataSourceArrowWriter):
    """`df.write.format("hfile").save(dir)` — the `HFileOutputFormat2`
    half of the reference's sink (BulkImporterFromText.java:108-111):
    each task streams its partition of the region-aligned KV contract
    (rowkey, family, qualifier, value, bucket — sorted within
    partitions by (bucket, rowkey, qualifier), i.e.
    `operators.bulkload.region_align` output) into one HFile per
    bucket; `commit()` writes a `_MANIFEST.json` + `_SUCCESS` on the
    driver (the two-phase-commit contract: files from aborted attempts
    are never listed). Placement into a region layout stays a separate
    step (`operators.hfile_load.do_bulk_load`), exactly as the
    reference separates job output from `doBulkLoad`."""

    REQUIRED = ("rowkey", "family", "qualifier", "value", "bucket")

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('hfile') write requires .save(<dir>)")
        missing = [c for c in self.REQUIRED if c not in schema.fieldNames()]
        if missing:
            raise ValueError(
                f"hfile sink needs the KV contract columns; missing {missing}"
            )
        self.compression = options.get("compression", "snappy")
        if self.compression in ("none", ""):
            self.compression = None
        self.ts = int(options.get("ts", 0))

    def write(self, iterator) -> "HFileCommit":
        # the DataSource API hands Arrow record batches — feed them to
        # the arrow executor body directly (round 7; the former
        # to_pandas() hop materialized every cell as a Python object)
        from hbase_bulkload_spark.operators.hfile_load import (
            task_file_label,
            write_partition_cells_arrow,
        )

        os.makedirs(self.path, exist_ok=True)
        manifest = write_partition_cells_arrow(
            iterator,
            self.path,
            task_file_label(),  # attempt-unique: speculative-safe
            self.compression,
            self.ts,
        )
        return HFileCommit(manifest)

    def commit(self, messages) -> None:
        import glob as _glob
        import json

        manifest = [m for msg in messages for m in msg.manifest]
        # sweep orphans: attempt-unique names mean a failed or losing
        # speculative attempt leaves a file the committed manifest never
        # references — delete it so directory globbers (not just
        # manifest readers) see only committed files. BEST-EFFORT, not
        # an invariant: attempts write under .tmp names and rename only
        # on task completion (see write_partition_cells_arrow), so the
        # remaining race is one rename instant — a zombie attempt that
        # completes AFTER this glob can still leave one orphan, and the
        # sweep assumes this job owns the directory (concurrent writers
        # to one output dir are outside the sink's contract, as with
        # Spark's own file sinks).
        listed = {m["path"] for m in manifest}
        for p in _glob.glob(os.path.join(self.path, "part-*.hfile")):
            if p not in listed:
                os.remove(p)
        for p in _glob.glob(os.path.join(self.path, "part-*.hfile.tmp")):
            try:  # straggler temp files from dead attempts
                os.remove(p)
            except OSError:
                pass
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        for msg in messages:
            if msg is None:
                continue
            for m in msg.manifest:
                try:
                    os.remove(m["path"])
                except OSError:
                    pass


class HFileDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hfile"

    def schema(self) -> str:
        return _hfile_schema(_opt_binary(self.options), _opt_columns(self.options))

    def reader(self, schema) -> HFileReader:
        return HFileReader(self.options)

    def writer(self, schema, overwrite: bool) -> HFileSinkWriter:
        path = self.options.get("path")
        if overwrite:
            import shutil

            if path and os.path.exists(path):
                shutil.rmtree(path)
        elif path and os.path.exists(os.path.join(path, "_SUCCESS")):
            # append semantics are NOT implemented (commit() would
            # delist the prior write's files from _MANIFEST.json);
            # reject instead of silently clobbering
            raise ValueError(
                "format('hfile') supports only mode('overwrite') onto an "
                "existing table staging dir; append would delist prior files"
            )
        return HFileSinkWriter(self.options, schema)


def register(spark) -> None:
    """Idempotent per-session registration of format('hfile') (also
    enables Python-source filter pushdown, off by default in 4.x)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(HFileDataSource)
