"""The Avro OCF and RCFile codecs as first-class Spark Python
DataSources (pyspark.sql.datasource, Spark 4.x):

    from hbase_bulkload_spark.sources.format_datasources import register
    register(spark)
    spark.read.format("avro_ocf").load(dir_of_avro_files)
    spark.read.format("rcfile").option("names", "z0,...").load(dir)

Same codecs as `sources.avro_ocf` / `sources.rcfile` (the operator
paths used by q_scan_avro / q_scan_rcfile), lifted into Catalyst's
source framework: `schema()` is inferred driver-side from one file
header (Avro carries its schema; RCFile stores only a column count, so
names come from the `names` option or default to `c0..cN`), and
`partitions()` plans the same sync-anchored byte-range splits — task
count tracks data volume, not file count. Each split carries the
header facts it needs (sync marker, data offset, codec, types/width),
so `read()` does zero extra I/O before decoding, and yields one Arrow
RecordBatch per split.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _glob_files(path: str, ext: str) -> list[str]:
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(path, f"*{ext}")))
    if not files:
        raise FileNotFoundError(f"no {ext} files under {path}")
    return files


class _RangeSplit(InputPartition):
    """One byte-range split plus the per-file header facts the decode
    task needs — all picklable, so `read()` opens the data file cold."""

    def __init__(self, path, start, end, data_start, sync_hex, codec, meta):
        self.path = path
        self.start = start
        self.end = end
        self.data_start = data_start
        self.sync_hex = sync_hex
        self.codec = codec
        self.meta = meta  # avro: (names, types); rcfile: n_cols


def _plan_byte_splits(
    path: str,
    ext: str,
    header_fn: Callable[[str], tuple],
    split_size: int | None,
) -> list[_RangeSplit]:
    """Shared split planner for both sync-anchored container formats:
    one tiny header read per file, then ceil(size/split_size) ranges —
    the same protocol as the operator scans' planners. ``None`` sizes
    splits adaptively from total bytes and the session's parallelism
    (Spark's own maxSplitBytes policy — see sources.split_planning)."""
    headers = [(p, header_fn(p)) for p in _glob_files(path, ext)]
    if split_size is None:
        from pyspark.sql import SparkSession

        from hbase_bulkload_spark.sources.split_planning import adaptive_split_size

        active = SparkSession.getActiveSession()
        cores = (
            active.sparkContext.defaultParallelism
            if active is not None
            else (os.cpu_count() or 8)
        )
        total = sum(h[2] - h[1] for _, h in headers)
        split_size = adaptive_split_size(total, cores)
    plan = []
    for p, (sync, data_start, fsize, codec, meta) in headers:
        b = data_start
        while b < fsize:
            e = min(b + split_size, fsize)
            plan.append(_RangeSplit(p, b, e, data_start, sync.hex(), codec, meta))
            b = e
    return plan


class AvroOcfReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('avro_ocf') requires .load(<dir>)")
        from hbase_bulkload_spark.sources import avro_ocf as ao

        sz = options.get("split_size")
        self.split_size = int(sz) if sz is not None else None

    def partitions(self) -> Sequence[InputPartition]:
        from hbase_bulkload_spark.sources import avro_ocf as ao

        def header(p):
            schema, sync, data_start, fsize, codec = ao.header_info(p)
            names = [f["name"] for f in schema["fields"]]
            types = ao._field_types(schema)
            return sync, data_start, fsize, codec, (names, types)

        return _plan_byte_splits(self.path, ".avro", header, self.split_size)

    def read(self, part: _RangeSplit):
        import pyarrow as pa

        from hbase_bulkload_spark.sources import avro_ocf as ao

        names, types = part.meta
        rows = list(
            ao.iter_ocf_range(
                part.path,
                part.start,
                part.end,
                part.data_start,
                bytes.fromhex(part.sync_hex),
                types,
                part.codec,
            )
        )
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        yield pa.RecordBatch.from_arrays(
            [pa.array(list(c)) for c in cols], names=names
        )


class AvroOcfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "avro_ocf"

    def schema(self) -> str:
        from hbase_bulkload_spark.sources import avro_ocf as ao

        schema, *_ = ao.header_info(_glob_files(self.options["path"], ".avro")[0])
        return ", ".join(
            f"{f['name']} {ao.spark_type(f['type'])}" for f in schema["fields"]
        )

    def reader(self, schema) -> AvroOcfReader:
        return AvroOcfReader(self.options)


class RCFileReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('rcfile') requires .load(<dir>)")
        from hbase_bulkload_spark.sources import rcfile as rc

        sz = options.get("split_size")
        self.split_size = int(sz) if sz is not None else None
        self.names = options["names"].split(",") if "names" in options else None

    def partitions(self) -> Sequence[InputPartition]:
        from hbase_bulkload_spark.sources import rcfile as rc

        def header(p):
            n_cols, codec, sync, data_start, fsize = rc.header_info(p)
            return sync, data_start, fsize, codec or "", n_cols

        return _plan_byte_splits(self.path, ".rc", header, self.split_size)

    def read(self, part: _RangeSplit):
        import pyarrow as pa

        from hbase_bulkload_spark.sources import rcfile as rc

        n_cols = part.meta
        rows = list(
            rc.iter_rcfile_range(
                part.path,
                part.start,
                part.end,
                part.data_start,
                bytes.fromhex(part.sync_hex),
                n_cols,
                part.codec or None,
            )
        )
        cols = list(zip(*rows)) if rows else [[] for _ in range(n_cols)]
        yield pa.RecordBatch.from_arrays(
            [pa.array(list(c), type=pa.string()) for c in cols],
            names=self.names or [f"c{i}" for i in range(n_cols)],
        )


class RCFileDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rcfile"

    def schema(self) -> str:
        from hbase_bulkload_spark.sources import rcfile as rc

        n_cols, *_ = rc.header_info(_glob_files(self.options["path"], ".rc")[0])
        names = (
            self.options["names"].split(",")
            if "names" in self.options
            else [f"c{i}" for i in range(n_cols)]
        )
        if len(names) != n_cols:
            raise ValueError(f"{n_cols} columns in file, {len(names)} names given")
        return ", ".join(f"{n} string" for n in names)

    def reader(self, schema) -> RCFileReader:
        return RCFileReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration of both formats."""
    spark.dataSource.register(AvroOcfDataSource)
    spark.dataSource.register(RCFileDataSource)
