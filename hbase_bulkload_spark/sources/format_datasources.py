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
count tracks data volume, not file count. `read()` yields one Arrow
RecordBatch per split.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_AVRO_TO_SPARK = {
    "string": "string",
    "int": "long",
    "long": "long",
    "float": "double",
    "double": "double",
    "boolean": "boolean",
    "bytes": "binary",
}


def _glob_files(path: str, ext: str) -> list[str]:
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(path, f"*{ext}")))
    if not files:
        raise FileNotFoundError(f"no {ext} files under {path}")
    return files


class _RangeSplit(InputPartition):
    def __init__(self, path, start, end, data_start, sync_hex, codec):
        self.path = path
        self.start = start
        self.end = end
        self.data_start = data_start
        self.sync_hex = sync_hex
        self.codec = codec


class AvroOcfReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('avro_ocf') requires .load(<dir>)")
        self.split_size = int(options.get("split_size", 128 << 20))

    def partitions(self) -> Sequence[InputPartition]:
        from hbase_bulkload_spark.sources import avro_ocf as ao

        plan = []
        for p in _glob_files(self.path, ".avro"):
            _s, sync, data_start, fsize, codec = ao.header_info(p)
            b = data_start
            while b < fsize:
                e = min(b + self.split_size, fsize)
                plan.append(_RangeSplit(p, b, e, data_start, sync.hex(), codec))
                b = e
        return plan

    def read(self, part: _RangeSplit):
        import pyarrow as pa

        from hbase_bulkload_spark.sources import avro_ocf as ao

        schema, *_ = ao.header_info(part.path)
        types = ao._field_types(schema)
        names = [f["name"] for f in schema["fields"]]
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

        def t(typ):
            if isinstance(typ, list):  # nullable union
                typ = next(x for x in typ if x != "null")
            return _AVRO_TO_SPARK[typ]

        return ", ".join(f"{f['name']} {t(f['type'])}" for f in schema["fields"])

    def reader(self, schema) -> AvroOcfReader:
        return AvroOcfReader(self.options)


class RCFileReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('rcfile') requires .load(<dir>)")
        self.split_size = int(options.get("split_size", 128 << 20))
        self.names = options["names"].split(",") if "names" in options else None

    def partitions(self) -> Sequence[InputPartition]:
        from hbase_bulkload_spark.sources import rcfile as rc

        plan = []
        for p in _glob_files(self.path, ".rc"):
            _n, codec, sync, data_start, fsize = rc.header_info(p)
            b = data_start
            while b < fsize:
                e = min(b + self.split_size, fsize)
                plan.append(_RangeSplit(p, b, e, data_start, sync.hex(), codec or ""))
                b = e
        return plan

    def read(self, part: _RangeSplit):
        import pyarrow as pa

        from hbase_bulkload_spark.sources import rcfile as rc

        n_cols, *_ = rc.header_info(part.path)
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
