"""Bulk-load output invariants (SURVEY.md §5.2 item 3): within every
output partition keys are non-decreasing; bucket key-ranges are disjoint;
bucket assignment is total; written files are sorted and Snappy parquet —
the reference's HFile contract (`BulkImporterFromText.java:104-111`)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hbase_bulkload_spark.operators.bulkload import (
    bulkload_kv,
    bulkload_pipeline,
    region_align,
    write_bulkload,
)
from hbase_bulkload_spark.sources.records import RECORD_COLS, wide9

KEYS = RECORD_COLS[:4]


def _kv(spark, sf_dir):
    return bulkload_kv(wide9(spark, sf_dir), KEYS, RECORD_COLS)


def test_partitions_internally_sorted(spark, sf_dir):
    aligned = region_align(_kv(spark, sf_dir))

    def check(it):
        prev = None
        for row in it:
            cur = (row.bucket, row.rowkey, row.qualifier)
            assert prev is None or prev <= cur, (prev, cur)
            prev = cur
        yield {"ok": True}

    bad = aligned.rdd.mapPartitions(check).filter(lambda d: not d["ok"]).count()
    assert bad == 0


def test_pipeline_shape_equivalent_and_sorted(spark, sf_dir):
    """The shuffle-lean pipeline (wide-row exchange, unpivot after) must
    produce exactly the cell set of the KV-exchange shape, and keep every
    partition internally sorted."""
    pipe = bulkload_pipeline(wide9(spark, sf_dir), KEYS, RECORD_COLS)
    ref = region_align(_kv(spark, sf_dir)).select(*pipe.columns)
    assert pipe.exceptAll(ref).count() == 0
    assert ref.exceptAll(pipe).count() == 0

    def check(it):
        prev = None
        for row in it:
            cur = (row.bucket, row.rowkey, row.qualifier)
            assert prev is None or prev <= cur, (prev, cur)
            prev = cur
        yield {"ok": True}

    bad = pipe.rdd.mapPartitions(check).filter(lambda d: not d["ok"]).count()
    assert bad == 0


def test_bucket_ranges_disjoint(spark, sf_dir):
    stats = (
        _kv(spark, sf_dir)
        .groupBy("bucket")
        .agg(F.min("rowkey").alias("lo"), F.max("rowkey").alias("hi"))
        .orderBy("bucket")
        .collect()
    )
    assert len(stats) == 16
    for a, b in zip(stats, stats[1:]):
        assert a.hi < b.lo  # ranges ordered and non-overlapping


def test_write_bulkload_contract(spark, sf_dir, tmp_path):
    out = str(tmp_path / "bulkload_out")
    write_bulkload(_kv(spark, sf_dir), out)
    dirs = sorted(glob.glob(os.path.join(out, "bucket=*")))
    assert len(dirs) == 16
    for d in dirs[:4]:  # spot-check: files sorted by rowkey, snappy codec
        for f in glob.glob(os.path.join(d, "*.parquet")):
            t = pq.read_table(f, columns=["rowkey", "qualifier"])
            rk = t.column("rowkey").to_pylist()
            assert rk == sorted(rk)
            meta = pq.ParquetFile(f).metadata
            assert meta.row_group(0).column(0).compression == "SNAPPY"


def test_parallelism_floor(spark, tmp_path):
    """Floor semantics: a single-row-group scan gains one round-robin
    exchange up to defaultParallelism; an input already at >= cores/2
    partitions passes through UNTOUCHED (no exchange added)."""
    from hbase_bulkload_spark.datasets import parallelism_floor

    p = str(tmp_path / "one.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)
    assert narrow.rdd.getNumPartitions() == 1
    floored = parallelism_floor(spark, narrow)
    assert floored.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert floored.count() == 1000

    wide = spark.range(1000).repartition(spark.sparkContext.defaultParallelism)
    assert parallelism_floor(spark, wide) is wide

    # path mode measures ROW-GROUP splittability, not planned splits: a
    # many-row-group file is left untouched even though it is one file,
    # while the single-row-group file above floors regardless of how
    # many byte-range splits Spark would plan for it
    import pyarrow as pa
    import pyarrow.parquet as pq

    multi = str(tmp_path / "multi.parquet")
    pq.write_table(
        pa.table({"id": list(range(1000))}), multi, row_group_size=25
    )
    df_multi = spark.read.parquet(multi)
    assert parallelism_floor(spark, df_multi, path=multi) is df_multi
    floored2 = parallelism_floor(spark, spark.read.parquet(p), path=p)
    assert (
        floored2.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )
