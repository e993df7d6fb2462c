"""format('avro_ocf') / format('rcfile') Python DataSources must read
the same rows as the operator-path scans, with schema inferred from
the file headers and split-planned task counts."""

from __future__ import annotations

import pytest

from hbase_bulkload_spark.sources import records
from hbase_bulkload_spark.sources.format_datasources import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def test_avro_ocf_datasource_matches_operator(spark, sf_dir):
    path = records.avro_path(spark, sf_dir)
    ds = spark.read.format("avro_ocf").load(path)
    op = records.scan_avro(spark, sf_dir)
    assert ds.schema == op.schema
    assert sorted(map(tuple, ds.collect())) == sorted(map(tuple, op.collect()))


def test_rcfile_datasource_matches_operator(spark, sf_dir):
    path = records.rcfile_path(spark, sf_dir)
    names = ",".join(records.RECORD_COLS)
    ds = spark.read.format("rcfile").option("names", names).load(path)
    op = records.scan_rcfile(spark, sf_dir)
    assert ds.schema == op.schema
    assert sorted(map(tuple, ds.collect())) == sorted(map(tuple, op.collect()))


def test_rcfile_default_names_and_split_knob(spark, sf_dir):
    path = records.rcfile_path(spark, sf_dir)
    ds = spark.read.format("rcfile").load(path)
    assert ds.columns[0] == "c0" and len(ds.columns) == records.COLUMN_COUNT
    many = (
        spark.read.format("rcfile").option("split_size", 64 << 10).load(path)
    )
    assert many.rdd.getNumPartitions() >= ds.rdd.getNumPartitions()
    assert many.count() == ds.count()


def test_rcfile_name_count_mismatch_rejected(spark, sf_dir):
    path = records.rcfile_path(spark, sf_dir)
    with pytest.raises(Exception, match="names"):
        spark.read.format("rcfile").option("names", "a,b").load(path).schema
