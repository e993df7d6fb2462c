"""Golden-vector tests pinning key derivation byte-for-byte (hex form)
against the reference semantics (`Md5Utils.java:12-20`,
`RowKeyConverter.java:13-30`, `BulkImporterFromAvro.java:59`), computed
independently with Python hashlib (FIXTURES.md F6)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hbase_bulkload_spark.functions.keys import (
    composite_rowkey,
    hex_bucket,
    md5_hex,
    mod_bucket,
    reverse_key,
    salted_key,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_md5_golden(spark):
    rows = (
        spark.createDataFrame([("35218",), ("",), ("Alabama Power Co",)], ["v"])
        .select("v", md5_hex("v").alias("h"))
        .collect()
    )
    for r in rows:
        assert r.h == _md5(r.v), r.v
    assert _md5("") == "d41d8cd98f00b204e9800998ecf8427e"


def test_md5_null_hashes_as_empty(spark):
    row = spark.createDataFrame([(None,)], "v string").select(md5_hex("v").alias("h")).first()
    assert row.h == _md5("")


def test_composite_rowkey_golden(spark):
    fields = ("35218", "195", "Alabama Power Co", "AL")
    expected = "".join(_md5(f) for f in fields)
    assert len(expected) == 128  # KEY_WIDTH analog: 4 × 32 hex
    row = (
        spark.createDataFrame([fields], ["a", "b", "c", "d"])
        .select(composite_rowkey("a", "b", "c", "d").alias("k"))
        .first()
    )
    assert row.k == expected


def test_reverse_key(spark):
    row = spark.createDataFrame([("35218",)], ["v"]).select(reverse_key("v").alias("r")).first()
    assert row.r == "81253"


def test_mod_bucket_and_salt(spark):
    df = spark.createDataFrame([(35218,), (7,)], "v long")
    rows = df.select(
        mod_bucket("v").alias("b"),
        salted_key(mod_bucket("v"), F.col("v").cast("string")).alias("s"),
    ).collect()
    assert [r.b for r in rows] == [8, 7]
    assert [r.s for r in rows] == ["08|35218", "07|7"]


def test_hex_bucket_is_total_and_balanced(spark, sf_dir):
    from hbase_bulkload_spark.sources.records import wide9

    w = wide9(spark, sf_dir)
    buckets = (
        w.select(hex_bucket(composite_rowkey("z0", "z1", "z2", "z3")).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    assert len(buckets) == 16
    counts = [r["count"] for r in buckets]
    total = sum(counts)
    # uniform MD5 keys → every bucket within 3× of fair share
    assert min(counts) > total / 16 / 3
