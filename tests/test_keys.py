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


def test_raw_binary_rowkey_golden(spark):
    """Reference-fidelity opt-in (`RowKeyConverter.java:26-29`): the
    rowkey is the 64 RAW digest bytes, byte-identical to
    makeRowKey(f1..f4) computed independently with hashlib."""
    from hbase_bulkload_spark.functions.keys import raw_binary_rowkey

    fields = ("35218", "195", "Alabama Power Co", "AL")
    expected = b"".join(hashlib.md5(f.encode()).digest() for f in fields)
    row = (
        spark.createDataFrame([fields], "f1 string, f2 string, f3 string, f4 string")
        .select(raw_binary_rowkey("f1", "f2", "f3", "f4").alias("k"))
        .first()
    )
    assert bytes(row.k) == expected
    assert len(bytes(row.k)) == 64  # KEY_WIDTH = 4 * MD5_LENGTH


def test_positional_qualifier_bytes_golden():
    """`Bytes.toBytes(i)` is a 4-byte big-endian int
    (`BulkImporterFromText.java:65`)."""
    from hbase_bulkload_spark.functions.keys import positional_qualifier_bytes

    assert positional_qualifier_bytes(0) == b"\x00\x00\x00\x00"
    assert positional_qualifier_bytes(2) == b"\x00\x00\x00\x02"
    assert positional_qualifier_bytes(255) == b"\x00\x00\x00\xff"
    assert positional_qualifier_bytes(256) == b"\x00\x00\x01\x00"


def test_bulkload_kv_reference_fidelity(spark):
    """bulkload_kv with both fidelity flags reproduces the reference's
    cell bytes: 64-byte binary rowkey, positional binary qualifiers,
    and a bucket equal to the key's first hex nibble."""
    from hbase_bulkload_spark.operators.bulkload import bulkload_kv

    df = spark.createDataFrame(
        [("35218", "195", "Alabama Power Co", "AL", "Bundled")],
        "z0 string, z1 string, z2 string, z3 string, z4 string",
    )
    kv = bulkload_kv(
        df,
        key_cols=["z0", "z1", "z2", "z3"],
        value_cols=["z0", "z1", "z2", "z3", "z4"],
        raw_binary_keys=True,
        positional_qualifiers=True,
    )
    rows = kv.collect()
    expected_key = b"".join(
        hashlib.md5(f.encode()).digest()
        for f in ("35218", "195", "Alabama Power Co", "AL")
    )
    assert len(rows) == 5
    quals = set()
    for r in rows:
        assert bytes(r.rowkey) == expected_key
        assert r.bucket == format(expected_key[0] >> 4, "x")
        quals.add(bytes(r.qualifier))
    assert quals == {bytes([0, 0, 0, i]) for i in range(5)}
