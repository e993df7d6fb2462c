"""The CLI importer entry points (cli.py) — the reference's user surface
(`sample_run.sh:1`: one run = <ImporterClass> <conf> <input> <output>).

Each format ingests the same records, so every run must produce the
identical cell multiset; the output directory must satisfy the bulk-load
contract (bucket-partitioned, per-file sorted, non-overlapping).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_spark import cli
from hbase_bulkload_spark.sources import records


@pytest.fixture(scope="module")
def inputs(spark, sf_dir, tmp_path_factory):
    """Materialize the four format fixtures once (shared cache dir)."""
    return {
        "text": records.delimited_lines_path(spark, sf_dir),
        "csv": records.csv_path(spark, sf_dir),
        "columnar": records.orc_path(spark, sf_dir),
        "avro": records.avro_path(spark, sf_dir),
    }


def _load_out(spark, path):
    return spark.read.parquet(path)


@pytest.mark.parametrize("fmt", ["text", "csv", "columnar", "avro"])
def test_cli_ingest_contract(spark, inputs, tmp_path, fmt):
    out = str(tmp_path / f"out_{fmt}")
    cli.ingest(spark, inputs[fmt], out, fmt=fmt, n_buckets=4)

    df = _load_out(spark, out)
    assert set(df.columns) == {"rowkey", "family", "qualifier", "value", "bucket"}
    # bucket-partitioned layout on disk
    assert any(d.startswith("bucket=") for d in os.listdir(out))
    assert df.count() > 0
    # every cell's bucket is the first hex char of its key
    bad = df.filter(F.substring("rowkey", 1, 1) != F.col("bucket")).count()
    assert bad == 0


def test_cli_formats_agree(spark, inputs, tmp_path):
    """text/csv/columnar/avro runs of the same records produce the same
    KV cells (the reference's four importers differ only in decode)."""
    cells = {}
    for fmt in ["csv", "columnar", "avro"]:
        out = str(tmp_path / f"agree_{fmt}")
        cli.ingest(spark, inputs[fmt], out, fmt=fmt, n_buckets=4)
        cells[fmt] = _load_out(spark, out)

    base = cells["csv"].select("rowkey", "qualifier", "value")
    for fmt in ["columnar", "avro"]:
        other = cells[fmt].select("rowkey", "qualifier", "value")
        assert base.exceptAll(other).count() == 0
        assert other.exceptAll(base).count() == 0


def test_cli_text_arity_gate(spark, inputs, tmp_path):
    """The text path drops malformed (8-field) rows — the mapper's
    skip-record branch (`BulkImporterFromText.java:56,68-70`)."""
    out = str(tmp_path / "out_text_gate")
    cli.ingest(spark, inputs["text"], out, fmt="text", n_buckets=4)
    n_keys = _load_out(spark, out).select("rowkey").distinct().count()

    wide = records.wide9(spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"))
    # valid = not malformed AND not null-z8 (concat_ws drops the null
    # field, making those lines 8-field too — records.py docstring).
    # Distinct key tuples, not row count: the synthetic lineitem carries
    # occasional duplicate (z0..z3) tuples and duplicates share a rowkey.
    n_valid_keys = (
        wide.filter(
            (F.col("_seq") % records.MALFORMED_MOD != 0)
            & (F.col("_seq") % records.NULL_MOD != 0)
        )
        .select("z0", "z1", "z2", "z3")
        .distinct()
        .count()
    )
    assert n_keys == n_valid_keys


def test_cli_generic_arity(spark, tmp_path):
    """The CLI is schema-generic, unlike the reference's hardcoded
    COLUMN_COUNT = 9 (`BulkImporterFromText.java:43`): a 3-column input
    with a 2-column key works end to end."""
    src = str(tmp_path / "nation3")
    (
        spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .select(
            F.col("n_nationkey").cast("string"),
            F.col("n_name"),
            F.col("n_regionkey").cast("string"),
        )
        .write.mode("overwrite")
        .csv(src)
    )
    out = str(tmp_path / "out_nation3")
    cli.ingest(spark, src, out, fmt="csv", n_columns=3, key_cols=[0, 2], n_buckets=4)
    df = _load_out(spark, out)
    n_nations = spark.read.parquet("/root/testdata/sf0.001/nation.parquet").count()
    assert df.select("rowkey").distinct().count() == n_nations
    # 2 key fields → 2 × 32-hex digests
    assert df.select(F.length("rowkey")).distinct().collect()[0][0] == 64
    # one cell per non-null column value
    n_vals = sum(
        spark.read.schema("z0 string,z1 string,z2 string")
        .csv(src)
        .select([F.count(c) for c in ["z0", "z1", "z2"]])
        .collect()[0]
    )
    assert df.count() == n_vals


def test_sorted_within_files(spark, inputs, tmp_path):
    """Per-file cell order: (rowkey, qualifier) non-decreasing — the
    PutSortReducer contract the HFile sink relies on."""
    out = str(tmp_path / "out_sorted")
    cli.ingest(spark, inputs["csv"], out, fmt="csv", n_buckets=4)
    df = spark.read.parquet(out).withColumn("_file", F.input_file_name())
    from pyspark.sql import Window

    w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
    prev = F.lag(F.concat_ws("\x00", "rowkey", "qualifier")).over(w)
    cur = F.concat_ws("\x00", "rowkey", "qualifier")
    violations = df.select((prev > cur).alias("bad")).filter("bad").count()
    assert violations == 0
