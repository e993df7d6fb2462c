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
    """Materialize the format fixtures once (shared cache dir)."""
    jsonl = str(tmp_path_factory.mktemp("fix") / "records_jsonl")
    records.wide9(spark, sf_dir).select(*records.RECORD_COLS).coalesce(
        2
    ).write.mode("overwrite").json(jsonl)
    return {
        "text": records.delimited_lines_path(spark, sf_dir),
        "csv": records.csv_path(spark, sf_dir),
        "columnar": records.orc_path(spark, sf_dir),
        "avro": records.avro_path(spark, sf_dir),
        "rcfile": records.rcfile_path(spark, sf_dir),
        "jsonl": jsonl,
    }


def _load_out(spark, path):
    return spark.read.parquet(path)


@pytest.mark.parametrize("fmt", ["text", "csv", "columnar", "avro", "rcfile", "jsonl"])
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
    """columnar/avro runs of the same records produce identical KV
    cells; csv agrees on every row whose last field is non-null. The
    difference is reference-faithful: the CSV mapper's Java
    `split(",")` drops trailing empty strings, so a NULL-z8 row fails
    its arity gate and is skipped wholesale, while the columnar/Avro
    importers keep the row and skip only the null *field*."""
    cells = {}
    for fmt in ["csv", "columnar", "avro", "rcfile", "jsonl"]:
        out = str(tmp_path / f"agree_{fmt}")
        cli.ingest(spark, inputs[fmt], out, fmt=fmt, n_buckets=4)
        cells[fmt] = _load_out(spark, out).select("rowkey", "qualifier", "value")

    col, avro, csv = cells["columnar"], cells["avro"], cells["csv"]
    assert col.exceptAll(avro).count() == 0
    assert avro.exceptAll(col).count() == 0
    rc = cells["rcfile"]
    assert col.exceptAll(rc).count() == 0
    assert rc.exceptAll(col).count() == 0
    # csv == columnar restricted to rows that kept their z8 cell
    with_z8 = col.filter(F.col("qualifier") == "z8").select("rowkey").distinct()
    expected = col.join(with_z8, "rowkey")
    assert csv.exceptAll(expected).count() == 0
    assert expected.exceptAll(csv).count() == 0


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


def test_cli_csv_arity_gate(spark, tmp_path):
    """The CSV path enforces the reference's strict arity gate
    (`split(",").length == COLUMN_COUNT`, BulkImporterFromCSVText.java:55-56)
    with Java split semantics: short rows, over-long rows, AND rows
    whose trailing field is empty (Java's split drops trailing empties)
    are skipped — never padded with nulls, which would ingest
    md5("")-keyed records the reference rejects."""
    src = str(tmp_path / "csv_gate_src")
    os.makedirs(src)
    with open(os.path.join(src, "part.csv"), "w") as fh:
        fh.write("a1,b1,c1\n")          # valid
        fh.write("a2,b2\n")             # short -> dropped
        fh.write("a3,b3,c3,d3\n")       # long -> dropped
        fh.write("a4,,c4\n")            # mid-row empty -> kept, z1 == ""
        fh.write("a5,b5,\n")            # trailing empty -> dropped (Java)
    df = cli.read_csv(spark, src, 3)
    rows = {r.z0: r for r in df.collect()}
    assert set(rows) == {"a1", "a4"}
    assert rows["a4"].z1 == ""  # empty string, not null (reference keeps "")

    out = str(tmp_path / "csv_gate_out")
    cli.ingest(spark, src, out, fmt="csv", n_columns=3, key_cols=[0], n_buckets=2)
    keys = _load_out(spark, out).select("rowkey").distinct().count()
    assert keys == 2  # only the two valid rows produce rowkeys


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


def test_cli_reference_fidelity_flags(spark, tmp_path):
    """--raw-binary-keys + --positional-qualifiers produce cells a
    legacy consumer of the reference reads unchanged: binary 64-byte
    rowkeys (RowKeyConverter.java:26-29), Bytes.toBytes(i) qualifiers
    (BulkImporterFromText.java:65), bucket = first hex nibble."""
    import hashlib

    src = str(tmp_path / "fid_src")
    os.makedirs(src)
    with open(os.path.join(src, "p.csv"), "w") as fh:
        fh.write("35218,195,Alabama Power Co,AL,Bundled\n")
    out = str(tmp_path / "fid_out")
    cli.ingest(
        spark, src, out, fmt="csv", n_columns=5, n_buckets=16,
        raw_binary_keys=True, positional_qualifiers=True,
    )
    df = _load_out(spark, out)
    rows = df.collect()
    expected_key = b"".join(
        hashlib.md5(f.encode()).digest()
        for f in ("35218", "195", "Alabama Power Co", "AL")
    )
    assert len(rows) == 5
    for r in rows:
        assert bytes(r.rowkey) == expected_key
        assert r.bucket == format(expected_key[0] >> 4, "x")
    assert {bytes(r.qualifier) for r in rows} == {
        bytes([0, 0, 0, i]) for i in range(5)
    }


def test_cli_fidelity_hfile_sink_binary_scan(spark, tmp_path):
    """Reference-fidelity cells through the HFile sink and back: raw
    64-byte rowkeys and positional qualifiers are not UTF-8, so the
    read-back uses the binary scan mode and must recover the exact
    reference bytes."""
    import hashlib

    from hbase_bulkload_spark.operators.hfile_load import scan_hfiles

    src = str(tmp_path / "fidh_src")
    os.makedirs(src)
    with open(os.path.join(src, "p.csv"), "w") as fh:
        fh.write("35218,195,Alabama Power Co,AL,Bundled\n")
        fh.write("10000,42,Example Utility,TX,Delivery\n")
    out = str(tmp_path / "fidh_out")
    cli.ingest(
        spark, src, out, fmt="csv", n_columns=5, n_buckets=16,
        raw_binary_keys=True, positional_qualifiers=True, sink="hfile",
    )
    got = scan_hfiles(spark, out, binary=True).collect()
    assert len(got) == 10  # 2 rows x 5 cells
    want_keys = {
        b"".join(
            hashlib.md5(f.encode()).digest()
            for f in ("35218", "195", "Alabama Power Co", "AL")
        ),
        b"".join(
            hashlib.md5(f.encode()).digest()
            for f in ("10000", "42", "Example Utility", "TX")
        ),
    }
    assert {bytes(r.rowkey) for r in got} == want_keys
    assert {bytes(r.qualifier) for r in got} == {
        bytes([0, 0, 0, i]) for i in range(5)
    }
    # values decode as the original fields
    vals = {bytes(r.value).decode() for r in got}
    assert "Alabama Power Co" in vals and "Delivery" in vals


def test_cli_conf_passthrough(spark, tmp_path):
    """--conf K=V lands in the session (the ToolRunner -D generic
    option surface, BulkImporterFromCSVText.java:164-168)."""
    src = str(tmp_path / "conf_src")
    os.makedirs(src)
    with open(os.path.join(src, "p.csv"), "w") as fh:
        fh.write("a,b,c\n")
    out = str(tmp_path / "conf_out")
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        rc = cli.main([
            src, out, "--format", "csv", "--columns", "3",
            "--key-cols", "0", "--n-buckets", "2",
            "--conf", "spark.sql.shuffle.partitions=7",
        ])
        assert rc == 0
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        assert _load_out(spark, out).count() == 3
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)


def test_ingest_metrics_one_pass(spark, inputs, tmp_path):
    """collect_metrics attaches Observations: input/valid/skipped counts
    accumulate during the single ingest pass (the reference's
    "skipping record" println as exactly-once observed metrics) and must
    reconcile with the written output."""
    out = str(tmp_path / "obs_out")
    m = cli.ingest(
        spark, inputs["text"], out, fmt="text", n_buckets=4, collect_metrics=True
    )
    assert m is not None and m["n_input"] > 0
    assert m["n_input"] == m["n_valid"] + m["n_skipped"]
    assert m["n_skipped"] > 0  # the fixture plants malformed rows
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    wide = records.wide9(spark, sf)
    n_valid_rows = wide.filter(
        (F.col("_seq") % records.MALFORMED_MOD != 0)
        & (F.col("_seq") % records.NULL_MOD != 0)
    ).count()
    assert m["n_valid"] == n_valid_rows
    # duplicate (z0..z3) tuples share a rowkey, so distinct keys ≤ valid
    distinct_keys = _load_out(spark, out).select("rowkey").distinct().count()
    assert distinct_keys <= m["n_valid"]
