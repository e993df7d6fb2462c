"""Command-line bulk-load entry points — the reference's user surface.

The reference is operated as four CLI tools, one per input format
(`BulkImporterFromText.java:164-168`, `BulkImporterFromCSVText.java:164-168`,
`BulkImporterFromRC.java:165-169`, `BulkImporterFromAvro.java:159-163`;
canonical invocation `sample_run.sh:1`):

    hadoop jar bulkimport.jar <ImporterClass> <hbase-site.xml> <input> <output>

This module is the Spark-native equivalent, one tool with a format flag:

    python -m hbase_bulkload_spark --format {text,csv,columnar,avro} \
        [--columns 9] [--key-cols 0,1,2,3] [--n-buckets 16] \
        [--sep $'\\x01'] INPUT OUTPUT

Per format, the pipeline is the reference lifecycle (SURVEY.md §3) as one
declarative plan: scan → arity/null validate → composite MD5 rowkey over
the key columns (`RowKeyConverter.java:13-30`) → wide→long KV unpivot
(one cell per column, family 'c') → hex-bucket partition → per-partition
sort → Snappy parquet, one sorted non-overlapping file per bucket — the
analog of the HFile directory handed to `doBulkLoad`. The `hbase-site.xml`
argument has no analog (no HBase cluster in scope); region count maps to
`--n-buckets`.

Deviations (documented, SURVEY.md §2.2/§2.14): key columns default to
0-3 for every format (the RC variant's out-of-bounds `value.get(20)` is
not reproduced); qualifiers are column names everywhere (the reference
mixes positional ints and field names).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOH = "\x01"  # hive default delimiter, BulkImporterFromText.java:54


def _cols(n: int) -> list[str]:
    return [f"z{i}" for i in range(n)]


def read_text(
    spark: SparkSession,
    path: str,
    n_columns: int,
    sep: str = SOH,
    observation=None,
) -> DataFrame:
    """Delimited-text scan + decode + arity gate (ops 1, 2, 10): keep a
    line iff it splits into exactly `n_columns` fields, like the mapper's
    `words.length == COLUMN_COUNT` check (`BulkImporterFromText.java:56`).

    ``observation`` (a `pyspark.sql.Observation`) attaches the
    skip-log side channel (`println("skipping record …")`,
    `BulkImporterFromText.java:68-70`) Spark-natively: input and
    surviving line counts are accumulated DURING the one scan — no
    second pass, no accumulator races (observed metrics are
    exactly-once per action)."""
    cols = _cols(n_columns)
    parts = F.split(F.col("value"), sep)
    lines = spark.read.text(path)
    if observation is not None:
        lines = lines.observe(observation, F.count(F.lit(1)).alias("n_input"))
    return (
        lines.select(parts.alias("p"))
        .filter(F.size("p") == n_columns)
        .select(*[F.col("p").getItem(i).alias(cols[i]) for i in range(n_columns)])
    )


def read_csv(
    spark: SparkSession, path: str, n_columns: int, observation=None
) -> DataFrame:
    """CSV scan (op 3) reproducing the reference mapper's dataflow
    exactly (`BulkImporterFromCSVText.java:54-56`): naive `split(",")`
    (no quoting — a quoted comma splits, as in the reference) followed
    by the strict arity gate `words.length == COLUMN_COUNT`. Java's
    `String.split` drops *trailing* empty strings (Spark's keeps them),
    reproduced by stripping trailing commas before the split — so a row
    whose last field is empty fails the gate and is skipped, exactly
    like the reference; that is why the CSV path drops NULL-in-last-
    column rows that the columnar/Avro importers keep (those skip null
    *fields*, not rows). Mid-row empty fields decode as empty strings
    and become cells, matching the reference's `p.addColumn`.

    Note `mode=DROPMALFORMED` on `spark.read.csv` was measured and
    rejected: malformed detection only fires for columns the parser
    actually materializes, so under column pruning (`df.count()`, key-
    only projections) the gate silently vanishes.
    """
    cols = _cols(n_columns)
    parts = F.split(F.regexp_replace(F.col("value"), ",+$", ""), ",", -1)
    lines = spark.read.text(path)
    if observation is not None:
        lines = lines.observe(observation, F.count(F.lit(1)).alias("n_input"))
    return (
        lines.select(parts.alias("p"))
        .filter(F.size("p") == n_columns)
        .select(*[F.col("p").getItem(i).alias(cols[i]) for i in range(n_columns)])
    )


def read_columnar(spark: SparkSession, path: str, fmt: str = "orc") -> DataFrame:
    """Columnar scan (op 4, the RCFile analog): ORC or Parquet — either
    native vectorized reader with pruning/pushdown, unlike the RC mapper
    which materializes every column (SURVEY.md §4.1)."""
    return spark.read.orc(path) if fmt == "orc" else spark.read.parquet(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro OCF scan (op 5): the sync-marker split reader — byte-range
    splits planned from per-file headers, Arrow-batched block decode,
    schema-generic like the reference's `schema.getFields()` walk
    (`BulkImporterFromAvro.java:55-57`). Intra-file parallel, so scan
    task count tracks data volume rather than file count."""
    from hbase_bulkload_spark.sources import avro_ocf

    return avro_ocf.scan_splits(spark, path)


def read_jsonl(spark: SparkSession, path: str, n_columns: int) -> DataFrame:
    """JSONL record scan (one JSON object per line, the web-corpus
    interchange format) with an explicit pinned all-string schema — no
    inference pass, so the read is one scan and column pruning stays
    effective; missing fields decode as nulls (and null key fields hash
    as md5(''), the same empty-field normalization as the Avro path)."""
    schema = ", ".join(f"{c} string" for c in _cols(n_columns))
    return spark.read.schema(schema).json(path)


def read_rcfile(spark: SparkSession, path: str, n_columns: int) -> DataFrame:
    """RCFile scan (op 4, the reference's actual wire format —
    `RCFileMapReduceInputFormat`, `BulkImporterFromRC.java:94-95`):
    byte-range splits from per-file headers, per-column decompression
    through the pure-Python layout codec."""
    from hbase_bulkload_spark.sources import rcfile

    return rcfile.scan_splits(spark, path, _cols(n_columns))


def ingest(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    fmt: str = "csv",
    n_columns: int = 9,
    key_cols: list[int] | None = None,
    n_buckets: int = 16,
    sep: str = SOH,
    fix_permissions: int | None = None,
    raw_binary_keys: bool = False,
    positional_qualifiers: bool = False,
    sink: str = "parquet",
    collect_metrics: bool = False,
) -> dict | None:
    """One importer run, end to end (the `run()` body of each reference
    entry point, SURVEY.md §3.1, as a single Spark plan).

    ``collect_metrics=True`` attaches `Observation`s so the run returns
    {n_input, n_valid, n_skipped} accumulated during the single pass —
    the reference's skip-log side channel without a second job (text/csv
    formats; the schema-gated formats have no row-skip path)."""
    from hbase_bulkload_spark.operators.bulkload import bulkload_kv, write_bulkload

    obs_in = obs_valid = None
    if collect_metrics and fmt in ("text", "csv"):
        from pyspark.sql import Observation

        obs_in, obs_valid = Observation(), Observation()

    if fmt == "text":
        df = read_text(spark, input_path, n_columns, sep=sep, observation=obs_in)
    elif fmt == "csv":
        df = read_csv(spark, input_path, n_columns, observation=obs_in)
    elif fmt == "columnar":
        df = read_columnar(spark, input_path)
    elif fmt == "avro":
        df = read_avro(spark, input_path)
    elif fmt == "rcfile":
        df = read_rcfile(spark, input_path, n_columns)
    elif fmt == "jsonl":
        df = read_jsonl(spark, input_path, n_columns)
    else:  # pragma: no cover - argparse choices gate this
        raise ValueError(f"unknown format {fmt!r}")

    if obs_valid is not None:
        df = df.observe(obs_valid, F.count(F.lit(1)).alias("n_valid"))

    cols = df.columns
    keys = [cols[i] for i in (key_cols or [0, 1, 2, 3])]
    kv = bulkload_kv(
        df,
        key_cols=keys,
        value_cols=cols,
        raw_binary_keys=raw_binary_keys,
        positional_qualifiers=positional_qualifiers,
    )
    if sink == "hfile":
        from hbase_bulkload_spark.operators.bulkload import region_align
        from hbase_bulkload_spark.operators.hfile_load import bulkload_to_table

        # region boundaries = the 16 hex-nibble buckets the key layer
        # emits (create_table.rb:1 pre-splits analogously on '0'..'9');
        # raw-key mode buckets on the digest's first nibble, so the
        # byte boundaries are the same fences over raw bytes
        boundaries = (
            [bytes([i << 4]) for i in range(16)]
            if raw_binary_keys
            else [format(i, "x").encode() for i in range(16)]
        )
        if raw_binary_keys:
            boundaries[0] = b""  # region 0 starts at the empty key
        bulkload_to_table(region_align(kv, n_buckets), output_path, boundaries)
    else:
        write_bulkload(kv, output_path, n_buckets=n_buckets)

    if fix_permissions is not None:  # op 8 post-processing (reference: 0o777)
        from hbase_bulkload_spark.sources.fsutil import set_permissions_recursive

        set_permissions_recursive(output_path, fix_permissions)

    if obs_in is not None:
        n_input = obs_in.get["n_input"]
        n_valid = obs_valid.get["n_valid"]
        metrics = {
            "n_input": n_input,
            "n_valid": n_valid,
            "n_skipped": n_input - n_valid,
        }
        # the reference's "skipping record" println, aggregated
        print(
            f"ingest: {n_input} records in, {n_valid} valid, "
            f"{metrics['n_skipped']} skipped",
            file=sys.stderr,
        )
        return metrics
    return None


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m hbase_bulkload_spark",
        description="Bulk-load ingest: scan, validate, derive keys, unpivot "
        "to KV cells, and write region-aligned sorted Snappy parquet.",
    )
    p.add_argument("input", help="input file or directory")
    p.add_argument("output", help="output directory (overwritten)")
    p.add_argument(
        "--format",
        choices=["text", "csv", "columnar", "avro", "rcfile", "jsonl"],
        default="csv",
        help="input format (default csv, the reference's canonical path; "
        "rcfile reads the RC importer's true wire format; jsonl is "
        "one-JSON-object-per-line with a pinned schema)",
    )
    p.add_argument("--columns", type=int, default=9, help="record arity (default 9)")
    p.add_argument(
        "--key-cols",
        default="0,1,2,3",
        help="comma-separated key column indexes (default 0,1,2,3)",
    )
    p.add_argument("--n-buckets", type=int, default=16, help="output buckets (default 16)")
    p.add_argument(
        "--sink",
        choices=["parquet", "hfile"],
        default="parquet",
        help="output format: region-aligned sorted Snappy parquet (the "
        "analytics-native default) or true HFile v3 files bulk-loaded "
        "into a 16-region table layout (the reference's artifact, "
        "HFileOutputFormat2 + doBulkLoad)",
    )
    p.add_argument("--sep", default=SOH, help="text-format field delimiter (default SOH)")
    p.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="Spark conf override, repeatable — the ToolRunner generic "
        "-D option surface (`BulkImporterFromCSVText.java:164-168`); "
        "runtime-mutable SQL confs apply even to a pre-existing session",
    )
    p.add_argument(
        "--raw-binary-keys",
        action="store_true",
        help="emit the reference's 64 raw digest bytes as a binary "
        "rowkey (RowKeyConverter.java:26-29) instead of 128-hex",
    )
    p.add_argument(
        "--positional-qualifiers",
        action="store_true",
        help="emit Bytes.toBytes(i) 4-byte big-endian column-position "
        "qualifiers (BulkImporterFromText.java:65) instead of names",
    )
    p.add_argument(
        "--fix-permissions",
        default=None,
        help="octal mode to chmod the output tree to (the reference "
        "forces 777, BulkImporterFromText.java:119-126; off by default)",
    )
    args = p.parse_args(argv)

    from hbase_bulkload_spark.session import get_spark

    overrides = {}
    for kv in args.conf:
        if "=" not in kv:
            p.error(f"--conf expects K=V, got {kv!r}")
        k, v = kv.split("=", 1)
        overrides[k] = v
    spark = get_spark("bulkload-cli", extra_conf=overrides)
    # getOrCreate ignores builder confs on an existing session; re-apply
    # the runtime-mutable ones so `--conf` behaves like ToolRunner -D
    # regardless of session reuse
    for k, v in overrides.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session — builder already tried
    ingest(
        spark,
        args.input,
        args.output,
        fmt=args.format,
        n_columns=args.columns,
        key_cols=[int(i) for i in args.key_cols.split(",")],
        n_buckets=args.n_buckets,
        sep=args.sep,
        fix_permissions=(
            int(args.fix_permissions, 8) if args.fix_permissions is not None else None
        ),
        raw_binary_keys=args.raw_binary_keys,
        positional_qualifiers=args.positional_qualifiers,
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
