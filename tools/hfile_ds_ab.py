"""Phase decomposition of the two HFile bulk-load round-trip keys
(round-10, verdict item 3 follow-up): q_bulkload_hfile_ds measured
~2x its operator-path sibling in round 9, but only in a throttled(x4.2)
window with no idle capture. This tool times each phase of BOTH keys
separately in one session — pipeline+write, bulk-load placement,
read-back+summary — so the residual cost has an address instead of a
guess.

    python tools/hfile_ds_ab.py [sf_dir] [n_runs]

Prints one JSON line: per-key per-phase min-of-n seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_bulkload_spark.session import get_spark  # noqa: E402


def run_once(spark, sf_dir: str) -> dict:
    from hbase_bulkload_spark.operators import hfile_load as hl
    from hbase_bulkload_spark.queries.ingest import (
        KEY_COLS,
        RECORD_COLS,
        _hfile_bucket_summary,
        bulkload_pipeline,
        oracle_safe,
    )
    from hbase_bulkload_spark.sources import records
    from hbase_bulkload_spark.sources.hfile_datasource import register

    oracle_safe(spark)
    register(spark)
    scratch = "/dev/shm" if os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()
    boundaries = [format(i, "x").encode() for i in range(16)]
    out: dict[str, float] = {}

    def phase(name: str, fn) -> None:
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 3)

    # --- DataSource path ------------------------------------------------
    work = os.path.join(scratch, "hfile_ab_ds")
    if os.path.exists(work):
        shutil.rmtree(work)
    staging, table_dir = os.path.join(work, "staging"), os.path.join(work, "table")
    kv = bulkload_pipeline(
        records.wide9(spark, sf_dir), KEY_COLS, RECORD_COLS, range_partitions=32
    )
    phase(
        "ds_write",
        lambda: kv.write.format("hfile").mode("overwrite").save(staging),
    )

    def load_ds():
        with open(os.path.join(staging, "_MANIFEST.json")) as f:
            manifest = json.load(f)
        hl.do_bulk_load(
            [m["path"] for m in manifest], table_dir, boundaries, spark=spark
        )

    phase("ds_load", load_ds)
    phase(
        "ds_read_summary",
        lambda: _hfile_bucket_summary(
            spark.read.format("hfile")
            .option("columns", "value")
            .load(table_dir)
            .select("rowkey", "value")
        ).write.mode("overwrite").format("noop").save(),
    )

    # --- operator path ----------------------------------------------------
    work2 = os.path.join(scratch, "hfile_ab_op")
    if os.path.exists(work2):
        shutil.rmtree(work2)
    staging2, table2 = os.path.join(work2, "staging"), os.path.join(work2, "table")
    manifest2: list = []
    phase(
        "op_write",
        lambda: manifest2.extend(hl.write_region_hfiles(kv, staging2)),
    )
    phase(
        "op_load",
        lambda: hl.do_bulk_load(
            [m["path"] for m in manifest2], table2, boundaries, spark=spark
        ),
    )
    phase(
        "op_read_summary",
        lambda: _hfile_bucket_summary(
            hl.scan_hfiles(spark, table2, columns=["value"]).select(
                "rowkey", "value"
            )
        ).write.mode("overwrite").format("noop").save(),
    )
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(work2, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        "hfile_ds_ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    runs = [run_once(spark, sf_dir) for _ in range(n_runs)]
    merged = {k: min(r[k] for r in runs) for k in runs[0]}
    merged["ds_total"] = round(
        merged["ds_write"] + merged["ds_load"] + merged["ds_read_summary"], 3
    )
    merged["op_total"] = round(
        merged["op_write"] + merged["op_load"] + merged["op_read_summary"], 3
    )
    print(json.dumps({"sf_dir": sf_dir, "n_runs": n_runs, "phases_min": merged}))


if __name__ == "__main__":
    main()
