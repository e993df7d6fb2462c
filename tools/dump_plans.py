"""Dump `.explain("formatted")` for registered queries to files.

    python tools/dump_plans.py <out_dir> [sf_dir] [query ...]

One `<out_dir>/<query>.txt` per key (planning only — nothing executes).
Used for the optimization rounds' before/after plan evidence
(`plans/r11/<query>_before.txt` / `_after.txt`): pass the suffix in the
out-path naming convention by dumping into a scratch dir and renaming,
or just dump twice into files named by the caller.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_bulkload_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            text = formatted_plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - best-effort per query
            text = f"ERROR: {e}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(text)
        print(name)


if __name__ == "__main__":
    main()
