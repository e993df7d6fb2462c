"""Local replica of the driver's correctness gate: run every
``queries()[k]`` on Spark and every ``oracle_sql()[k]`` on DuckDB over the
same parquet tables, compare row-count + column names + order-insensitive
values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from hbase_bulkload_spark.datasets import TABLES  # noqa: E402
from hbase_bulkload_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


# SPARK_GRAFT_FLOAT_SIG=<digits>: compare floats at that many significant
# digits instead of exact repr. Unset (the default, and what the driver
# does) keeps bit-exact float comparison; the sf>=1 scale runs set 9,
# because a SUM over millions of doubles legitimately differs in the
# last ulp between Spark's and DuckDB's summation orders.
FLOAT_SIG = os.environ.get("SPARK_GRAFT_FLOAT_SIG")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted canonical form for comparison."""
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify every cell so dtype differences (int32 vs int64) don't
    # obscure genuine value differences; floats get a fixed repr
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\x00NULL"
        if isinstance(v, float):
            if FLOAT_SIG:
                return f"%.{int(FLOAT_SIG) - 1}e" % v
            return repr(v)
        return str(v)

    s = df.map(cell)
    s = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
    return s


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # uncapped result collection: the gate's Spark-vs-DuckDB compare
    # materializes full query outputs on the driver by design, and at
    # sf >= 1 a single KV-pipeline result exceeds the 1g default
    spark = get_spark(
        "oracle-check", extra_conf={"spark.driver.maxResultSize": "0"}
    )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"rows {name}: {len(sdf)} rows ({el:.1f}s, no oracle)")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            cs, co = canon(sdf), canon(odf)
            if not cs.equals(co):
                neq = (cs != co).any(axis=1)
                idx = neq[neq].index[:3]
                detail = [
                    f"row{i}: spark={cs.loc[i].tolist()} oracle={co.loc[i].tolist()}"
                    for i in idx
                ]
                problems.append("values differ: " + " | ".join(detail))
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows ({el:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
