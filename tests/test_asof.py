"""As-of join (operators/relational.py::asof_join) boundary semantics:
equal timestamps match (b.ts <= a.ts), unmatched left rows survive with
null payload, matches never cross keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_bulkload_spark.operators.relational import asof_join


def test_asof_join_boundaries(spark):
    left = spark.createDataFrame(
        [
            (1, 100, "p1"),  # right at 90 → match v90
            (1, 90, "p2"),   # equal ts → match v90
            (1, 50, "p3"),   # nothing at/before 50 → null
            (2, 100, "p4"),  # key 2 has no right rows at all → null
        ],
        "k long, ts long, pid string",
    )
    right = spark.createDataFrame(
        [(1, 90, "v90"), (1, 95, "v95"), (3, 10, "v_other_key")],
        "k long, ts long, vid string",
    )
    out = {
        r.pid: r.vid
        for r in asof_join(
            left, right, key_cols=["k"], ts_col="ts", payload_cols=["vid"]
        ).collect()
    }
    assert out == {"p1": "v95", "p2": "v90", "p3": None, "p4": None}


def test_asof_join_keeps_left_columns_and_count(spark):
    left = spark.createDataFrame(
        [(1, 10, 3.5), (1, 20, 4.5)], "k long, ts long, extra double"
    )
    right = spark.createDataFrame([(1, 5, "x")], "k long, ts long, v string")
    got = asof_join(left, right, ["k"], "ts", ["v"])
    assert got.count() == left.count()
    assert set(got.columns) == {"k", "ts", "extra", "v"}
    assert {r.v for r in got.collect()} == {"x"}
