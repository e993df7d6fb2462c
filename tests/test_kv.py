"""Unpivot / pivot-back invariants (SURVEY.md §5.2 item 2-3):
- cell count = valid_rows × 9 minus exactly the null count (Avro-style
  null suppression, `BulkImporterFromAvro.java:65-66`);
- long-KV → wide pivot recovers the input for non-null cells.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hbase_bulkload_spark.functions.keys import composite_rowkey
from hbase_bulkload_spark.operators.kv import pivot_wide, unpivot_kv
from hbase_bulkload_spark.sources.records import RECORD_COLS, wide9


def test_cell_count_invariant(spark, sf_dir):
    w = wide9(spark, sf_dir).cache()
    n_rows = w.count()
    n_nulls = w.select(
        sum(F.sum(F.col(c).isNull().cast("long")) for c in RECORD_COLS).alias("n")
    ).first().n
    kv = unpivot_kv(w, composite_rowkey("z0", "z1", "z2", "z3"), RECORD_COLS)
    assert kv.count() == n_rows * len(RECORD_COLS) - n_nulls

    kv_keep = unpivot_kv(
        w, composite_rowkey("z0", "z1", "z2", "z3"), RECORD_COLS, drop_null=False
    )
    assert kv_keep.count() == n_rows * len(RECORD_COLS)
    w.unpersist()


def test_kv_schema_contract(spark, sf_dir):
    w = wide9(spark, sf_dir)
    kv = unpivot_kv(
        w, composite_rowkey("z0", "z1", "z2", "z3"), RECORD_COLS, ts=F.lit("2024-01-01").cast("timestamp")
    )
    assert kv.columns == ["rowkey", "family", "ts", "qualifier", "value"]
    assert kv.select("family").distinct().collect() == [("c",)]


def test_pivot_duplicate_and_unknown_cells(spark):
    """The scatter pivot's edge contracts: duplicate (rowkey, qualifier)
    cells resolve DETERMINISTICALLY to the MAX non-null value in any
    arrival order (the oracle's MAX(CASE ...) — pinned by a real dup
    key at sf0.001); null-valued cells never beat a non-null;
    qualifiers outside the pinned list are dropped, not mis-scattered
    (the Categorical -1 guard). Both variants must agree."""
    rows = [
        ("k1", "c", "q0", None),   # null — must never win over a/b
        ("k1", "c", "q0", "a"),
        ("k1", "c", "q0", "b"),
        ("k1", "c", "q1", "x"),
        ("k2", "c", "zz", "junk"), # unknown qualifier — dropped entirely
        ("k2", "c", "q1", "y"),
    ]
    kv = spark.createDataFrame(rows, "rowkey string, family string, qualifier string, value string")
    for partial in (False, True):
        out = {
            r.rowkey: r
            for r in pivot_wide(
                kv.repartition(3), ["q0", "q1"], partial=partial
            ).collect()
        }
        assert len(out) == 2, partial  # one wide row per key, dups merged
        assert out["k1"].q0 == "b", partial  # MAX of {a, b}, never null
        assert out["k1"].q1 == "x", partial
        assert out["k2"].q0 is None, partial  # 'junk' must not leak
        assert out["k2"].q1 == "y", partial


def test_pivot_roundtrip(spark, sf_dir):
    w = (
        wide9(spark, sf_dir)
        .drop("_seq")
        .withColumn("rowkey", composite_rowkey("z0", "z1", "z2", "z3"))
        .cache()
    )
    # restrict to unique-key rows: pivot legitimately merges key collisions
    uniq = (
        w.withColumn("n", F.count("*").over(Window.partitionBy("rowkey")))
        .filter("n = 1")
        .drop("n")
    )
    kv = unpivot_kv(uniq, F.col("rowkey"), RECORD_COLS)
    back = pivot_wide(kv, RECORD_COLS)
    assert back.count() == uniq.count()
    assert back.exceptAll(uniq.select(back.columns)).count() == 0
    w.unpersist()


def test_partial_pivot_matches_default(spark, sf_dir):
    """The cluster-tier map-side partial pivot (partial=True) must
    produce exactly the default variant's result on duplicate-free KV,
    and obey the same edge contracts (null never wins, unknown
    qualifiers dropped) on messy input."""
    w = (
        wide9(spark, sf_dir)
        .drop("_seq")
        .withColumn("rowkey", composite_rowkey("z0", "z1", "z2", "z3"))
    )
    uniq = (
        w.withColumn("n", F.count("*").over(Window.partitionBy("rowkey")))
        .filter("n = 1")
        .drop("n")
    )
    kv = unpivot_kv(uniq, F.col("rowkey"), RECORD_COLS).repartition(8)
    a = pivot_wide(kv, RECORD_COLS)
    b = pivot_wide(kv, RECORD_COLS, partial=True)
    assert b.count() == a.count()
    assert b.exceptAll(a).count() == 0 and a.exceptAll(b).count() == 0

    rows = [
        ("k1", "c", "q0", None),
        ("k1", "c", "q0", "a"),
        ("k1", "c", "q1", "x"),
        ("k2", "c", "zz", "junk"),
        ("k2", "c", "q1", "y"),
    ]
    messy = spark.createDataFrame(
        rows, "rowkey string, family string, qualifier string, value string"
    ).repartition(4)
    out = {r.rowkey: r for r in pivot_wide(messy, ["q0", "q1"], partial=True).collect()}
    assert out["k1"].q0 == "a" and out["k1"].q1 == "x"
    assert out["k2"].q0 is None and out["k2"].q1 == "y"
