"""Custom join operators (operators/relational.py): as-of join boundary
semantics (equal timestamps match, unmatched left rows survive with
null payload, matches never cross keys) and salted-join equivalence on
a skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_bulkload_spark.operators.relational import asof_join, salted_join


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


def test_salted_join_equals_plain_join_on_skew(spark):
    """90% of fact rows hit one key; the salted join must still produce
    exactly the plain join's multiset, including dim-miss drops."""
    fact = spark.createDataFrame(
        [(i, 1 if i % 10 else i % 5) for i in range(1000)], "fid long, k long"
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(4)], "dk long, name string")
    plain = fact.join(dim, fact.k == dim.dk).select("fid", "k", "name")
    salted = salted_join(
        fact, dim, fact_key="k", dim_key="dk", salt_src="fid", n_salts=4
    ).select("fid", "k", "name")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_asof_join_keeps_left_columns_and_count(spark):
    left = spark.createDataFrame(
        [(1, 10, 3.5), (1, 20, 4.5)], "k long, ts long, extra double"
    )
    right = spark.createDataFrame([(1, 5, "x")], "k long, ts long, v string")
    got = asof_join(left, right, ["k"], "ts", ["v"])
    assert got.count() == left.count()
    assert set(got.columns) == {"k", "ts", "extra", "v"}
    assert {r.v for r in got.collect()} == {"x"}


def test_salted_join_rejects_outer(spark):
    """Right/full outer would emit each unmatched dim row n_salts times
    (the dim is exploded pre-join), so those modes must be rejected."""
    import pytest

    fact = spark.createDataFrame([(1, 1)], "fid long, k long")
    dim = spark.createDataFrame([(1, "d")], "dk long, name string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner/left only"):
            salted_join(fact, dim, fact_key="k", dim_key="dk", salt_src="fid", how=how)


def test_snapshot_diff_classification(spark):
    """insert/delete/update tags, null-safe value compare, unchanged
    rows dropped, null transitions classed as updates."""
    from hbase_bulkload_spark.operators.relational import snapshot_diff

    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, "e")],
        "k long, v string",
    )
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (5, None), (6, "f")],
        "k long, v string",
    )
    got = {
        r.k: r
        for r in snapshot_diff(v1, v2, key_cols=("k",), compare_cols=("v",)).collect()
    }
    assert set(got) == {2, 3, 4, 5, 6}  # k=1 unchanged → absent
    assert got[2].change == "update" and (got[2].old_v, got[2].new_v) == ("b", "B")
    assert got[3].change == "delete" and got[3].new_v is None
    assert got[4].change == "update" and got[4].old_v is None  # null → value
    assert got[5].change == "update" and got[5].new_v is None  # value → null
    assert got[6].change == "insert" and got[6].old_v is None
