"""Z-order layout (functions.keys.zvalue): bit-level correctness against
an independent Python interleave, and the actual data-skipping payoff —
row groups of a z-ordered parquet file prune a 2-D range predicate that
a natural-order layout cannot."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hbase_bulkload_spark.functions.keys import zvalue


def _interleave_py(a: int, b: int) -> int:
    out = 0
    for i in range(32):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_reference_bits(spark):
    # 70000 > 2^16: must interleave WITHOUT wraparound (the 32-bit-lane
    # property that keeps clustering intact for wide surrogate keys)
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (70000, 3),
            (0xFFFFFFFF, 0x7FFFFFFF), (20_000_000, 1_000_000)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zvalue("a", "b").alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _interleave_py(a & 0xFFFFFFFF, b & 0x7FFFFFFF), (a, b)


def test_zvalue_property_random(spark):
    """Property: Spark zvalue == independent Python interleave on random
    32-bit pairs (hypothesis-driven sample, one Spark round trip)."""
    from hypothesis import given, settings, strategies as st

    pairs: list[tuple[int, int]] = []

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, 0xFFFFFFFF), st.integers(0, 0x7FFFFFFF))
    def collect(a, b):
        pairs.append((a, b))

    collect()
    df = spark.createDataFrame(pairs, "a long, b long").distinct()
    got = df.select("a", "b", zvalue("a", "b").alias("z")).collect()
    for r in got:
        assert r.z == _interleave_py(r.a, r.b), (r.a, r.b)


def test_zorder_monotone_in_each_dim(spark):
    """Fixing one dimension, zvalue is strictly increasing in the other
    (the property that makes per-dimension min/max stats meaningful)."""
    df = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 1000).alias("b")
    )
    z1 = df.select(zvalue("a", F.lit(5)).alias("z"), "a").collect()
    assert sorted(z1, key=lambda r: r.a) == sorted(z1, key=lambda r: r.z)


def _matching_row_groups(path: str, lo_p, hi_p, lo_s, hi_s) -> tuple[int, int]:
    """(row groups whose [min,max] stats intersect the 2-D box, total)."""
    md = pq.ParquetFile(path).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    match = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        sp = g.column(names["l_partkey"]).statistics
        ss = g.column(names["l_suppkey"]).statistics
        if sp.min <= hi_p and sp.max >= lo_p and ss.min <= hi_s and ss.max >= lo_s:
            match += 1
    return match, md.num_row_groups


def test_zorder_skips_2d_predicate(spark, sf_dir, tmp_path):
    """The point of the layout: a (partkey, suppkey) box predicate must
    touch far fewer row groups under z-order than under natural order.
    Row-group size is pinned via pyarrow so the min/max-stat pruning
    arithmetic is deterministic; in production the same effect comes
    from `repartitionByRange(zval).sortWithinPartitions(zval)` + the
    parquet writer's own row-group chunking."""
    pdf = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .withColumn("zval", zvalue("l_partkey", "l_suppkey"))
        .toPandas()
    )
    import pyarrow as pa

    natural = str(tmp_path / "natural.parquet")
    zsorted = str(tmp_path / "zorder.parquet")
    pq.write_table(pa.Table.from_pandas(pdf), natural, row_group_size=256)
    pq.write_table(
        pa.Table.from_pandas(pdf.sort_values("zval")), zsorted, row_group_size=256
    )
    hi_p = int(pdf["l_partkey"].max()) // 8  # a 1/64-area corner box
    hi_s = int(pdf["l_suppkey"].max()) // 8
    nm, nt = _matching_row_groups(natural, 0, hi_p, 0, hi_s)
    zm, zt = _matching_row_groups(zsorted, 0, hi_p, 0, hi_s)
    assert nt > 8 and zt > 8, (nt, zt)  # enough row groups to mean anything
    assert nm == nt, (nm, nt)  # natural order: stats prune nothing
    assert zm <= zt // 3, (zm, zt)  # z-order: the box touches a small corner
