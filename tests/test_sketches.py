"""Mergeable HLL sketches (q_agg_hll_sketch's scale claim): unioning
per-bucket sketches must equal sketching the union — the invariant that
makes pre-aggregated distinct-count rollups trustworthy — and the
estimate must track the exact count."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_merge_equals_global_and_tracks_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per = li.groupBy("l_returnflag").agg(F.hll_sketch_agg("l_partkey").alias("sk"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est")
    ).first()["est"]
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).cast("long").alias("est")
    ).first()["est"]
    exact = li.select("l_partkey").distinct().count()
    assert merged == direct  # merge-of-parts == sketch-of-whole
    assert abs(direct - exact) / exact < 0.05, (direct, exact)
