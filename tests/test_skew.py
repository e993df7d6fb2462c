"""Skew-join behavior on a genuinely skewed fixture (VERDICT r4 item 8).

q_join_salted passes on near-uniform TPC-H keys, which never stresses
either mitigation. Here a deterministic Zipf-ish fact (40% of 600k rows
on one key, the rest spread over 1k keys) pins both regimes:

- AQE skew-join split: with sort-merge forced and the skew thresholds
  scaled to the fixture, Spark's adaptive plan must actually split the
  hot partition (``skewed`` marker in the final AQEShuffleRead) and
  still produce the right row count.
- Explicit salting: `salted_join` must equal the plain join
  value-for-value AND bound the per-reducer group size to ~hot/n_salts
  — the deterministic budget argument made in its docstring.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_spark.operators.relational import salted_join

N_FACT = 600_000
N_DIM = 1_000
HOT_SHARE = 0.4  # fraction of fact rows on key 0


@pytest.fixture(scope="module")
def skewed(spark):
    fact = spark.range(N_FACT).select(
        F.col("id").alias("fid"),
        F.when(F.col("id") % 10 < int(HOT_SHARE * 10), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_DIM)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("dname")
    )
    return fact, dim


def test_aqe_splits_the_hot_partition(spark, skewed):
    fact, dim = skewed
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # scale the production thresholds (256m / 5x median) down to the
        # fixture: the hot partition is ~1-2 MB of compressed shuffle
        # bytes, the advisory target a fraction of it
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = fact.hint("merge").join(dim, fact.k == dim.dk, "inner")
        # collect() (not count()) so THIS DataFrame's adaptive plan is
        # the one that executes — count() spawns a separate execution
        # and joined's own plan would stay isFinalPlan=false
        n = len(joined.collect())
        assert n == N_FACT  # every fact key exists in the dim
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skewed" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_parity_on_zipf(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, fact.k == dim.dk, "inner").select(
        "fid", "k", "v", "dname"
    )
    salted = salted_join(
        fact, dim, fact_key="k", dim_key="dk", salt_src="fid", n_salts=8
    ).select("fid", "k", "v", "dname")
    assert salted.count() == N_FACT
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salting_bounds_the_reducer_budget(spark, skewed):
    """The point of salting: the hot key's rows divide over n_salts
    reducer groups. Check the realized (key, salt) histogram — max
    group ~= hot/n_salts, far below the unsalted hot size."""
    fact, _ = skewed
    n_salts = 8
    hot_rows = int(N_FACT * HOT_SHARE)
    salted = fact.withColumn(
        "_s", F.pmod(F.xxhash64("fid"), F.lit(n_salts)).cast("int")
    )
    top = (
        salted.groupBy("k", "_s")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]
        .mx
    )
    # perfect split would be hot/n_salts; allow 40% imbalance slack
    assert top <= int(hot_rows / n_salts * 1.4), top
    assert top < hot_rows  # and strictly better than unsalted
