"""Bucketed tables co-locate join keys at write time so later joins on
the bucket key need no exchange — the persistent-table analog of the
bulk-load pipeline's pre-partitioned contract (SURVEY.md §2.5), and the
pattern that amortizes one shuffle across every downstream join at
100 TB."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from hbase_bulkload_spark.datasets import table


def test_bucketed_join_plans_no_exchange(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"b_orders_{suffix}", f"b_cust_{suffix}"
    try:
        (
            orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
            .option("path", str(tmp_path / t_orders))
            .saveAsTable(t_orders)
        )
        (
            customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
            .option("path", str(tmp_path / t_cust))
            .saveAsTable(t_cust)
        )
        # disable broadcast so the co-located sort-merge path is what's planned
        prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table(t_orders).join(
                spark.table(t_cust),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() == orders.join(
                customer, orders.o_custkey == customer.c_custkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")
