from hbase_bulkload_spark.plans.inspect import (  # noqa: F401
    count_broadcast_joins,
    count_exchanges,
    physical_plan,
    scan_summaries,
)
