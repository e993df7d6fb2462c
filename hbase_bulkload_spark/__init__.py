"""hbase_bulkload_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference `mganta/hbase-bulkload`
(a CDH MapReduce HBase bulk-load tool), re-expressed Spark-first.

The reference's dataflow (see SURVEY.md): scan (text/CSV/RCFile/Avro) →
arity-validate → composite MD5 row key → wide→long KV unpivot →
total-order range partition + sort → Snappy sorted-KV sink, plus the
table semantics its DDL encodes (3-version retention, 90-day TTL,
10-way hash-range partitioning).

This package implements that inventory — and a full relational /
streaming / LLM-data-pipeline surface on top — as declarative DataFrame
plans that Catalyst/Tungsten optimize (predicate pushdown, column
pruning, whole-stage codegen, AQE). No RDDs; Python UDFs only where
built-ins genuinely cannot express the semantics (Arrow-batched).
"""

__version__ = "0.1.0"

from hbase_bulkload_spark.session import get_spark  # noqa: F401
