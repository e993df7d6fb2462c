"""UDF / UDAF / UDTF surface (SURVEY.md §2.13 ops 49-51). The
reference's per-record mapper bodies (`map()` in each importer,
`BulkImporterFromText.java:50-71`) are arbitrary-Java row transforms;
here the same extension point is Python:

- op 49: a vectorized pandas UDF re-deriving the composite MD5 rowkey in
  pure Python (hashlib), full-oracle-checked — which simultaneously
  cross-validates the built-in expression path (op 13b) byte-for-byte.
- op 50: a grouped applyInPandas aggregation computing order-invariant
  per-group statistics, full-oracle-checked against DuckDB MEDIAN.
- op 51: a Python UDTF (1 row → N rows) reproducing the reference's
  *entire* mapper body — split, arity gate, rowkey, cell fan-out — as
  one LATERAL table function, full-oracle-checked against the
  relational formulation.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from hbase_bulkload_spark.datasets import table
from hbase_bulkload_spark.queries.ingest import ROWKEY_SQL, WIDE9_CTE
from hbase_bulkload_spark.session import oracle_safe
from hbase_bulkload_spark.sources import records


@pandas_udf(StringType())  # DataType instance: usable without an active session
def rowkey_py(z0: pd.Series, z1: pd.Series, z2: pd.Series, z3: pd.Series) -> pd.Series:
    """Arrow-batched re-implementation of RowKeyConverter.makeRowKey
    (`RowKeyConverter.java:13-30`, hex form).

    Per-batch dictionary encoding: hash each column's *uniques* once,
    then C-speed dict-map — key columns are low-cardinality (linenumber
    has ~7 values, suppkey ~1k), so this drops Python hashlib calls
    ~10× vs hashing every row. Memo is per batch → bounded memory."""
    null_hash = hashlib.md5(b"").hexdigest()

    def h_col(s: pd.Series) -> pd.Series:
        lut = {
            u: hashlib.md5(u.encode("utf-8")).hexdigest()
            for u in pd.unique(s.dropna())
        }
        return s.map(lut).fillna(null_hash)

    return h_col(z0) + h_col(z1) + h_col(z2) + h_col(z3)


def q_udf_rowkey(spark, sf_dir) -> DataFrame:
    oracle_safe(spark)
    w = records.wide9(spark, sf_dir)
    return w.select("z0", "z1", "z2", "z3", rowkey_py("z0", "z1", "z2", "z3").alias("rowkey"))


_STATS_SCHEMA = (
    "o_custkey bigint, n_orders bigint, median_price double, "
    "min_price double, max_price double"
)


def _order_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-batch aggregation (one pandas groupby over many
    groups — not one Python call per group). median/min/max are
    arrival-order-invariant → deterministic across partitionings."""
    g = pdf.groupby("o_custkey", sort=False)["o_totalprice"]
    out = g.agg(
        n_orders="count", median_price="median", min_price="min", max_price="max"
    ).reset_index()
    out["n_orders"] = out["n_orders"].astype("int64")
    return out[["o_custkey", "n_orders", "median_price", "min_price", "max_price"]]


def q_udaf_grouped(spark, sf_dir) -> DataFrame:
    """Grouped UDAF. The naive form is
    ``groupBy().applyInPandas(per_group_fn)`` — one Python invocation per
    group, which at 100 TB (millions of groups) serializes the job on
    interpreter crossings. The scalable form used here keeps the same
    shuffle (hash-partition by key) but streams each partition through
    ``mapInPandas``, aggregating *all* groups in an Arrow batch with one
    vectorized pandas groupby; a group split across adjacent batches is
    carried over (partition-sorted by key, so groups are contiguous)."""
    oracle_safe(spark)
    orders = table(spark, sf_dir, "orders")
    part = (
        orders.select("o_custkey", "o_totalprice")
        .repartition("o_custkey")
        .sortWithinPartitions("o_custkey")
    )

    def stats(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                carry = None
                continue
            # the last key may continue in the next batch — hold it back
            last = pdf["o_custkey"].iloc[-1]
            tail = pdf["o_custkey"] == last
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield _order_stats(body)
        if carry is not None and len(carry):
            yield _order_stats(carry)

    return part.mapInPandas(stats, schema=_STATS_SCHEMA)


try:  # Python UDTFs need pyspark >= 3.5; this repo pins 4.x
    from pyspark.sql.functions import udtf

    @udtf(returnType="rowkey string, qualifier string, value string")
    class MapperCells:
        """Op 51: the reference mapper (`BulkImporterFromText.java:50-71`)
        as a table function — one delimited line in, 0 (arity-skipped) or
        9 KV cells out. This is the UDTF *surface* demo; the production
        path for the same dataflow is the codegen'd split/filter/unpivot
        plan (queries.ingest), which beats any Python loop — same
        positioning as q_udf_rowkey vs the built-in op 13b.

        ``useArrow=True`` was measured and rejected: Spark 4.1's
        arrow-optimized UDTF path builds a record batch per input row
        for 1→N generators, benching 20.5 s vs 2.4 s for the default
        pickle serializer on this query at sf0.1."""

        _QUALS = tuple(f"z{i}" for i in range(9))
        _MD5 = staticmethod(hashlib.md5)

        def eval(self, line: str):
            if line is None:
                return
            words = line.split("\x01")
            if len(words) != 9:  # words.length == COLUMN_COUNT gate, :56
                return
            md5 = self._MD5
            rowkey = "".join(
                md5(w.encode("utf-8")).hexdigest() for w in words[:4]
            )
            for q, w in zip(self._QUALS, words):  # one addColumn per field
                yield rowkey, q, w

except ImportError:  # pragma: no cover
    MapperCells = None


def q_udtf_cells(spark, sf_dir) -> DataFrame:
    """Op 51 first-class: LATERAL-apply the mapper UDTF to the delimited
    fixture. The UDTF runs inside the scan stage (map-only, no shuffle);
    parallelism is the text scan's split count."""
    oracle_safe(spark)
    spark.udtf.register("mapper_cells", MapperCells)
    records.scan_text(spark, sf_dir).createOrReplaceTempView("_udtf_lines")
    return spark.sql(
        "SELECT c.rowkey, c.qualifier, c.value "
        "FROM _udtf_lines, LATERAL mapper_cells(value) c"
    )


QUERIES = {
    "q_udf_rowkey": q_udf_rowkey,
    "q_udaf_grouped": q_udaf_grouped,
    "q_udtf_cells": q_udtf_cells,
}

ORACLES = {
    "q_udf_rowkey": f"""
        WITH {WIDE9_CTE}
        SELECT z0, z1, z2, z3, {ROWKEY_SQL} AS rowkey FROM wide9
    """,
    "q_udtf_cells": f"""
        WITH {WIDE9_CTE},
        valid AS (
            SELECT * FROM wide9 WHERE _seq % 97 <> 0 AND z8 IS NOT NULL
        ),
        keyed AS (
            SELECT {ROWKEY_SQL} AS rowkey, * FROM valid
        )
        SELECT rowkey, qualifier, value FROM (
            SELECT rowkey, 'z0' AS qualifier, z0 AS value FROM keyed
            UNION ALL SELECT rowkey, 'z1', z1 FROM keyed
            UNION ALL SELECT rowkey, 'z2', z2 FROM keyed
            UNION ALL SELECT rowkey, 'z3', z3 FROM keyed
            UNION ALL SELECT rowkey, 'z4', z4 FROM keyed
            UNION ALL SELECT rowkey, 'z5', z5 FROM keyed
            UNION ALL SELECT rowkey, 'z6', z6 FROM keyed
            UNION ALL SELECT rowkey, 'z7', z7 FROM keyed
            UNION ALL SELECT rowkey, 'z8', z8 FROM keyed
        )
    """,
    "q_udaf_grouped": """
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               MEDIAN(o_totalprice) AS median_price,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders GROUP BY o_custkey
    """,
}
