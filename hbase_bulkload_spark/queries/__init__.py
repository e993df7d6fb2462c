"""Query registry: every implemented operator from SURVEY.md §2 appears
here as a named (spark, sf_dir) -> DataFrame builder plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string with
identical column names (the driver hash-compares them).

Each wave of operators lives in its own module; this package merges the
registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = ("ingest", "relational", "semantics", "streaming", "udf", "extensions")


def load_registries() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        mod = importlib.import_module(f"hbase_bulkload_spark.queries.{mod_name}")
        for k in mod.QUERIES:
            if k in queries:
                raise ValueError(f"duplicate query key {k!r}")
        queries.update(mod.QUERIES)
        oracles.update(getattr(mod, "ORACLES", {}))
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {sorted(unknown)}")
    return queries, oracles
