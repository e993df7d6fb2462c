"""SparkSession construction with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32), but every
setting here is chosen to also hold on a 1000-executor cluster:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  dynamic broadcast conversion).
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a real
  cluster AQE's coalescing makes the initial number a ceiling, not a tuning
  burden.
- Arrow enabled so Pandas-UDF hops and driver collects are columnar batches.
- Session timezone pinned to UTC so timestamp semantics are stable across
  engines (the DuckDB oracle is timezone-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _daemon_preload_conf() -> dict[str, str]:
    """``spark.python.daemon.module`` → the warm-import daemon
    (:mod:`hbase_bulkload_spark.daemon_preload`): worker forks inherit
    numpy/pandas/pyarrow copy-on-write instead of re-importing them on
    every cold start (~0.5-1 s per worker, per fork storm).

    Two preconditions, both probed here so a broken environment
    degrades to the stock daemon instead of killing every Python task:
    the scientific stack must import driver-side, and the repo root
    must be exportable on PYTHONPATH (set into os.environ BEFORE the
    JVM launches — the daemon subprocess inherits the JVM's env, which
    inherits ours; a bare ``python -m`` in an arbitrary cwd would not
    find the package otherwise)."""
    try:
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
    except Exception:  # pragma: no cover — stack is baked into this env
        return {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            root + (os.pathsep + existing if existing else "")
        )
    return {"spark.python.daemon.module": "hbase_bulkload_spark.daemon_preload"}


def oracle_safe(spark: SparkSession) -> SparkSession:
    """Pin runtime-mutable confs that cross-engine correctness relies on.

    Called defensively at the top of every registered query so results are
    stable even when the caller (the verify driver) built its own session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark


def get_spark(
    app_name: str = "hbase-bulkload-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    daemon_conf = _daemon_preload_conf()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in {**daemon_conf, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    return oracle_safe(builder.getOrCreate())
