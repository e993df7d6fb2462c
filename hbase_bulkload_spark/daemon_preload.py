"""``pyspark.daemon`` wrapper that warms the scientific stack before
serving worker forks.

The stock daemon imports only pyspark; numpy/pandas/pyarrow are first
imported inside each forked worker when a Pandas UDF deserializes —
~0.5-1 s of import work per fresh worker, paid on every worker
cold-start. Importing them HERE, in the daemon, once, puts the modules
in the daemon's image, so every forked worker inherits them via
copy-on-write pages: a fresh worker is task-ready in milliseconds.

This matters twice:

- **bench protocol**: the harness drains the idle-worker pool between
  timed queries (``bench._recycle_python_workers``, the round-8 fix for
  cross-query worker-pool memory-reclaim noise) — without preload, each
  Python-stage query would pay 32 re-imports inside its timed window,
  trading one measurement artifact for another;
- **production**: executors that scale worker counts up and down (or
  kill workers via ``spark.python.worker.killOnIdleTimeout``) get
  millisecond worker cold-starts instead of the import storm.

Wired in by ``session.get_spark`` via ``spark.python.daemon.module``
(the module must be importable by the worker-side Python — get_spark
exports the repo root on PYTHONPATH before the JVM launches). Module
availability is probed driver-side first; if the stack is absent the
stock daemon is kept, so this never turns an optional dependency into
a hard one.
"""

# fork-inherited warm imports — order cheap-to-heavy so a partial
# failure (unlikely: the driver probed these) leaves the most useful
# prefix warm
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
