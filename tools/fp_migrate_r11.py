"""One-time r11 ledger migration for the plan-fingerprint normalizer fix.

Why: bench.py's `_plan_fingerprint` hashed the analyzed plan with two
session-counter leaks left in — higher-order-function lambda variables
(`lambda x_<N>`, N from a session-global counter) and `.observe()`
CollectMetrics node ids. The fp therefore depended on query
CONSTRUCTION ORDER: any registry change upstream of a key shifted its
fp, and the min-merge guard then dropped that key's committed
good-window minima as "plan changed" when the plan had not. Observed
in the run-8 merge (commit c0aa197 ledger state): q_dedup_ngram and
q_dedup_incremental_near lost their 2.09 s / 2.143 s minima to a
throttled(x5.5) run's numbers purely because the r11 shared-shingles
change shifted the lambda counter of every key constructed after the
verdict key.

What this does (documented, auditable, run once at commit time):
1. Recomputes every registered key's fingerprint with the FIXED
   normalizer in a fresh session and overwrites `plan_fp` in both
   ledgers. Legitimate because the last merge already enforced
   fp-match between each key's stored minimum and the CURRENT plan —
   the stored minima all describe today's plans; only the hash
   changed representation.
2. Restores the two spuriously-dropped keys' minima to
   min(current, pre-drop) — their plans are UNCHANGED (verified: old
   and new code produce identical fps in identical construction
   contexts; the r11 change only shifted the session counters):
   q_dedup_ngram 2.09, q_dedup_incremental_near 2.143 (values from
   git history of BENCH_FULL_LATEST.json at 97fc4ab).
   q_dedup_incremental_minhash is NOT restored — its plan genuinely
   changed (shared shingles), so its minimum correctly restarts from
   post-change runs.
3. Records the migration in each ledger under `fp_migration_r11`.

Usage: python tools/fp_migrate_r11.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RESTORE = {  # key -> pre-drop minimum (see module docstring)
    "q_dedup_ngram": 2.09,
    "q_dedup_incremental_near": 2.143,
}


def main() -> None:
    from hbase_bulkload_spark.session import get_spark

    import __spark_entry__ as entrymod
    import bench

    spark = get_spark("fp-migrate")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fps = {
        name: bench._plan_fingerprint(fn(spark, sf_dir), sf_dir)
        for name, fn in entrymod.queries().items()
    }
    note = {
        "reason": "fp normalizer fix: lambda x_<N> session counter and "
        "CollectMetrics node id stripped (bench.py _FP_LAMBDA / "
        "_FP_COLLECT_METRICS_ID); fps re-stamped for the same plans",
        "restored": RESTORE,
    }
    for path in (bench.FULL_ARTIFACT, bench.MINIMA_ARTIFACT):
        with open(path) as f:
            led = json.load(f)
        led["plan_fp"] = {k: fps[k] for k in led["queries"] if k in fps}
        for k, v in RESTORE.items():
            if k in led["queries"]:
                led["queries"][k] = min(led["queries"][k], v)
        led["value"] = round(sum(led["queries"].values()), 3)
        led["fp_migration_r11"] = note
        with open(path, "w") as f:
            json.dump(led, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"{os.path.basename(path)}: {len(led['plan_fp'])} fps "
              f"re-stamped, value={led['value']}")


if __name__ == "__main__":
    main()
