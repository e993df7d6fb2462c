"""One-time fingerprint re-stamp for the r12 normalization fixes.

Round 12 changed ``bench._plan_fingerprint`` twice (both
additions-only normalizations, no timing-path change):

1. Partition counts (``Repartition 32`` / ``RepartitionByExpression
   [...], 32``) normalize out: the counts come from
   ``defaultParallelism`` = $SPARK_GRAFT_CPUS, which the DRIVER ITSELF
   varies (the 8-core scaling run). The r11 driver's 8-core run merged
   LAST and stamped 8-core fingerprints onto the ledgers; the first
   32-core r12 run then dropped 18 keys' committed good-window minima
   as "plan changed" when only the environment had.
2. Lambda variables renumber per plan by first occurrence
   (``x_1, x_2``) instead of collapsing every index to one token
   (round-11 advisor item: collapsing let two genuinely different
   plans share a fingerprint).

Both change the fingerprint STRING for unchanged plans, so the stored
ledger fps must be re-stamped once or the next merge drops every
affected key's minima. This tool does that re-stamp with the guards
the round-11 advisor asked for (ADVICE.md on tools/fp_migrate_r11.py,
since deleted):

- RUN-ONCE: refuses if the ledger already carries the
  ``fp_migrations`` marker for this migration.
- PRECONDITION CHECKED PER KEY: a key is re-stamped ONLY if its stored
  fp equals the OLD-normalization fp of the CURRENT code's plan,
  computed in this session at the cpu count that stamped the ledger
  (proving the plan is unchanged since the stamp). Keys that fail the
  check keep their stored fp and are listed — they will drop naturally
  at the next merge, which is the gate working as designed.
- NO VALUE EDITS: ``queries`` / ``queries_first`` / ``value`` are not
  touched (the r11 tool's value restores are what made it dangerous).
- DURABLE PROVENANCE: the marker is written to ``fp_migrations``,
  which tools/bench_merge.py now unions across merges so the audit
  trail survives (the r11 marker was silently dropped by the next
  merge's ``base = dict(newest)``).

Usage: python tools/fp_migrate_r12.py [--cpus 8] [ledger.json ...]
Defaults: cpus=8 (the r11 driver's last-merged run), ledgers =
BENCH_MINIMA.json + BENCH_FULL_LATEST.json.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARKER = "r12_cpus_and_lambda_fp_norm"

#: the r11 normalization, frozen here so the precondition check can
#: reproduce the fps the ledger was stamped with
_OLD_FP_LAMBDA = re.compile(r"\bx_\d+\b")
_OLD_FP_CM_ID = re.compile(
    r"^(\s*(?:[+:|-]\s*)*CollectMetrics .*), \d+$", re.M
)


def _old_fingerprint(df, sf_dir: str) -> str:
    import hashlib

    import bench

    s = df._jdf.queryExecution().analyzed().toString()
    s = bench._FP_NOISE.sub("", s)
    s = _OLD_FP_LAMBDA.sub("x_", s)
    s = _OLD_FP_CM_ID.sub(r"\1", s)
    if sf_dir:
        s = s.replace(sf_dir, "")
    s = re.sub(r"\s+", " ", s)
    return hashlib.sha256(s.encode()).hexdigest()[:12]


def main() -> None:
    args = sys.argv[1:]
    cpus = 8
    if args and args[0] == "--cpus":
        cpus = int(args[1])
        args = args[2:]
    ledgers = args or [
        os.path.join(REPO, "BENCH_MINIMA.json"),
        os.path.join(REPO, "BENCH_FULL_LATEST.json"),
    ]
    targets = []
    for path in ledgers:
        with open(path) as f:
            led = json.load(f)
        if MARKER in led.get("fp_migrations", []):
            raise SystemExit(f"REFUSED: {path} already migrated ({MARKER})")
        if "plan_fp" not in led:
            raise SystemExit(f"REFUSED: {path} has no plan_fp to migrate")
        targets.append((path, led))

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from hbase_bulkload_spark.session import get_spark

    import __spark_entry__ as entrymod
    import bench

    spark = get_spark(cpus=cpus)
    qs = entrymod.queries()

    for path, led in targets:
        sf_dir = led.get("sf_dir", "/root/testdata/sf0.1")
        stored = led["plan_fp"]
        restamped, kept = {}, []
        new_fp = dict(stored)
        for key, fp in stored.items():
            if key not in qs:
                kept.append(key)
                continue
            df = qs[key](spark, sf_dir)
            if _old_fingerprint(df, sf_dir) == fp:
                new_fp[key] = bench._plan_fingerprint(df, sf_dir)
                restamped[key] = fp
            else:
                kept.append(key)
        led["plan_fp"] = new_fp
        led.setdefault("fp_migrations", []).append(MARKER)
        with open(path, "w") as f:
            json.dump(led, f, indent=1, sort_keys=True)
            f.write("\n")
        print(
            f"{os.path.basename(path)}: restamped {len(restamped)}, "
            f"kept-as-is (will drop at next merge if stale) {len(kept)}: "
            f"{sorted(kept)}"
        )


if __name__ == "__main__":
    main()
