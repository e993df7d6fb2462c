"""Min-merge several full bench artifacts into one best-steady-state
estimate, with per-run provenance.

Why this exists (round 8): the bench VM has a degradation mode that
neither calibration probe sees — a run can pass both the single-core
and the all-cores sha256 probes ("throttle": "ok") while every Spark
query runs uniformly ~8-15% slower than a same-day good window
(observed 2026-08-16: totals 130.2 / 143.8 / 152.3 across three full
runs of the same code, probes clean on the first and last). sha256 is
L1-resident compute; Spark stages are memory-bandwidth and syscall
heavy, so a host-level bandwidth/steal state moves them independently.
Per-query minima across runs are the same steady-state estimator the
bench already uses within a run (min over 3 passes — JMH's reported
estimator) and the scale ladder uses across runs (SCALE_r8 "min-merged
across the listed runs"), extended across run boundaries.

The merged artifact is explicit about its method: `merged_from` lists
each run's total, throttle stamp, and calibration probes, so a reader
can reconstruct any single run's view; `queries`/`value` are the
minima. Round-9 key semantics (advisor items): the NEWEST run's key set
is authoritative — a key removed or renamed between runs is DROPPED
from the merge (listed in `dropped_keys`), never resurrected from an
older artifact, so a rename is not double-counted and a retired query
does not haunt the total. Keys new in the newest run simply take their
only measurement. Per-run-only top-level fields (calib_sec,
calib_mc_sec, throttle ratios, worker_recycle) are REMOVED from the
merged top level — they described runs[-1] alone while appearing to
describe the merge; merged_from carries them per run.

The isolated-probe section keeps the minimum isolated number and
recomputes agreement against the merged in-registry minimum —
best-case vs best-case, the strongest form of the contention-freedom
claim.

Usage:
    python tools/bench_merge.py OUT.json RUN1.json RUN2.json [...]
"""

from __future__ import annotations

import json
import sys

#: top-level fields that describe ONE run's execution window, not the
#: merged minima — dropped from the merged artifact (merged_from keeps
#: them per run)
PER_RUN_FIELDS = ("calib_sec", "calib_mc_sec", "worker_recycle")


def _provenance_entries(r: dict) -> list[dict]:
    """Flatten provenance: a merged artifact contributes its own
    merged_from entries (its top-level value is derived, not a run)."""
    if "merged_from" in r:
        return list(r["merged_from"])
    return [
        {
            "value": r.get("value"),
            "throttle": r.get("throttle"),
            "calib_sec": r.get("calib_sec"),
            "calib_mc_sec": r.get("calib_mc_sec"),
            "worker_recycle": r.get("worker_recycle"),
            "n_queries": len(r["queries"]),
        }
    ]


def _fp_gate(newest: dict):
    """Per-key merge admissibility for an OLDER run's number (round-9
    advisor item, bench.py:295): the newest run's plan fingerprint
    (bench._plan_fingerprint — normalized analyzed-plan hash) is
    authoritative; an older number merges only if its run recorded the
    SAME fingerprint for that key. A key whose plan changed in place
    under the same name (q_dedup_near this round) therefore takes the
    new run's number instead of keeping a stale minimum the current
    code cannot produce. Legacy mode: if the newest artifact predates
    fingerprints entirely (no plan_fp key), the gate admits everything
    — the old unguarded behavior, needed to merge historical logs."""
    want = newest.get("plan_fp")
    if want is None:
        return lambda r, k: True
    return lambda r, k: (r.get("plan_fp") or {}).get(k) == want.get(k) != None  # noqa: E711


def merge(runs: list[dict]) -> dict:
    newest = runs[-1]
    base = dict(newest)  # newest run: schema, sf, host id
    live = set(newest["queries"])  # authoritative key set (advisor item)
    admissible = _fp_gate(newest)
    queries: dict[str, float] = {}
    first: dict[str, float] = {}
    dropped: set[str] = set()
    fp_dropped: set[str] = set()
    for r in runs:
        is_newest = r is newest
        for k, v in r["queries"].items():
            if k not in live:
                dropped.add(k)
            elif is_newest or admissible(r, k):
                queries[k] = min(queries.get(k, v), v)
            else:
                fp_dropped.add(k)
        for k, v in r.get("queries_first", {}).items():
            if k in live and (is_newest or admissible(r, k)):
                first[k] = min(first.get(k, v), v)
    base["queries"] = dict(sorted(queries.items()))
    base["queries_first"] = dict(sorted(first.items()))
    base["value"] = round(sum(queries.values()), 3)
    base["value_first"] = round(sum(first.values()), 3)
    if dropped:
        base["dropped_keys"] = sorted(dropped)
    if fp_dropped:
        base["fp_mismatch_dropped"] = sorted(fp_dropped)

    iso_q: dict[str, float] = {}
    for r in runs:
        for k, v in (r.get("isolated") or {}).get("queries", {}).items():
            if k in live and (r is newest or admissible(r, k)):
                iso_q[k] = min(iso_q.get(k, v), v)
    if iso_q:
        base["isolated"] = {
            "queries": iso_q,
            "agreement": {
                k: round(queries[k] / v, 2)
                for k, v in iso_q.items()
                if v > 0 and k in queries
            },
        }

    base["method"] = (
        "per-query min over the runs in merged_from (the bench's own "
        "steady-state estimator extended across run boundaries; see "
        "tools/bench_merge.py for why single-run probes are not enough)"
    )
    base["merged_from"] = [e for r in runs for e in _provenance_entries(r)]
    # fp-migration provenance survives merges (r12, advisor item on the
    # since-deleted fp_migrate_r11: base = dict(newest) silently dropped
    # the marker, erasing the audit trail AND disarming the migration
    # tools' run-once guards)
    migrations = [
        m
        for r in runs
        for m in r.get("fp_migrations", [])
    ]
    if migrations:
        base["fp_migrations"] = sorted(set(migrations))
    # a merged artifact has no single throttle state or calibration
    # probe list; the per-run stamps live in merged_from
    base["throttle"] = "merged (see merged_from)"
    for f in PER_RUN_FIELDS:
        base.pop(f, None)
    return base


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    out, paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in paths]
    merged = merge(runs)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        json.dumps(
            {
                "out": out,
                "value": merged["value"],
                "runs": [r["value"] for r in runs],
                "dropped_keys": merged.get("dropped_keys", []),
                "isolated": merged.get("isolated"),
            }
        )
    )


if __name__ == "__main__":
    main()
