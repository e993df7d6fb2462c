"""Build SCALE_r{N}.json: the measured sf0.1 -> sf1.0 scaling record.

Inputs are bench.py logs (same session, same machine) and the sf1.0
oracle-gate log. Output is one JSON document with, per query: steady
seconds at each scale, the scaling ratio, and an ``outlier`` flag when
the ratio exceeds the super-linear bar (default 15x for a 10x data
step — VERDICT r4 'next round' item 1's criterion).

Since round 6 an optional fourth bench log adds the CONSTANT-DENSITY
sf1.0 fixture (tools/scale_up.py mode=density): ``ratio`` measures the
clique fixture (data x10 AND near-dup pair output x~45), while
``ratio_density`` isolates pure data-scaling (pair output x10). A query
whose clique ratio is high but whose density ratio is ~linear scales
fine — its output grew, not its plan.

Usage:
  python tools/scale_report.py BENCH_SF01 BENCH_SF1 GATE_LOG OUT [BENCH_SF1_DENSITY]
"""

from __future__ import annotations

import json
import re
import sys

SUPERLINEAR = 15.0


def last_json_line(path: str) -> dict:
    """bench.py prints two JSON lines; line 1 carries the full per-query
    detail — prefer it, fall back to the compact tail line."""
    best = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if best is None or len(d.get("queries", {})) > len(
                    best.get("queries", {})
                ):
                    best = d
    if best is None:
        raise SystemExit(f"no JSON line found in {path}")
    return best


def gate_summary(path: str) -> dict:
    res = {}
    pat = re.compile(
        r"^(PASS|FAIL|rows) (q_\w+):"
    )
    with open(path) as f:
        for raw in f:
            for line in raw.split("\r"):
                m = pat.match(line.strip())
                if m:
                    res[m.group(2)] = {
                        "PASS": "pass",
                        "rows": "rows_only",
                        "FAIL": "fail",
                    }[m.group(1)]
    return res


def main() -> None:
    b01, b1, gate_log, out = sys.argv[1:5]
    dens = last_json_line(sys.argv[5]) if len(sys.argv) > 5 else None
    d01 = last_json_line(b01)
    d1 = last_json_line(b1)
    gate = gate_summary(gate_log)
    qs = {}
    outliers = []
    dens_outliers = []
    for q, t1 in d1.get("queries", {}).items():
        t01 = d01.get("queries", {}).get(q)
        ratio = round(t1 / t01, 2) if t01 and t01 > 0 else None
        rec = {
            "sf0.1_sec": t01,
            "sf1.0_sec": round(t1, 3),
            "ratio": ratio,
            "gate": gate.get(q, "absent"),
        }
        if dens is not None:
            td = dens.get("queries", {}).get(q)
            if td is not None:
                rec["sf1.0_density_sec"] = round(td, 3)
                rec["ratio_density"] = (
                    round(td / t01, 2) if t01 and t01 > 0 else None
                )
                if rec["ratio_density"] and rec["ratio_density"] > SUPERLINEAR:
                    dens_outliers.append(q)
        if ratio is not None and ratio > SUPERLINEAR:
            rec["outlier"] = True
            outliers.append(q)
        qs[q] = rec
    doc = {
        "data_step": 10.0,
        "superlinear_bar": SUPERLINEAR,
        "total_sf0.1_sec": d01.get("value"),
        "total_sf1.0_sec": d1.get("value"),
        "gate_counts": {
            s: sum(1 for v in gate.values() if v == s)
            for s in ("pass", "rows_only", "fail")
        },
        "outliers": outliers,
        "queries": qs,
    }
    if dens is not None:
        doc["total_sf1.0_density_sec"] = dens.get("value")
        doc["density_outliers"] = dens_outliers
        doc["throttle"] = {
            "sf0.1": d01.get("throttle"),
            "sf1.0": d1.get("throttle"),
            "sf1.0_density": dens.get("throttle"),
        }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(
        f"wrote {out}: {len(qs)} queries, "
        f"gate={doc['gate_counts']}, outliers={outliers or 'none'}"
    )


if __name__ == "__main__":
    main()
