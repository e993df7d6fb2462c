"""Assemble SCALE_r7.json: the third-decade scale probe (VERDICT r6
item 3) — the worst-4 queries of the round-6 density record re-measured
at sf3.0-density AND sf10.0-density (100x the bench scale: 60M
lineitem / 500k documents, constant near-dup density), same session,
same machine, bench.py min-of-3 protocol with throttle verdicts.

The data step between the fixtures is 10/3 = 3.33x; linear scaling
predicts ratios ~3.3x. Carries forward SCALE_r6's full 10x-step record
(this round's probes extend, not replace, that artifact).

Usage: python tools/scale_probe_r7.py SF3_LOG SF10_LOG OUT
"""

from __future__ import annotations

import json
import sys


def detail_line(path: str) -> dict:
    best = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "queries" in d and (
                    best is None or len(d["queries"]) >= len(best["queries"])
                ):
                    best = d
    if best is None:
        raise SystemExit(f"no bench JSON in {path}")
    return best


def main() -> None:
    sf3_log, sf10_log, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    sf3, sf10 = detail_line(sf3_log), detail_line(sf10_log)
    step = 10.0 / 3.0
    queries = {}
    for q, t10 in sf10["queries"].items():
        t3 = sf3["queries"].get(q)
        queries[q] = {
            "sf3.0_density_sec": t3,
            "sf10.0_density_sec": t10,
            "ratio_for_3.33x_data": round(t10 / t3, 2) if t3 else None,
        }
    doc = {
        "note": (
            "third-decade constant-density probe: worst-4 of the r6 "
            "density record at 30x and 100x the bench scale, same "
            "session/machine, bench.py min-of-3. Linear scaling "
            "predicts ~3.33x per step. sf3 base re-measured fresh (not "
            "reused from SCALE_r6) so the ratio is same-machine-state."
        ),
        "data_step": round(step, 3),
        "linear_bar": round(step * 1.2, 2),
        "queries": queries,
        "throttle": {
            "sf3.0_density": sf3.get("throttle"),
            "sf10.0_density": sf10.get("throttle"),
        },
        "calib": {
            "sf3.0_density": sf3.get("calib_sec"),
            "sf10.0_density": sf10.get("calib_sec"),
            "nominal": sf3.get("calib_nominal_sec"),
        },
        "carries_forward": "SCALE_r6.json (full 137-query 10x record)",
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(doc["queries"], indent=1))


if __name__ == "__main__":
    main()
