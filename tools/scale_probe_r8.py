"""Assemble SCALE_r8.json: bounded-twin scale probe (VERDICT r7 item 5).

The md5-ranked BRUTE_CHECK_CAP bounds on the verdict-twin arms of
q_dedup_near / q_dedup_incremental_minhash / q_sim_pairs_lsh landed
AFTER SCALE_r6's full record, so the ladder had never measured the
bounded forms past sf1.0. This probe re-measures exactly those three
keys (plus their round-8 raw production arms, which the same fixtures
exercise without any twin) at sf1.0-density and sf3.0-density — the
design claim being verified is that past the cap the twin arm's cost
stops growing with the corpus, so the bounded queries should scale AT
OR UNDER linear even though their uncapped r6 forms were quadratic in
the clique fixtures.

Usage: python tools/scale_probe_r8.py SF1_LOG SF3_LOG OUT
"""

from __future__ import annotations

import json
import sys

from scale_probe_r7 import detail_line  # same log-parsing contract


def main() -> None:
    sf1_log, sf3_log, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    sf1, sf3 = detail_line(sf1_log), detail_line(sf3_log)
    step = 3.0
    queries = {}
    for q, t3 in sf3["queries"].items():
        t1 = sf1["queries"].get(q)
        queries[q] = {
            "sf1.0_density_sec": t1,
            "sf3.0_density_sec": t3,
            "ratio_for_3x_data": round(t3 / t1, 2) if t1 else None,
        }
    doc = {
        "note": (
            "bounded-twin scale probe: the three verdict-twin queries "
            "in their round-7 md5-capped form (and their round-8 raw "
            "production arms) at 10x and 30x the bench scale, "
            "constant-density fixtures, same session/machine, bench.py "
            "min-of-3. Linear scaling predicts ~3x per step; the caps "
            "should hold the twin arms at or under that even though "
            "the uncapped forms scaled quadratically on clique "
            "fixtures."
        ),
        "data_step": step,
        "linear_bar": round(step * 1.2, 2),
        "queries": queries,
        "throttle": {
            "sf1.0_density": sf1.get("throttle"),
            "sf3.0_density": sf3.get("throttle"),
        },
        "calib": {
            "sf1.0_density": sf1.get("calib_sec"),
            "sf3.0_density": sf3.get("calib_sec"),
            "nominal": sf1.get("calib_nominal_sec"),
        },
        "carries_forward": (
            "SCALE_r6.json (full 137-query 10x record), SCALE_r7.json "
            "(worst-4 third decade)"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(doc["queries"], indent=1))


if __name__ == "__main__":
    main()
