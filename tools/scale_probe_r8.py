"""Assemble SCALE_r8.json: bounded-twin scale probe (VERDICT r7 item 5).

The md5-ranked BRUTE_CHECK_CAP bounds on the verdict-twin arms of
q_dedup_near / q_dedup_incremental_minhash / q_sim_pairs_lsh landed
AFTER SCALE_r6's full record, so the ladder had never measured the
bounded forms past sf1.0. This probe re-measures exactly those three
keys (plus their round-8 raw production arms, which the same fixtures
exercise without any twin) at sf1.0-density and sf3.0-density.

Two different design claims are being verified, so the bar is
PER-KEY, not one global line:

- The four MinHash-banded keys (q_dedup_near*, the incremental pair):
  bands are fixed by the Jaccard threshold (`lsh_banding_params`), not
  by n, and the verdict twins are md5-capped (constant past 6000
  docs), so these should scale AT OR UNDER linear even though their
  uncapped r6 forms were quadratic on the clique fixtures.
- The two sign-LSH keys (q_sim_pairs_lsh*): holding the 0.95
  marginal-recall target costs ~n^rho tables (`lsh_auto_params` — the
  round-8 cap fix made this growth real instead of silently abandoned),
  so total work is ~n^(1+rho), SUBquadratic but SUPERlinear by design.
  The honest bar for these is the model's own prediction,
  step x tables(n_hi)/tables(n_lo), computed here from the actual
  fixture embedding counts — not the linear bar.

Each scale accepts a comma-separated list of bench logs (identical
subset protocol, same machine/fixture); per-query times are the MIN
across logs x the min-of-3 inside each log, which bounds the damage of
throttled windows the calib probes flag.

Usage: python tools/scale_probe_r8.py SF1_LOG[,SF1_LOG2...] \
           SF3_LOG[,SF3_LOG2...] OUT [SF1_DIR SF3_DIR]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe_r7 import detail_line  # same log-parsing contract

#: keys whose cost model is n^(1+rho) sign-LSH table growth; everything
#: else in the probe set is MinHash-banded (threshold-fixed bands) and
#: judged against the linear bar
SIGN_LSH_KEYS = ("q_sim_pairs_lsh", "q_sim_pairs_lsh_raw")


def merged(paths: str) -> dict:
    """Min-merge the per-query timings of several same-protocol logs;
    keep every log's throttle/calib verdict so flagged windows stay
    visible next to the minima that absorb them."""
    docs = [detail_line(p) for p in paths.split(",")]
    queries: dict[str, float] = {}
    for d in docs:
        for q, t in d["queries"].items():
            queries[q] = min(queries.get(q, float("inf")), t)
    return {
        "queries": queries,
        "throttle": [d.get("throttle") for d in docs],
        "calib_sec": [d.get("calib_sec") for d in docs],
        "calib_nominal_sec": docs[0].get("calib_nominal_sec"),
    }


def lsh_model_ratio(sf1_dir: str, sf3_dir: str, step: float) -> dict:
    """Model-predicted sf1->sf3 work ratio for the sign-LSH keys from
    the operator's own sizing law at the registered threshold and the
    actual fixture embedding counts (parquet footer metadata).

    The cost driver is CANDIDATE-PAIR verification (the operator's
    measured A/B note: the Arrow cosine pass is ~4x the rest of the
    query wall), and under multi-probe radius 1 the expected candidate
    count is  n^2 x tables x (1+planes)^2 / 2^planes  — each vector
    emits (1+planes) keys per table into a 2^planes keyspace. With
    planes = ceil(log2 n) the 2^planes term tracks n only in STEPS, so
    bucket occupancy (and hence the local growth exponent) is lumpy
    between adjacent fixtures — e.g. 15 -> 16 planes moves occupancy
    0.61 -> 0.92 here, which is fixture geometry, not plan behavior;
    amortized over decades the model is the classic n^(1+rho). The
    probe-key ratio (shuffle volume) is printed beside it."""
    import pyarrow.dataset as ds

    from hbase_bulkload_spark.operators.similarity import lsh_auto_params
    from hbase_bulkload_spark.queries.extensions import SIM_THRESHOLD

    n1 = ds.dataset(os.path.join(sf1_dir, "embeddings.parquet")).count_rows()
    n3 = ds.dataset(os.path.join(sf3_dir, "embeddings.parquet")).count_rows()
    p1, t1 = lsh_auto_params(n1, SIM_THRESHOLD)
    p3, t3 = lsh_auto_params(n3, SIM_THRESHOLD)
    pairs1 = n1 * n1 * t1 * (1 + p1) ** 2 / 2.0**p1
    pairs3 = n3 * n3 * t3 * (1 + p3) ** 2 / 2.0**p3
    return {
        "threshold": SIM_THRESHOLD,
        "n_embeddings": {"sf1.0_density": n1, "sf3.0_density": n3},
        "planes": {"sf1.0_density": p1, "sf3.0_density": p3},
        "tables": {"sf1.0_density": t1, "sf3.0_density": t3},
        "probe_key_ratio": round(step * (t3 * (1 + p3)) / (t1 * (1 + p1)), 2),
        "predicted_ratio": round(pairs3 / pairs1, 2),
        "quadratic_ratio": round(step * step, 2),
    }


def main() -> None:
    sf1_logs, sf3_logs, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    sf1, sf3 = merged(sf1_logs), merged(sf3_logs)
    step = 3.0
    linear_bar = round(step * 1.2, 2)
    model = None
    if len(sys.argv) > 5:
        model = lsh_model_ratio(sys.argv[4], sys.argv[5], step)
    queries = {}
    for q, t3 in sf3["queries"].items():
        t1 = sf1["queries"].get(q)
        is_lsh = q in SIGN_LSH_KEYS
        ratio = round(t3 / t1, 2) if t1 else None
        row = {
            "sf1.0_density_sec": t1,
            "sf3.0_density_sec": t3,
            "ratio_for_3x_data": ratio,
            "cost_model": "sign-lsh n^(1+rho)" if is_lsh else "linear",
        }
        if is_lsh and model:
            # the sign-LSH design claim is the n^(1+rho) contract; the
            # check is measured-vs-model on the candidate-pair cost
            # model, same x1.2 slack as the linear bar
            bar = round(model["predicted_ratio"] * 1.2, 2)
            row["measured_over_model"] = round(ratio / model["predicted_ratio"], 2)
        else:
            bar = linear_bar
        row["bar"] = bar
        row["within_bar"] = ratio is not None and ratio <= bar
        queries[q] = row
    doc = {
        "note": (
            "bounded-twin scale probe: the three verdict-twin queries "
            "in their round-7 md5-capped form (and their round-8 raw "
            "production arms) at 10x and 30x the bench scale, "
            "constant-density fixtures, same machine, bench.py "
            "min-of-3, min-merged across the listed runs (calib probes "
            "flagged throttled windows; minima absorb them). Per-key "
            "bars: the MinHash-banded keys (threshold-fixed bands, "
            "md5-capped twins) are judged against the linear bar; the "
            "two sign-LSH keys are judged against their OWN cost "
            "model — expected candidate pairs, n^2 tables (1+planes)^2 "
            "/ 2^planes, the verification-dominated cost the operator's "
            "A/B note pins — because holding the 0.95 marginal-recall "
            "target costs ~n^rho tables (lsh_auto_params), so "
            "n^(1+rho) superlinear-subquadratic growth is the design "
            "contract the round-8 cap fix made real, not a regression. "
            "measured_over_model shows how far each key sits from the "
            "prediction (the ceil(log2 n) plane step makes the LOCAL "
            "exponent lumpy between adjacent fixtures); the quadratic "
            "alternative (step^2) is printed beside it."
        ),
        "data_step": step,
        "linear_bar": linear_bar,
        "sign_lsh_model": model,
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
