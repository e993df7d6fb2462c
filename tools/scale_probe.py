"""Assemble a SCALE_r{N}.json artifact from two constant-density scale
fixtures' bench logs — the single parameterized successor to the
per-round scale_probe_r7/_r8 scripts (round-9 verdict item 9).

What it measures: per-query wall-clock ratio between a LO and a HI
scale fixture (both produced by ``tools/scale_up.py`` mode=density, so
near-dup/ANN OUTPUT density is constant and the ratio isolates
data-scaling from output-scaling). Each scale accepts a comma-separated
list of bench logs (identical subset protocol, same machine/fixture);
per-query times are the MIN across logs x the min-of-3 inside each log,
which bounds the damage of throttled windows the calib probes flag.

Per-key bars encode each operator family's own design contract:

- MinHash-banded keys (q_dedup_near*, the incremental pair): bands are
  fixed by the Jaccard threshold (``lsh_banding_params``), not by n,
  and the verdict twins are md5-capped (constant past BRUTE_CHECK_CAP
  docs), so the bar is LINEAR (step x 1.2 slack).
- Sign-LSH keys (q_sim_pairs_lsh*): holding the 0.95 marginal-recall
  target costs ~n^rho tables (``lsh_auto_params``), so total work is
  ~n^(1+rho) — SUBquadratic but SUPERlinear by design. The bar is the
  model's own prediction: expected candidate pairs
  n^2 x tables x (1+planes)^2 / 2^planes (verification-dominated cost,
  per the operator's A/B note), computed from the actual fixture
  embedding counts. With planes = ceil(log2 n) the local exponent is
  lumpy between adjacent fixtures (a plane step moves bucket occupancy
  discontinuously); amortized over decades the model is the classic
  n^(1+rho).

CAP INSTRUMENTATION (round-9 verdict item 8): when fixture dirs are
given, the artifact records — per scale — whether the 256-table recall
solve was CLAMPED (``lsh_auto_params_solve`` capped flag). A probe run
where the cap binds is measuring the degraded-recall regime, not the
n^(1+rho) contract; the flag makes that visible in the artifact instead
of discoverable only by re-deriving the solve. (Binding point at the
registered t=0.4: n > 2^18 = 262,144 — the 19-plane solve needs 266
tables.)

Usage:
    python tools/scale_probe.py \
        --lo  sf3.0_density=LOG1[,LOG2...] \
        --hi  sf10.0_density=LOG1[,LOG2...] \
        --step 3.333 --out SCALE_r9.json \
        [--lo-dir .localdata/sf3.0-density --hi-dir .localdata/sf10.0-density] \
        [--carries-forward "SCALE_r6.json (...), ..."]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: keys whose cost model is n^(1+rho) sign-LSH table growth; everything
#: else in the probe set is MinHash-banded (threshold-fixed bands) and
#: judged against the linear bar
SIGN_LSH_KEYS = ("q_sim_pairs_lsh", "q_sim_pairs_lsh_raw")

#: keys whose cost model is the IVF pair blocking contract: sqrt(n)
#: cells x 2-assign -> assignment GEMM n·sqrt(n) plus within-cell pair
#: work (r²/2)·n^1.5 — BOTH terms n^1.5, so the design bar for an s×
#: data step is s^1.5 (x1.2 slack), sub-quadratic by construction with
#: no table/recall solve that can cap out (operators/similarity.py::
#: cosine_pairs_ivf)
IVF_PAIR_KEYS = ("q_sim_pairs_ivf", "q_sim_pairs_ivf_clustered")


def detail_line(path: str) -> dict:
    """The richest bench JSON line in a log (the full detail line)."""
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


def lsh_model_ratio(lo_dir: str, hi_dir: str, lo: str, hi: str, step: float) -> dict:
    """Model-predicted lo->hi work ratio for the sign-LSH keys from the
    operator's own sizing law at the registered threshold and the
    actual fixture embedding counts (parquet footer metadata), plus the
    capped flag per scale (see module docstring)."""
    import math

    import pyarrow.dataset as ds

    from hbase_bulkload_spark.operators.similarity import lsh_plan_solve
    from hbase_bulkload_spark.queries.extensions import SIM_THRESHOLD

    n1 = ds.dataset(os.path.join(lo_dir, "embeddings.parquet")).count_rows()
    n2 = ds.dataset(os.path.join(hi_dir, "embeddings.parquet")).count_rows()
    p1, r1, t1, c1 = lsh_plan_solve(n1, SIM_THRESHOLD)
    p2, r2, t2, c2 = lsh_plan_solve(n2, SIM_THRESHOLD)
    k1 = sum(math.comb(p1, d) for d in range(0, r1 + 1))
    k2 = sum(math.comb(p2, d) for d in range(0, r2 + 1))
    pairs1 = n1 * n1 * t1 * k1 * k1 / 2.0**p1
    pairs2 = n2 * n2 * t2 * k2 * k2 / 2.0**p2
    return {
        "threshold": SIM_THRESHOLD,
        "n_embeddings": {lo: n1, hi: n2},
        "planes": {lo: p1, hi: p2},
        "probe_radius": {lo: r1, hi: r2},
        "tables": {lo: t1, hi: t2},
        "tables_capped": {lo: c1, hi: c2},
        "probe_key_ratio": round(step * (t2 * k2) / (t1 * k1), 2),
        "predicted_ratio": round(pairs2 / pairs1, 2),
        "quadratic_ratio": round(step * step, 2),
    }


def build(args: argparse.Namespace) -> dict:
    lo_name, lo_logs = args.lo.split("=", 1)
    hi_name, hi_logs = args.hi.split("=", 1)
    lo, hi = merged(lo_logs), merged(hi_logs)
    step = args.step
    linear_bar = round(step * 1.2, 2)
    model = None
    if args.lo_dir and args.hi_dir:
        model = lsh_model_ratio(args.lo_dir, args.hi_dir, lo_name, hi_name, step)
    ivf_bar = round(step**1.5 * 1.2, 2)
    queries = {}
    for q, t_hi in hi["queries"].items():
        t_lo = lo["queries"].get(q)
        is_lsh = q in SIGN_LSH_KEYS
        is_ivf = q in IVF_PAIR_KEYS
        ratio = round(t_hi / t_lo, 2) if t_lo else None
        row = {
            f"{lo_name}_sec": t_lo,
            f"{hi_name}_sec": t_hi,
            f"ratio_for_{step:g}x_data": ratio,
            "cost_model": (
                "sign-lsh n^(1+rho)"
                if is_lsh
                else "ivf-pair n^1.5" if is_ivf else "linear"
            ),
        }
        if is_ivf:
            row["bar"] = ivf_bar
            row["within_bar"] = ratio is not None and ratio <= ivf_bar
            queries[q] = row
            continue
        if is_lsh and model and ratio is not None:
            bar = round(model["predicted_ratio"] * 1.2, 2)
            row["measured_over_model"] = round(
                ratio / model["predicted_ratio"], 2
            )
        elif is_lsh:
            # no fixture dirs → no n^(1+rho) model; grading the
            # superlinear design contract against the linear bar would
            # report within_bar=false for behavior the tool itself
            # defines as correct (round-9 advisor item) — emit null
            bar = None
        else:
            bar = linear_bar
        row["bar"] = bar
        row["within_bar"] = (
            None if bar is None else ratio is not None and ratio <= bar
        )
        queries[q] = row
    return {
        "note": (
            "constant-density scale probe (tools/scale_probe.py — the "
            "parameterized successor to scale_probe_r7/_r8): per-query "
            f"ratio {lo_name} -> {hi_name} ({step:g}x data), same "
            "machine, bench.py min-of-3, min-merged across the listed "
            "runs (calib probes flagged throttled windows; minima "
            "absorb them). Per-key bars: MinHash-banded keys "
            "(threshold-fixed bands, md5-capped twins) against the "
            "linear bar; sign-LSH keys against their OWN candidate-pair "
            "cost model (n^(1+rho) is the design contract, not a "
            "regression), with the 256-table cap's capped flag recorded "
            "per scale so a clamped solve cannot masquerade as the "
            "contract regime."
        ),
        "data_step": round(step, 3),
        "linear_bar": linear_bar,
        "sign_lsh_model": model,
        "queries": queries,
        "throttle": {lo_name: lo.get("throttle"), hi_name: hi.get("throttle")},
        "calib": {
            lo_name: lo.get("calib_sec"),
            hi_name: hi.get("calib_sec"),
            "nominal": lo.get("calib_nominal_sec"),
        },
        "carries_forward": args.carries_forward,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lo", required=True, help="NAME=LOG[,LOG...] (smaller scale)")
    ap.add_argument("--hi", required=True, help="NAME=LOG[,LOG...] (larger scale)")
    ap.add_argument("--step", type=float, required=True, help="data ratio hi/lo")
    ap.add_argument("--out", required=True)
    ap.add_argument("--lo-dir", help="fixture dir of the LO scale (enables the LSH model)")
    ap.add_argument("--hi-dir", help="fixture dir of the HI scale")
    ap.add_argument(
        "--carries-forward",
        default=(
            "SCALE_r6.json (full 137-query 10x record), SCALE_r7.json "
            "(worst-4 third decade), SCALE_r8.json (bounded-twin 10x/30x)"
        ),
    )
    args = ap.parse_args()
    doc = build(args)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(doc["queries"], indent=1))


if __name__ == "__main__":
    main()
