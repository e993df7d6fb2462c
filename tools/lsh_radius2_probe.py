"""Round-11 scale probe (r10 verdict item 7): EXECUTE the radius-2 LSH
regime that removed the 2^18 table-cap wall, and measure its recall.

``lsh_plan_solve``'s radius/plane escalation (round 10) is unit-tested
to n = 10^10 (tests/test_param_sizing.py) but had never executed above
the sf10 fixture (n = 200k — still radius-1 territory). This probe:

1. Records the PURE SOLVE past the old wall — n = 2^19, 2^20, 10^7 at
   the registered t = 0.4: radius 2, tables well under the 256 budget,
   ``capped`` False (the r9 wall was radius-1-only sizing needing 266
   tables at 2^19).

2. EXECUTES the radius-2 pipeline for real — the same code path the
   natural n >= 2^19 escalation runs: 1+p+C(p,2) probe-mask fan-out,
   posting-list bucketing, pair dedup, Arrow-batched verification — on
   an executable corpus by handing the solve a constrained table
   budget (max_tables=16), which forces the SAME escalation decision
   at n ~ 20k. Executing the NATURAL escalation point locally is ruled
   out by the model's own arithmetic: at n = 2^19 / t = 0.4 the 0.95
   solve wants ~25 tables x 191 probe keys/vector/table, i.e. ~2.4e11
   candidate verifications and a multi-TB candidate shuffle — a
   1000-executor workload by design (the n^(1+rho) bar), not a
   local[32] one. The budget-forced run exercises every line of the
   radius-2 plan at ~8e8 model candidates and measures VERDICT RECALL
   against the md5-capped brute-force twin (the q_sim_pairs_lsh
   discipline).

3. Emits one JSON object (written to the output path, printed to
   stdout): solve records, executed config, wall seconds, pair counts,
   recall, tables_capped.

Corpus: the sf3.0-density fixture's embeddings filtered to
``vec_id % 3 == 0``. Density-mode ids are ``base_id*copies + c``
(tools/scale_up.py), so the filter keeps 10 of the 30 replicas INTACT
— in-replica pair structure (the corpus's entire qualifying pair mass)
is preserved exactly, n drops to ~20k.

Usage:
    python tools/lsh_radius2_probe.py [sf3_density_dir] [out.json]
Defaults: .localdata/sf3.0-density, SCALE_R11_RADIUS2.json (repo root).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

THRESHOLD = 0.4
FORCED_BUDGET = 16
BRUTE_CAP = 6000


def solve_record(n: int, **kw) -> dict:
    from hbase_bulkload_spark.operators.similarity import lsh_plan_solve

    planes, radius, tables, capped = lsh_plan_solve(n, THRESHOLD, **kw)
    keys = sum(math.comb(planes, d) for d in range(radius + 1))
    return {
        "n": n,
        "planes": planes,
        "probe_radius": radius,
        "tables": tables,
        "tables_capped": capped,
        "probe_keys_per_vector_per_table": keys,
        "model_candidates": round(n * n * tables * keys * keys / 2**planes / 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, ".localdata", "sf3.0-density"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, "SCALE_R11_RADIUS2.json"
    )

    from pyspark.sql import functions as F

    from hbase_bulkload_spark.datasets import table
    from hbase_bulkload_spark.operators.similarity import (
        cosine_pairs_exact,
        cosine_pairs_lsh,
        gemm_blocks,
        lsh_plan_solve,
    )
    from hbase_bulkload_spark.session import get_spark

    out: dict = {
        "note": (
            "radius-2 regime execution (budget-forced escalation at n~20k; "
            "the natural n>=2^19 point is cluster-scale by the model bar)"
        ),
        "threshold": THRESHOLD,
        "solve_past_the_wall": [
            solve_record(2**19),
            solve_record(2**20),
            solve_record(10**7),
        ],
    }

    spark = get_spark()
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 3 == 0)
        .cache()
    )
    n = emb.count()
    planes, radius, tables, capped = lsh_plan_solve(
        n, THRESHOLD, max_tables=FORCED_BUDGET
    )
    assert radius == 2 and not capped, (planes, radius, tables, capped)
    out["executed"] = {
        **solve_record(n, max_tables=FORCED_BUDGET),
        "forced_max_tables": FORCED_BUDGET,
        "sf_dir": sf_dir,
    }

    # warm the JIT/worker pool off the clock (the bench prelude trick)
    cosine_pairs_lsh(
        emb.limit(512), threshold=THRESHOLD, n_planes=8, n_tables=2,
        probe_radius=2,
    ).count()

    t0 = time.monotonic()
    pairs = cosine_pairs_lsh(
        emb,
        threshold=THRESHOLD,
        n_planes=planes,
        n_tables=tables,
        probe_radius=radius,
        broadcast_vectors=True,
        signature_partitions=spark.sparkContext.defaultParallelism,
    )
    got = {(r.vec_id_a, r.vec_id_b) for r in pairs.collect()}
    wall = time.monotonic() - t0

    checked = emb.orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    ).limit(BRUTE_CAP)
    checked_ids = {r.vec_id for r in checked.select("vec_id").collect()}
    exact = {
        (r.vec_id_a, r.vec_id_b)
        for r in cosine_pairs_exact(
            checked, threshold=THRESHOLD, n_blocks=gemm_blocks(BRUTE_CAP)
        ).collect()
    }
    got_checked = {
        p for p in got if p[0] in checked_ids and p[1] in checked_ids
    }
    out["executed"].update(
        {
            "wall_sec": round(wall, 3),
            "n_emitted_pairs": len(got),
            "n_checked": min(n, BRUTE_CAP),
            "n_exact_pairs_checked": len(exact),
            "n_hit_checked": len(got_checked & exact),
            "n_spurious_checked": len(got_checked - exact),
            "recall": (
                round(len(got_checked & exact) / len(exact), 4)
                if exact
                else None
            ),
        }
    )

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
