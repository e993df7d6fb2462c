"""tools/scale_probe.py contract: per-key bars encode each family's own
cost model — and when the sign-LSH model is unavailable (no fixture
dirs), the superlinear-by-design keys must NOT be graded against the
linear bar (round-9 advisor item). Spark-free."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from scale_probe import build  # noqa: E402


def _log(tmp_path, name, queries):
    p = tmp_path / name
    p.write_text(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": sum(queries.values()),
                "queries": queries,
                "throttle": "ok",
                "calib_sec": [0.6],
                "calib_nominal_sec": 0.58,
            }
        )
        + "\n"
    )
    return str(p)


def _args(tmp_path, lo_q, hi_q, **over):
    lo = _log(tmp_path, "lo.log", lo_q)
    hi = _log(tmp_path, "hi.log", hi_q)
    ns = argparse.Namespace(
        lo=f"sf1={lo}",
        hi=f"sf3={hi}",
        step=3.0,
        lo_dir=None,
        hi_dir=None,
        carries_forward="",
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_linear_keys_judged_against_linear_bar(tmp_path):
    doc = build(_args(tmp_path, {"q_dedup_near": 10.0}, {"q_dedup_near": 33.0}))
    row = doc["queries"]["q_dedup_near"]
    assert row["bar"] == 3.6  # 3.0 step x 1.2 slack
    assert row["within_bar"] is True
    assert row["cost_model"] == "linear"


def test_sign_lsh_without_model_emits_null_bar(tmp_path):
    """No --lo-dir/--hi-dir → no n^(1+rho) model → the sign-LSH keys'
    design contract cannot be graded against the linear bar; the row
    must say 'no verdict', not 'failed'."""
    doc = build(
        _args(tmp_path, {"q_sim_pairs_lsh_raw": 10.0}, {"q_sim_pairs_lsh_raw": 70.0})
    )
    row = doc["queries"]["q_sim_pairs_lsh_raw"]
    assert row["bar"] is None
    assert row["within_bar"] is None
    assert row["cost_model"].startswith("sign-lsh")


def test_sign_lsh_with_model_graded_against_model_bar(tmp_path):
    lo_dir, hi_dir = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    if not (
        os.path.exists(os.path.join(lo_dir, "embeddings.parquet"))
        and os.path.exists(os.path.join(hi_dir, "embeddings.parquet"))
    ):
        import pytest

        pytest.skip("fixtures unavailable")
    doc = build(
        _args(
            tmp_path,
            {"q_sim_pairs_lsh_raw": 10.0},
            {"q_sim_pairs_lsh_raw": 70.0},
            lo_dir=lo_dir,
            hi_dir=hi_dir,
        )
    )
    row = doc["queries"]["q_sim_pairs_lsh_raw"]
    assert row["bar"] == round(doc["sign_lsh_model"]["predicted_ratio"] * 1.2, 2)
    assert "measured_over_model" in row


def test_ivf_pair_key_graded_against_n15_bar(tmp_path):
    """q_sim_pairs_ivf's design contract is n^1.5 (sqrt(n) cells,
    2-assign): the bar is step^1.5 x 1.2, not the linear bar and not
    the sign-LSH model."""
    doc = build(
        _args(tmp_path, {"q_sim_pairs_ivf": 10.0}, {"q_sim_pairs_ivf": 55.0})
    )
    row = doc["queries"]["q_sim_pairs_ivf"]
    assert row["cost_model"] == "ivf-pair n^1.5"
    assert row["bar"] == round(3.0**1.5 * 1.2, 2)  # 6.24
    assert row["within_bar"] is True
    hot = build(
        _args(tmp_path, {"q_sim_pairs_ivf": 10.0}, {"q_sim_pairs_ivf": 90.0})
    )
    assert hot["queries"]["q_sim_pairs_ivf"]["within_bar"] is False
