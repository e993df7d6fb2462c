"""tools/bench_merge.py contract: per-query minima across runs,
provenance preserved, isolated agreement recomputed against the merged
minima. Spark-free."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from bench_merge import merge  # noqa: E402


def _run(queries, value=None, iso=None, throttle="ok"):
    r = {
        "queries": dict(queries),
        "queries_first": {k: v + 1.0 for k, v in queries.items()},
        "value": value if value is not None else round(sum(queries.values()), 3),
        "throttle": throttle,
        "calib_sec": [0.6],
        "calib_mc_sec": [0.3],
    }
    if iso:
        r["isolated"] = {"queries": iso, "agreement": {}}
    return r


def test_per_query_minima_and_total():
    a = _run({"q_x": 2.0, "q_y": 5.0})
    b = _run({"q_x": 3.0, "q_y": 4.0}, throttle="throttled(x1.4)")
    m = merge([a, b])
    assert m["queries"] == {"q_x": 2.0, "q_y": 4.0}
    assert m["value"] == 6.0
    # provenance: every run's total + stamp survives
    assert [r["value"] for r in m["merged_from"]] == [a["value"], b["value"]]
    assert m["merged_from"][1]["throttle"].startswith("throttled")
    assert m["throttle"].startswith("merged")


def test_key_present_in_only_some_runs_takes_min_over_those():
    a = _run({"q_x": 2.0})
    b = _run({"q_x": 2.5, "q_new": 1.5})  # newly registered key
    m = merge([a, b])
    assert m["queries"] == {"q_new": 1.5, "q_x": 2.0}


def test_isolated_agreement_recomputed_vs_merged_minimum():
    # run A has the better in-registry number; run B the better isolated
    a = _run({"q_h": 9.0}, iso={"q_h": 10.0})
    b = _run({"q_h": 12.0}, iso={"q_h": 9.5})
    m = merge([a, b])
    assert m["isolated"]["queries"]["q_h"] == 9.5
    assert m["isolated"]["agreement"]["q_h"] == round(9.0 / 9.5, 2)
