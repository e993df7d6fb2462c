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


def test_renamed_or_retired_keys_never_resurrect():
    """Round-9 advisor item: the newest run's key set is authoritative —
    a key renamed between runs must not be double-counted under both
    names, and a retired key must not haunt the merged total."""
    a = _run({"q_old_name": 2.0, "q_keep": 1.0})
    b = _run({"q_new_name": 2.2, "q_keep": 1.1})  # q_old_name renamed
    m = merge([a, b])
    assert m["queries"] == {"q_keep": 1.0, "q_new_name": 2.2}
    assert m["value"] == 3.2
    assert m["dropped_keys"] == ["q_old_name"]
    assert "q_old_name" not in m["queries_first"]


def test_per_run_calibration_fields_dropped_from_merge_top_level():
    """calib_sec/calib_mc_sec/worker_recycle describe one run's window;
    the merged artifact must not present them as describing the merge —
    merged_from carries them per run."""
    a = _run({"q_x": 2.0})
    b = _run({"q_x": 3.0})
    b["worker_recycle"] = "ok"
    m = merge([a, b])
    for f in ("calib_sec", "calib_mc_sec", "worker_recycle"):
        assert f not in m
    assert m["merged_from"][0]["calib_sec"] == [0.6]
    assert m["merged_from"][1]["worker_recycle"] == "ok"


def test_merging_a_merged_artifact_flattens_provenance():
    a = _run({"q_x": 2.0})
    b = _run({"q_x": 3.0})
    first = merge([a, b])
    c = _run({"q_x": 2.5})
    second = merge([first, c])
    assert second["queries"] == {"q_x": 2.0}
    # provenance has THREE run entries, not a nested merged entry
    assert len(second["merged_from"]) == 3
    assert all("n_queries" in e for e in second["merged_from"])


def test_bench_write_merge_preserves_minima(tmp_path):
    """Round-9 verdict item 3: a throttled single run written through
    bench.py's on-write merge must preserve the existing artifact's
    per-key minima and provenance, never clobber them."""
    import json

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import _merge_into_existing

    good = _run({"q_x": 2.0, "q_y": 4.0})
    good.update({"sf": 0.1, "sf_dir": "/root/testdata/sf0.1"})
    path = tmp_path / "BENCH_FULL_LATEST.json"
    path.write_text(json.dumps(good))
    throttled = _run(
        {"q_x": 2.9, "q_y": 5.7}, throttle="throttled(x1.4)"
    )
    throttled.update({"sf": 0.1, "sf_dir": "/root/testdata/sf0.1"})
    out = _merge_into_existing(str(path), throttled, 0.1, "/root/testdata/sf0.1")
    assert out["queries"] == {"q_x": 2.0, "q_y": 4.0}
    assert out["value"] == 6.0
    assert [e["throttle"] for e in out["merged_from"]] == [
        "ok", "throttled(x1.4)"
    ]
    # a different scale/fixture must NOT merge (would fabricate minima)
    other = _merge_into_existing(str(path), throttled, 0.01, "/root/testdata/sf0.01")
    assert other is throttled
    # a subset artifact on disk must not contaminate a full run
    subset = dict(good, subset_only=["q_x"])
    path.write_text(json.dumps(subset))
    full = _merge_into_existing(str(path), throttled, 0.1, "/root/testdata/sf0.1")
    assert full is throttled


def test_fp_mismatch_drops_stale_minimum():
    """Round-9 advisor item (bench.py:295): a key whose registered plan
    changed in place under the same name must take the NEWEST run's
    number — the old plan's faster minimum is a time the current code
    cannot produce (q_dedup_near's retired verdict plan survived the
    round-9 merge exactly this way)."""
    a = _run({"q_x": 2.0, "q_y": 5.0})
    a["plan_fp"] = {"q_x": "aaa111", "q_y": "bbb222"}
    b = _run({"q_x": 3.0, "q_y": 4.5})
    b["plan_fp"] = {"q_x": "aaa111", "q_y": "CHANGED"}  # q_y replanned
    m = merge([a, b])
    assert m["queries"] == {"q_x": 2.0, "q_y": 4.5}
    assert m["fp_mismatch_dropped"] == ["q_y"]
    # queries_first obeys the same gate
    assert m["queries_first"]["q_y"] == 5.5


def test_fp_missing_on_old_run_is_not_mergeable():
    """An old artifact without a fingerprint for a key cannot prove its
    number came from the current plan — strict drop (the one-time reset
    this causes is cheaper than a minimum no code path can reproduce)."""
    a = _run({"q_x": 2.0})  # legacy artifact: no plan_fp at all
    b = _run({"q_x": 3.0})
    b["plan_fp"] = {"q_x": "aaa111"}
    m = merge([a, b])
    assert m["queries"] == {"q_x": 3.0}
    assert m["fp_mismatch_dropped"] == ["q_x"]


def test_fp_legacy_mode_when_newest_has_no_fingerprints():
    """Merging two historical (pre-fingerprint) artifacts keeps the old
    unguarded behavior."""
    a = _run({"q_x": 2.0})
    b = _run({"q_x": 3.0})
    m = merge([a, b])
    assert m["queries"] == {"q_x": 2.0}
    assert "fp_mismatch_dropped" not in m


def test_fp_gate_applies_to_isolated_numbers():
    a = _run({"q_h": 9.0}, iso={"q_h": 8.0})
    a["plan_fp"] = {"q_h": "OLDPLAN"}
    b = _run({"q_h": 12.0}, iso={"q_h": 11.0})
    b["plan_fp"] = {"q_h": "NEWPLAN"}
    m = merge([a, b])
    assert m["isolated"]["queries"]["q_h"] == 11.0
