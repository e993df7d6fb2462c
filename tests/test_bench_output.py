"""bench.py output contract: the FINAL line must parse as JSON and fit
the driver's 2000-char tail capture window regardless of registry size —
round 2 lost its whole perf record to a single over-long line, so this
is pinned here, Spark-free."""

from __future__ import annotations

import json

from bench import SUMMARY_BUDGET, build_output_lines


def _fake(n: int) -> dict[str, float]:
    return {f"q_very_long_query_name_number_{i:04d}": round(0.1 + i * 0.037, 3) for i in range(n)}


def test_summary_line_fits_tail_window_at_any_registry_size():
    for n in (1, 50, 118, 400):
        timings = _fake(n)
        detail_line, summary_line = build_output_lines(timings, timings, 0.1)
        assert len(summary_line) <= SUMMARY_BUDGET + 1
        assert SUMMARY_BUDGET < 2000
        s = json.loads(summary_line)
        d = json.loads(detail_line)
        assert s["metric"] == "total_query_sec" and s["unit"] == "sec"
        assert s["value"] == d["value"] == round(sum(timings.values()), 3)
        assert len(d["queries"]) == n  # detail always carries everything
        assert len(s["queries"]) + s["queries_omitted"] == n


def test_summary_inlines_slowest_first():
    timings = _fake(300)
    _, summary_line = build_output_lines(timings, timings, 0.1)
    s = json.loads(summary_line)
    assert 0 < len(s["queries"]) < 300
    inline_min = min(s["queries"].values())
    omitted_max = max(v for k, v in timings.items() if k not in s["queries"])
    assert inline_min >= omitted_max  # per-query perf bar sees the slow ones


def test_calibration_fields_recorded_and_budget_holds():
    """Round-6 protocol hardening: the throttle calibration probes and
    verdict ride BOTH output lines, and the summary still fits the tail
    window with them aboard."""
    from bench import CALIB_NOMINAL_SEC, THROTTLE_BAR, throttle_verdict

    timings = _fake(300)
    probes = [1.2, 1.25, 1.19, 1.21]
    detail_line, summary_line = build_output_lines(timings, timings, 0.1, probes)
    assert len(summary_line) <= SUMMARY_BUDGET + 1
    for line in (detail_line, summary_line):
        j = json.loads(line)
        assert j["calib_sec"] == [round(p, 3) for p in probes]
        assert j["calib_nominal_sec"] == CALIB_NOMINAL_SEC
        assert j["throttle"] == throttle_verdict(probes)
    assert CALIB_NOMINAL_SEC is not None
    ok = throttle_verdict([CALIB_NOMINAL_SEC] * 3)
    assert ok == "ok"
    bad = throttle_verdict(
        [CALIB_NOMINAL_SEC, CALIB_NOMINAL_SEC * (THROTTLE_BAR + 1)]
    )
    assert bad.startswith("throttled(x")


def test_nominal_env_override_resolution():
    """SPARK_GRAFT_CALIB_NOMINAL override (round-7 advice): unset keeps
    the committed default, "none"/"" disables the verdict (→
    "uncalibrated" instead of a misleading ok/throttled on foreign
    hardware), a number replaces the nominal."""
    from bench import _resolve_nominal

    assert _resolve_nominal(None, 1.164) == 1.164
    assert _resolve_nominal("none", 1.164) is None
    assert _resolve_nominal("", 1.164) is None
    assert _resolve_nominal("2.5", 1.164) == 2.5


def test_detail_line_carries_host_id_and_full_query_map():
    """Round-7 artifact fix: the detail line (persisted to
    BENCH_FULL_LATEST.json by main()) records every per-query timing
    plus a hardware identifier next to the nominal, so cross-round
    comparison of the cheap tail and nominal/hardware mismatches are
    both possible from artifacts alone."""
    timings = _fake(137)
    detail_line, _ = build_output_lines(timings, timings, 0.1, [1.2])
    d = json.loads(detail_line)
    assert len(d["queries"]) == 137 and len(d["queries_first"]) == 137
    assert "calib_host" in d and "cpus" in d["calib_host"]


def test_isolated_probe_rides_summary_within_budget():
    """Round-8: the isolated re-probe's numbers + agreement ratios must
    reach the driver's tail capture (they are the evidence that
    in-registry Python-stage timings are contention-free), and adding
    them must not push the summary line past the budget at any registry
    size."""
    iso = {
        "queries": {"q_bulkload_hfile": 7.123},
        "agreement": {"q_bulkload_hfile": 1.04},
    }
    for n in (1, 118, 400):
        timings = _fake(n)
        detail_line, summary_line = build_output_lines(
            timings, timings, 0.1, [0.5, 0.6], iso
        )
        assert len(summary_line) <= SUMMARY_BUDGET + 1
        s = json.loads(summary_line)
        d = json.loads(detail_line)
        assert s["isolated"]["agreement"]["q_bulkload_hfile"] == 1.04
        assert d["isolated"]["queries"]["q_bulkload_hfile"] == 7.123
    # probe subprocess failure degrades to an error note, never a crash
    detail_line, summary_line = build_output_lines(
        timings, timings, 0.1, [0.5], {"error": "TimeoutExpired: x"}
    )
    assert "isolated" not in json.loads(summary_line)
    assert json.loads(detail_line)["isolated"]["error"].startswith("Timeout")


def test_multicore_probe_drives_throttle_verdict():
    """Round-8: a clean single-core probe must NOT clear a capped
    multicore window (the 2026-08-16 run read sc x1.3 while 32-thread
    stages ran x2) — the verdict takes the worst ratio across modes."""
    import bench

    sc_ok = [bench.CALIB_NOMINAL_SEC]  # exactly nominal
    mc_bad = [bench.CALIB_MC_NOMINAL_SEC * 2.0]
    v = bench.throttle_verdict(sc_ok, mc_bad)
    assert v.startswith("throttled(x2")
    assert bench.throttle_verdict(sc_ok, [bench.CALIB_MC_NOMINAL_SEC]) == "ok"
    # no mc probes (older callers) — single-core-only behavior unchanged
    assert bench.throttle_verdict(sc_ok, None) == "ok"
    _, summary_line = build_output_lines(_fake(5), _fake(5), 0.1, sc_ok, None, mc_bad)
    s = json.loads(summary_line)
    assert s["calib_mc_sec"] and s["throttle"].startswith("throttled")


def test_steady_minima_tolerates_zero_steady_passes():
    """SPARK_GRAFT_BENCH_PASSES=0 probes: the minima reduction must work
    with no steady passes — the one-arg min(first[name]) form raised
    TypeError AFTER the timed passes, losing two ~70-minute sf10-density
    probe measurements to a post-processing crash (round 9)."""
    from bench import steady_minima

    assert steady_minima({"q": 5.0}, [], ["q"]) == {"q": 5.0}
    assert steady_minima(
        {"q": 5.0, "r": 1.0}, [{"q": 3.25, "r": 2.0}], ["q", "r"]
    ) == {"q": 3.25, "r": 1.0}


def test_plan_fingerprint_stable_and_plan_sensitive(spark):
    """_plan_fingerprint must be (a) identical across two builds of the
    same query in one session — expression ids and paths differ, the
    normalized hash must not — and (b) different when the plan itself
    differs, else the min-merge fingerprint gate (round-9 advisor item)
    is either always-dropping or never-dropping."""
    from bench import _plan_fingerprint

    sf_dir = "/root/testdata/sf0.001"
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for key in ("q_sql_tpch1", "q_dedup_exact"):
        if key not in qs:
            continue
        fp1 = _plan_fingerprint(qs[key](spark, sf_dir), sf_dir)
        fp2 = _plan_fingerprint(qs[key](spark, sf_dir), sf_dir)
        assert fp1 == fp2 != "unavailable", key
    a = _plan_fingerprint(qs["q_dedup_exact"](spark, sf_dir), sf_dir)
    b = _plan_fingerprint(qs["q_dedup_ngram"](spark, sf_dir), sf_dir)
    assert a != b


def test_plan_fingerprint_construction_order_insensitive(spark):
    """r11 fix: Spark names higher-order-function lambda variables from
    a SESSION-GLOBAL counter (`lambda x_3` vs `lambda x_8` for the same
    plan built later) and stamps `.observe()` CollectMetrics nodes with
    a session-global id. Un-normalized, the fingerprint depended on
    query construction order, so any registry change upstream of a key
    shifted its fp and the min-merge guard spuriously dropped that
    key's committed minima (observed on q_dedup_ngram /
    q_dedup_incremental_near in the r11 run-8 merge). Pins: a
    lambda+observe-bearing plan fingerprints identically before and
    after OTHER lambda-bearing plans churn the counters."""
    from bench import _plan_fingerprint

    sf_dir = "/root/testdata/sf0.001"
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    key = "q_dedup_ngram"  # transform/filter lambdas + observe()
    fp1 = _plan_fingerprint(qs[key](spark, sf_dir), sf_dir)
    # churn the session-global lambda counter with other plans
    qs["q_dedup_incremental_near"](spark, sf_dir)
    qs["q_dedup_exact"](spark, sf_dir)
    fp2 = _plan_fingerprint(qs[key](spark, sf_dir), sf_dir)
    assert fp1 == fp2 != "unavailable"


def test_plan_fingerprint_multiarg_lambda_and_partition_count(spark):
    """r12 fixes (found by the migration precondition check + the first
    r12 merge dropping 18 keys): (a) two-arg higher-order functions
    (zip_with) name their SECOND lambda variable y_N from the same
    session-global counter — r11 normalized only x_N, leaving
    q_text_repetition/q_text_quality/q_dedup_semantic fp-unstable
    between two builds in ONE session; (b) scale-adaptive partition
    counts come from $SPARK_GRAFT_CPUS, which the driver itself varies
    (8-core scaling run), so `Repartition 8` vs `Repartition 32` must
    fingerprint identically while plan SHAPE still distinguishes."""
    from bench import _plan_fingerprint

    sf_dir = "/root/testdata/sf0.001"
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    key = "q_text_repetition"  # zip_with → x_N AND y_N lambda vars
    fp1 = _plan_fingerprint(qs[key](spark, sf_dir), sf_dir)
    qs["q_dedup_ngram"](spark, sf_dir)  # churn the lambda counter
    fp2 = _plan_fingerprint(qs[key](spark, sf_dir), sf_dir)
    assert fp1 == fp2 != "unavailable"

    from pyspark.sql import functions as F

    def agg(df):
        return df.groupBy((F.col("id") % 5).alias("k")).count()

    a = _plan_fingerprint(agg(spark.range(100).repartition(8)), "")
    b = _plan_fingerprint(agg(spark.range(100).repartition(32)), "")
    assert a == b != "unavailable"
    c = _plan_fingerprint(agg(spark.range(100).repartition(8, "id")), "")
    d = _plan_fingerprint(agg(spark.range(100).repartition(32, "id")), "")
    assert c == d != "unavailable"
    assert a != c  # round-robin vs hash repartition: shape survives


def test_first_detail_line_tolerates_stray_stdout():
    """Round-9 advisor item: the isolated probe must find the detail
    line even when banners or setup prints precede it, must skip JSON
    lines without a queries dict, and must return None (not raise) when
    no detail line exists."""
    from bench import _first_detail_line

    detail = json.dumps({"metric": "total_query_sec", "queries": {"q_x": 1.0}})
    noisy = "\n".join(
        [
            "Ivy Default Cache set to: /root/.ivy2/cache",
            "{not json at all",
            json.dumps({"some": "other json"}),
            detail,
            json.dumps({"queries": {"q_y": 9.9}}),  # later line ignored
        ]
    )
    got = _first_detail_line(noisy)
    assert got is not None and got["queries"] == {"q_x": 1.0}
    assert _first_detail_line("WARN banner only\n") is None
