"""Version/TTL/current-history semantics on a crafted fixture with known
multiplicity (FIXTURES.md F5): per key 1-6 versions spanning > TTL, so
each operator filters a known count."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_bulkload_spark.operators.semantics import (
    current_vs_history,
    keep_latest_versions,
    kv_scan,
    ttl_filter,
)


def _fixture(spark):
    rows = []
    for key in range(4):
        for v in range(key + 2):  # 2..5 versions per key
            rows.append((f"k{key}", "q", f"2024-01-{v + 1:02d} 00:00:00", f"v{v}"))
    df = spark.createDataFrame(rows, "rowkey string, qualifier string, ts_s string, value string")
    return df.select("rowkey", "qualifier", F.col("ts_s").cast("timestamp").alias("ts"), "value")


def test_keep_latest_versions(spark):
    df = _fixture(spark)
    kept = keep_latest_versions(df, ["rowkey", "qualifier"], "ts", n=3, tiebreak=["value"])
    counts = dict(
        kept.groupBy("rowkey").count().collect()
    )
    assert counts == {"k0": 2, "k1": 3, "k2": 3, "k3": 3}
    # newest version ranks 1
    top = kept.filter("version = 1").select("rowkey", "value").collect()
    assert {(r.rowkey, r.value) for r in top} == {
        ("k0", "v1"), ("k1", "v2"), ("k2", "v3"), ("k3", "v4"),
    }


def test_ttl_filter_explicit_now(spark):
    df = _fixture(spark)
    out = ttl_filter(df, "ts", days=2, now=F.lit("2024-01-05 00:00:00").cast("timestamp"))
    # keep ts >= 2024-01-03; versions at day1..day5
    assert out.count() == df.filter("ts >= timestamp'2024-01-03 00:00:00'").count()


def test_ttl_filter_dataset_horizon(spark):
    df = _fixture(spark)
    out = ttl_filter(df, "ts", days=1)  # max ts = day5 → keep day4..5
    assert set(out.select("value").toPandas()["value"]) == {"v3", "v4"}


def test_kv_scan_filters_compose(spark):
    df = _fixture(spark)
    out = kv_scan(df, start_row="k1", stop_row="k3", qualifiers=["q"])
    assert set(out.select("rowkey").toPandas()["rowkey"]) == {"k1", "k2"}
    assert kv_scan(df, qualifiers=["absent"]).count() == 0


def test_kv_scan_timerange_before_versions(spark):
    """HBase applies setTimeRange BEFORE readVersions: with the newest
    cell excluded by max_ts, version 1 must be the newest *in-range*
    cell, not a gap. k3 has v0..v4 at days 1..5; scan [day2, day5) with
    readVersions(2) → v3 (version 1) and v2 (version 2)."""
    df = _fixture(spark).filter("rowkey = 'k3'")
    out = kv_scan(
        df,
        min_ts=F.lit("2024-01-02 00:00:00").cast("timestamp"),
        max_ts=F.lit("2024-01-05 00:00:00").cast("timestamp"),
        max_versions=2,
        tiebreak=["value"],
    )
    got = {(r.value, r.version) for r in out.select("value", "version").collect()}
    assert got == {("v3", 1), ("v2", 2)}


def test_current_vs_history_split(spark):
    df = _fixture(spark)
    fam = current_vs_history(df, ["rowkey", "qualifier"], "ts", tiebreak=["value"])
    counts = {(r.family): r["count"] for r in fam.groupBy("family").count().collect()}
    assert counts == {"c": 4, "h": 14 - 4}
    cur = fam.filter("family = 'c'").select("rowkey", "value").collect()
    assert {(r.rowkey, r.value) for r in cur} == {
        ("k0", "v1"), ("k1", "v2"), ("k2", "v3"), ("k3", "v4"),
    }


def test_kv_scan_property_matches_bruteforce(spark):
    """Property: kv_scan == a brute-force pandas reimplementation of the
    Scan contract (range, qualifier set, timerange-then-versions) across
    randomized parameter combinations."""
    import itertools

    import pandas as pd

    rows = []
    for k in range(6):
        for q in ("qa", "qb"):
            for v in range(k % 3 + 1):
                rows.append((f"k{k}", q, f"2024-01-{v + 1:02d} 00:00:00", f"{k}{q}{v}"))
    df = spark.createDataFrame(
        rows, "rowkey string, qualifier string, ts_s string, value string"
    ).select("rowkey", "qualifier", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    pdf = df.toPandas()

    cases = itertools.product(
        [None, "k1"], [None, "k4"], [None, ["qa"]], [None, 2]
    )
    for start, stop, quals, maxv in cases:
        got = kv_scan(
            df, start_row=start, stop_row=stop, qualifiers=quals,
            max_versions=maxv, tiebreak=["value"],
        ).toPandas()
        exp = pdf.copy()
        if start is not None:
            exp = exp[exp.rowkey >= start]
        if stop is not None:
            exp = exp[exp.rowkey < stop]
        if quals is not None:
            exp = exp[exp.qualifier.isin(quals)]
        if maxv is not None:
            exp = (
                exp.sort_values(["ts", "value"], ascending=[False, True])
                .groupby(["rowkey", "qualifier"], sort=False)
                .head(maxv)
            )
            got = got.drop(columns=["version"])
        key = ["rowkey", "qualifier", "ts", "value"]
        a = got[key].sort_values(key).reset_index(drop=True)
        b = exp[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b), (start, stop, quals, maxv)
