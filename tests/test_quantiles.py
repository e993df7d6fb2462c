"""exact_quantiles_binned must be value-identical to Spark's exact
`percentile` aggregate (and hence DuckDB `quantile_cont`) — the operator
exists to change the MEMORY shape (domain-bounded per-group state, see
the round-2 verdict's op-29b caveat), never the answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_bulkload_spark.operators.relational import exact_quantiles_binned

QS = [(0.25, "p25"), (0.5, "p50"), (0.9, "p90")]


def _native(df, group, col):
    p = lambda q, n: F.round(  # noqa: E731
        F.expr(f"percentile({col}, {q})"), 6
    ).alias(n)
    return df.groupBy(group).agg(*[p(q, n) for q, n in QS])


def _as_map(df, group):
    return {r[group]: (r["p25"], r["p50"], r["p90"]) for r in df.collect()}


def test_matches_native_percentile_on_lineitem(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = _as_map(
        exact_quantiles_binned(li, "l_returnflag", "l_extendedprice", QS),
        "l_returnflag",
    )
    want = _as_map(_native(li, "l_returnflag", "l_extendedprice"), "l_returnflag")
    assert got == want


def test_edge_cases_crafted(spark):
    # single-value group; two-value group (h fractional both directions);
    # exact-boundary group (h integral → no interpolation); negatives;
    # nulls excluded
    rows = [
        ("one", 5.00),
        ("two", 1.00),
        ("two", 2.00),
        ("five", -1.25),
        ("five", 0.00),
        ("five", 0.50),
        ("five", 2.75),
        ("five", 10.00),
        ("five", None),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = _as_map(exact_quantiles_binned(df, "g", "v", QS), "g")
    want = _as_map(_native(df, "g", "v"), "g")
    assert got == want
    # five non-null values: p50 must hit the middle exactly (h integral)
    assert got["five"][1] == 0.50


def test_duplicate_heavy_distribution(spark):
    # skewed duplicates: the cumulative-range cover logic must place both
    # floor(h) and ceil(h) inside the same fat bin
    rows = [("g", 1.00)] * 7 + [("g", 2.00)] * 1 + [("g", 3.00)] * 2
    df = spark.createDataFrame(rows, "g string, v double")
    got = _as_map(exact_quantiles_binned(df, "g", "v", QS), "g")
    want = _as_map(_native(df, "g", "v"), "g")
    assert got == want


def test_property_random_money_distributions(spark):
    """Hypothesis-driven: on random 2-decimal money data — duplicates,
    negatives, nulls, singleton and fat groups — the binned formulation
    must equal the native exact percentile aggregate everywhere."""
    from hypothesis import given, settings, strategies as st

    cases: list[list[tuple[str, float | None]]] = []

    money = st.one_of(
        st.none(),
        st.integers(-10_000_00, 10_000_00).map(lambda c: c / 100.0),
    )

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.tuples(st.sampled_from("abc"), money), min_size=1, max_size=40))
    def collect(rows):
        cases.append(rows)

    collect()
    # one Spark round trip for all sampled datasets: tag each case
    rows = [
        (f"case{i}_{g}", v) for i, case in enumerate(cases) for g, v in case
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = _as_map(exact_quantiles_binned(df, "g", "v", QS), "g")
    want = _as_map(_native(df, "g", "v"), "g")
    # native emits all-null groups with NULL quantiles; binned drops them
    want = {k: v for k, v in want.items() if v != (None, None, None)}
    assert got == want


def test_approx_quantile_near_exact(spark, sf_dir):
    """The sketch path (op 29d) must land within GK error of the exact
    binned formulation on the same column — rows-only in the oracle, so
    the accuracy claim is pinned here instead."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = _as_map(
        exact_quantiles_binned(li, "l_returnflag", "l_extendedprice", QS),
        "l_returnflag",
    )
    p = lambda q, n: F.expr(  # noqa: E731
        f"percentile_approx(l_extendedprice, {q}, 10000)"
    ).alias(n)
    approx = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p90"])
        for r in li.groupBy("l_returnflag").agg(*[p(q, n) for q, n in QS]).collect()
    }
    assert set(approx) == set(exact)
    for g in exact:
        for a, e in zip(approx[g], exact[g]):
            assert abs(a - e) / max(abs(e), 1.0) < 0.01, (g, a, e)
