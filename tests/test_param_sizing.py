"""Property tests for the round-4 parameter-sizing helpers — the pure
functions that turn corpus metadata into scale-correct knobs (split
sizes, LSH planes/tables, IVF cells/probes, GEMM blocks). No Spark
session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_bulkload_spark.operators.similarity import (
    gemm_blocks,
    ivf_auto_params,
    lsh_auto_params,
)
from hbase_bulkload_spark.sources.split_planning import (
    DEFAULT_MAX_SPLIT,
    DEFAULT_OPEN_COST,
    adaptive_split_size,
)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**15),
    st.integers(min_value=1, max_value=4096),
)
def test_adaptive_split_size_bounds(total, cores):
    s = adaptive_split_size(total, cores)
    assert DEFAULT_OPEN_COST <= s <= DEFAULT_MAX_SPLIT
    # when the data is big enough, every core gets work
    if total >= cores * DEFAULT_OPEN_COST:
        assert -(-total // s) >= min(cores, total // DEFAULT_OPEN_COST)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=10**12))
def test_lsh_auto_params_shapes(n):
    planes, tables = lsh_auto_params(n, threshold=0.4)
    assert 8 <= planes <= 64
    assert 1 <= tables <= 256
    # the r7 cap-32 regression: at n=20k/t=0.4 the recall solve needs 64
    # tables and the silent clamp measured 0.83 aggregate recall against
    # the 0.9 floor — the cap must never bind below the gated corpora
    if n <= 200_000:
        import math

        q = 1.0 - math.acos(0.4) / math.pi
        r = 1.0 - q
        p_hit = (
            q**planes
            + planes * r * q ** (planes - 1)
            + math.comb(planes, 2) * r * r * q ** (planes - 2)
        )
        if p_hit < 1.0:
            assert (1.0 - (1.0 - p_hit) ** tables) >= 0.95 - 1e-9, (
                n, planes, tables)
    # keyspace tracks the corpus: ≥ n buckets once past the min-planes floor
    if n > 256:
        assert 2**planes >= n / 2


def test_lsh_auto_params_monotone_in_n():
    prev = 0
    for n in (10, 10**3, 10**5, 10**7, 10**9):
        planes, _ = lsh_auto_params(n, 0.4)
        assert planes >= prev
        prev = planes


def test_lsh_cap_binding_is_loud():
    """Round-9 verdict item 1: the 256-table clamp must never be silent
    again (the r6 fixed-banding and r8 32-table regressions were both
    this failure mode). Constructs the n>1M / t=0.4 regime with
    parameters only — no giant fixture — and asserts the capped flag
    AND the RuntimeWarning both fire; below the regime neither does."""
    import warnings

    from hbase_bulkload_spark.operators import similarity as S

    # clear the once-per-process dedup so the warning is observable
    S._WARNED_CAPS.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        planes, tables, capped = S.lsh_auto_params_solve(2_000_000, 0.4)
    assert capped is True
    assert tables == 256
    assert any(
        issubclass(x.category, RuntimeWarning) and "clamped" in str(x.message)
        for x in w
    ), [str(x.message) for x in w]
    # warn-once semantics: a second identical solve stays quiet
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        S.lsh_auto_params_solve(2_000_000, 0.4)
    assert not w2
    # every gate-corpus regime stays uncapped and quiet
    S._WARNED_CAPS.clear()
    with warnings.catch_warnings(record=True) as w3:
        warnings.simplefilter("always")
        for n in (500, 6_000, 60_000, 200_000):
            _, _, capped_n = S.lsh_auto_params_solve(n, 0.4)
            assert capped_n is False, n
    assert not w3
    # warn=False is the LUT/precompute path: capped still reported,
    # never warned
    S._WARNED_CAPS.clear()
    with warnings.catch_warnings(record=True) as w4:
        warnings.simplefilter("always")
        t, c = S.lsh_tables_solve(40, 0.4, warn=False)
    assert c is True and t == 256 and not w4


def test_minhash_banding_budget_flag():
    """The MinHash analog: recall is never silently traded (b solves
    exactly for the floor), but the r=2 fallback can silently blow the
    signature budget — lsh_banding_params_solve must flag + warn it."""
    import warnings

    from hbase_bulkload_spark.operators.dedup import (
        lsh_banding_params,
        lsh_banding_params_solve,
    )

    # the registered threshold regime: within budget, no flag
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        k, bands, over = lsh_banding_params_solve(0.5)
    assert over is False and k <= 64 and not w
    # a pathologically low threshold forces the r=2 fallback over budget
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        k2, bands2, over2 = lsh_banding_params_solve(0.01)
    assert over2 is True and k2 == 2 * bands2 and k2 > 64
    assert any(issubclass(x.category, RuntimeWarning) for x in w2)
    # the tuple-returning wrapper stays value-compatible
    assert lsh_banding_params(0.5) == (k, bands)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=10**12))
def test_ivf_auto_params_shapes(n):
    cents, probe = ivf_auto_params(n)
    assert 16 <= cents <= 65536
    assert 4 <= probe <= cents
    # sqrt scaling in the interior regime
    if 10**3 <= n <= 10**9:
        assert cents * cents <= 4 * n and n <= 4 * cents * cents * 65536


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**12))
def test_gemm_blocks_bounds(n):
    b = gemm_blocks(n)
    assert 1 <= b <= 128
    # blocks track ~4096-vector targets until the cap
    if 4096 < n <= 128 * 4096:
        assert (b - 1) * 4096 < n <= b * 4096


def test_lsh_plane_derivation_engine_parity():
    """The raw LSH pair oracle replays the ENTIRE pipeline in DuckDB,
    so the two engine-derived pieces must agree exactly with Python for
    every corpus size the gates use (and the tricky boundaries):

    - planes = max(8, ceil(log2 n)) is re-derived in SQL — powers of
      two are the exact-boundary case for ceil(log2);
    - plane entries are the centered Irwin-Hall(6) md5 word sums —
      re-derived in SQL via '0x' hex casts.

    A silent divergence in either changes the emitted pair set with no
    error anywhere; this pins both, so the failure is a named test."""
    import duckdb
    import math

    from hbase_bulkload_spark.operators import similarity as S

    con = duckdb.connect()
    ns = [2, 3, 50, 200, 255, 256, 257, 500, 1023, 1024, 1025, 2000,
          20000, 60000, 65536, 200000, 1 << 20, (1 << 20) + 1, 10**9]
    for n in ns:
        py_planes = max(8, math.ceil(math.log2(max(n, 2))))
        sql_planes = con.execute(
            "SELECT GREATEST(8, CAST(CEIL(LOG2(GREATEST(?, 2))) AS INTEGER))",
            [n],
        ).fetchone()[0]
        assert sql_planes == py_planes, (n, sql_planes, py_planes)

    planes = S._hyperplanes(3, 2)  # (tables=2, planes=3, EMBED_DIM)
    rows = con.execute(
        """
        WITH ph AS (
            SELECT t, p, d,
                   md5(CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR)
                       || '_' || CAST(d AS VARCHAR)) AS h
            FROM (SELECT UNNEST(range(0, 2)) AS t),
                 (SELECT UNNEST(range(0, 3)) AS p),
                 (SELECT UNNEST(range(0, 64)) AS d)
        )
        SELECT t, p, d,
               CAST(CAST('0x' || substr(h, 1, 4) AS INTEGER)
                  + CAST('0x' || substr(h, 5, 4) AS INTEGER)
                  + CAST('0x' || substr(h, 9, 4) AS INTEGER)
                  + CAST('0x' || substr(h, 13, 4) AS INTEGER)
                  + CAST('0x' || substr(h, 17, 4) AS INTEGER)
                  + CAST('0x' || substr(h, 21, 4) AS INTEGER)
                  - 196605 AS BIGINT) AS w
        FROM ph
        """
    ).fetchall()
    assert len(rows) == 2 * 3 * 64
    for t, p, d, w in rows:
        assert w == planes[t, p, d], (t, p, d, w, planes[t, p, d])


def test_lsh_tables_lookup_matches_auto_params():
    """The oracle's (planes → tables) VALUES literal is generated from
    lsh_tables_for_planes; lsh_auto_params must route through the same
    function so the literal can never drift from the production
    sizing."""
    from hbase_bulkload_spark.operators import similarity as S
    from hbase_bulkload_spark.queries.extensions import SIM_THRESHOLD

    for n in (2, 500, 2000, 20000, 60000, 10**6, 10**9):
        planes, tables = S.lsh_auto_params(n, SIM_THRESHOLD)
        assert tables == S.lsh_tables_for_planes(planes, SIM_THRESHOLD), n
        assert 8 <= planes <= 64  # lookup literal covers 8..64


def test_lsh_plan_solve_matches_legacy_below_the_wall():
    """Round-10 contract: at every gated/probed corpus size the plan is
    the radius-1 log2-planes config, bit-identical to the historical
    lsh_auto_params sizing — registered pair sets and replay oracles
    must not move."""
    from hbase_bulkload_spark.operators import similarity as S

    for n in (500, 2_000, 6_000, 20_000, 60_000, 200_000, 262_144):
        op, ot, oc = S.lsh_auto_params_solve(n, 0.4)
        p, r, t, c = S.lsh_plan_solve(n, 0.4)
        assert (p, r, t, c) == (op, 1, ot, False), n
        assert oc is False, n


def test_lsh_plan_solve_escalates_instead_of_capping():
    """Round-9 verdict item 2: past n = 2^18 the radius-1 solve wants
    more than 256 tables; the plan must escalate probe radius (and
    eventually reduce planes) so the 0.95 recall target is MET — the
    capped flag is a contract violation, not a corpus-size event."""
    import math

    from hbase_bulkload_spark.operators import similarity as S

    prev_work = None
    for n in (262_145, 500_000, 2_000_000, 10_000_000, 10**8, 10**10):
        p, r, t, c = S.lsh_plan_solve(n, 0.4)
        assert c is False, n
        assert t <= 256, n
        assert r == 2, n
        # the recall solve is genuinely satisfied at the returned config
        tt, capped = S.lsh_tables_solve(p, 0.4, probe_radius=r, warn=False)
        assert capped is False and tt <= t, n
        # cost model stays monotone (no pathological plan flip-flop)
        keys = sum(math.comb(p, d) for d in range(0, r + 1))
        work = n * n * t * keys * keys / 2.0**p
        if prev_work is not None:
            assert work > prev_work, n
        prev_work = work


def test_lsh_plan_solve_min_planes_radius2_is_practically_uncappable():
    """capped=True requires a recall target even (8 planes, radius 2,
    256 tables) cannot reach — pin that the registered 0.95 target is
    nowhere near that boundary at any n."""
    from hbase_bulkload_spark.operators import similarity as S

    for n in (10**6, 10**12):
        assert S.lsh_plan_solve(n, 0.4, target_recall=0.999)[3] is False


def test_tables_solve_radius2_window():
    """Radius-2 collision window = signature distance <= 4: per-table
    hit must be far above radius 1's at the same planes (that is the
    escalation's entire mechanism)."""
    from hbase_bulkload_spark.operators import similarity as S

    t1, _ = S.lsh_tables_solve(19, 0.4, probe_radius=1, warn=False)
    t2, _ = S.lsh_tables_solve(19, 0.4, probe_radius=2, warn=False)
    assert t2 * 5 <= t1
