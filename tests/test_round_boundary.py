"""Cross-engine rounding boundary contract (round-11 ADVICE item).

The IVF cell-assignment RANKING rounds cosine scores numpy-side before
argsort; the q_sim_pairs_ivf replay oracle ranks with DuckDB ROUND
(half away from zero). One flipped .5 boundary flips a cell assignment
and diverges the entire blocked pair set — so the numpy rounding must
bit-match DuckDB ROUND, which np.round (half-to-even on the scaled
value) does not.
"""
import duckdb
import numpy as np
import pandas as pd

from hbase_bulkload_spark.operators.similarity import _round6_half_away


def _duckdb_round6(xs: np.ndarray) -> np.ndarray:
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame({"x": xs}))
        return con.execute("SELECT round(x, 6) AS r FROM t").df()["r"].to_numpy()
    finally:
        con.close()


def _boundary_values() -> np.ndarray:
    rng = np.random.default_rng(7)
    half_steps = (
        np.arange(-2_000_000, 2_000_001, 37, dtype=np.float64) + 0.5
    ) / 1e6
    ulp_above = np.nextafter((np.arange(-500, 501) + 0.5) / 1e6, np.inf)
    ulp_below = np.nextafter((np.arange(-500, 501) + 0.5) / 1e6, -np.inf)
    return np.concatenate(
        [
            half_steps,          # exact .5-at-6-decimals boundaries
            ulp_above,
            ulp_below,
            rng.uniform(-1.0, 1.0, 100_000),   # cosine range bulk
            np.array(
                [0.0, 1.0, -1.0, 0.1234565, -0.1234565,
                 0.9999995, -0.9999995,
                 0.49999999999999994e-6, -0.49999999999999994e-6]
            ),
        ]
    )


def test_round6_half_away_bitmatches_duckdb():
    xs = _boundary_values()
    got = _round6_half_away(xs)
    exp = _duckdb_round6(xs)
    neq = got != exp
    assert not neq.any(), (
        f"{neq.sum()} mismatches, first: x={xs[np.nonzero(neq)[0][0]]!r}"
    )


def test_np_round_would_fail_the_boundary():
    """Regression canary: if this starts passing, the test above lost
    its teeth (fixture no longer hits half-to-even boundaries)."""
    xs = _boundary_values()
    exp = _duckdb_round6(xs)
    assert (np.round(xs, 6) != exp).sum() > 1000
