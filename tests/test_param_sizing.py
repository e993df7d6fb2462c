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
    assert 1 <= tables <= 32
    # keyspace tracks the corpus: ≥ n buckets once past the min-planes floor
    if n > 256:
        assert 2**planes >= n / 2


def test_lsh_auto_params_monotone_in_n():
    prev = 0
    for n in (10, 10**3, 10**5, 10**7, 10**9):
        planes, _ = lsh_auto_params(n, 0.4)
        assert planes >= prev
        prev = planes


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
