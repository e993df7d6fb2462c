"""Vector similarity search over an embedding column (north-star op 54,
SURVEY.md §2.14): brute-force cosine top-k / threshold pairs as the
exact baselines, a random-hyperplane LSH bucketed variant as the
recall-solved sub-quadratic scale path (sized by :func:`lsh_plan_solve`
— radius/plane growth keeps the 0.95 recall solve satisfiable at any
corpus size within 256 tables), and an IVF-blocked pair path
(:func:`cosine_pairs_ivf` — table-free ~n^1.5 blocking whose sizing can
never cap out; recall reported, not floored).

All dot products run in double precision inside JVM higher-order
functions (`zip_with` + `aggregate`) — sequential, deterministic, no
Python per-row. The LSH signature uses an Arrow-batched pandas UDF
(numpy matmul over fixed seeded hyperplanes) because a 64×p matmul per
row is exactly what vectorized UDFs are for.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EMBED_DIM = 64
#: Fixed-point scale for the LSH projection: embeddings are float32, so
#: v * 2^20 is EXACT in float64 (a power-of-two exponent shift) and
#: floor(v * 2^20 + 0.5) is a deterministic int64 in numpy and in any
#: SQL engine — the signature becomes pure integer arithmetic, immune
#: to float summation order. 2^-20 granularity is ~1e-6 on O(0.1)-scale
#: components; the per-round RECALL artifact re-measures the floors.
LSH_QUANT = 1 << 20


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product (deterministic)."""
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _row_normalize(M: np.ndarray) -> np.ndarray:
    """Row-normalize in place with the zero-norm contract used across
    the engine (semantic_dedup, _rowwise_raw_cosine_udf): an all-zero
    vector stays all-zero (cosine 0 against everything) instead of
    producing a NaN row and a NumPy warning."""
    nrm = np.linalg.norm(M, axis=1, keepdims=True)
    M /= np.where(nrm == 0, 1.0, nrm)
    return M


def _round6_half_away(S: np.ndarray) -> np.ndarray:
    """Round to 6 decimals HALF AWAY FROM ZERO, bit-matching DuckDB
    ``ROUND(x, 6)`` (std::round(x*1e6)/1e6) for |x·1e6| < 2^52: both
    engines compute y = x*1e6 with the same IEEE multiply, and for
    |y| < 2^52 the fractional part y - floor(y) is exact, so the
    frac >= 0.5 comparison reproduces std::round's exact half-away
    tie-break. ``np.round`` is half-to-even on the scaled value and
    disagrees on .5 boundaries — for a RANKING score (IVF cell
    assignment) one flipped boundary diverges the whole blocked pair
    set from the replay oracle, not just one row."""
    y = S * 1e6
    a = np.abs(y)
    f = np.floor(a)
    r = np.where(a - f >= 0.5, f + 1.0, f)
    return np.copysign(r, y) / 1e6


def cosine(a: Column, b: Column, digits: int = 6) -> Column:
    """Round-6 cosine: the rounding makes cross-engine hashes stable and
    ranking ties deterministic (broken by id downstream)."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), digits)


def _collect_query_matrix(
    queries: DataFrame, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """Materialize the (small, by contract) query set as a normalized
    float64 matrix for closure-broadcast into the candidate scan."""
    rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.array([r[1] for r in rows], dtype=np.float64)
    _row_normalize(Q)
    return qids, Q


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: one linear scan over candidates, queries broadcast
    (in-closure) as a normalized matrix, each Arrow batch scored with a
    single float64 GEMM. Scales linearly in candidates; the scan
    parallelizes perfectly and never shuffles candidate vectors — only
    (query, cand, score) triples reach the ranking window's exchange.
    Round/threshold stay JVM-side for oracle-identical HALF_UP."""
    import pandas as pd

    qids, Q = _collect_query_matrix(queries, id_col, vec_col)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            _row_normalize(V)
            S = V @ Q.T  # (batch, n_queries)
            ic, iq = np.nonzero(ids[:, None] != qids[None, :])
            yield pd.DataFrame(
                {
                    "query_id": qids[iq],
                    "cand_id": ids[ic],
                    "raw_cos": S[ic, iq],
                }
            )

    scored = embeddings.select(id_col, vec_col).mapInPandas(
        score, "query_id long, cand_id long, raw_cos double"
    ).select("query_id", "cand_id", F.round("raw_cos", 6).alias("cos_sim"))

    from hbase_bulkload_spark.operators.relational import ranked

    return ranked(
        scored, ["query_id"], [F.desc("cos_sim"), F.asc("cand_id")], n=k
    ).select("query_id", "cand_id", "cos_sim", "rn")


def gemm_blocks(n_rows: int) -> int:
    """Block count for the blocked-GEMM pair operators: ~4096-vector
    blocks (a few MB dense), clamped to [1, 128]. Callers with parquet
    footer metadata derive ``n_rows`` for free
    (`datasets.parquet_row_count`); the operators' ``None`` fallback
    pays one count job."""
    return max(1, min(128, -(-n_rows // 4096)))


def cosine_pairs_exact(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold as a distributed blocked GEMM.

    The naive formulation (self-join + per-pair ``aggregate(zip_with)``)
    evaluates an O(dim) expression tree per pair — ~60× slower than
    vectorized math at sf0.1. Instead: hash every vector into one of
    ``n_blocks`` blocks, materialize each block as one row (id list +
    matrix), fan the B(B+1)/2 block pairs out as a join, and let each
    task run a single float64 numpy matmul over its two blocks. The
    computation is still exact and still quadratic (that is the point of
    the baseline — :func:`cosine_pairs_lsh` is the sub-quadratic path),
    but each task is a dense GEMM instead of an expression interpreter.

    Scale note: work is B(B+1)/2 independent tasks. ``n_blocks=None``
    auto-sizes to ``clamp(ceil(n_vectors / 4096), 1, 128)`` (one cheap
    count job) so a block matrix stays ~1-2 MB and task count tracks
    corpus size instead of drowning small corpora in task overhead —
    136 tasks for 500 vectors measured 5× slower than the work itself.
    Numpy emits raw float64 cosines; the round-6 +
    threshold runs JVM-side so HALF_UP rounding matches the oracle
    exactly (numpy would use banker's rounding). The 1e-6 margin below
    keeps any pair that could round up across the threshold.
    """
    import pandas as pd  # noqa: F811 — local for executor pickling

    if n_blocks is None:
        n_blocks = gemm_blocks(embeddings.count())

    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk")
    packed = (
        embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), blk)
        .groupBy("blk")
        .agg(F.collect_list(F.struct("vid", "vec")).alias("items"))
    )
    a = packed.select(F.col("blk").alias("blk_a"), F.col("items").alias("items_a"))
    b = packed.select(F.col("blk").alias("blk_b"), F.col("items").alias("items_b"))
    pairs = a.join(b, F.col("blk_a") <= F.col("blk_b")).repartition(
        n_blocks * (n_blocks + 1) // 2
    )

    margin = threshold - 1e-6

    def gemm(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids_a = np.array([it["vid"] for it in row["items_a"]], dtype=np.int64)
                ids_b = np.array([it["vid"] for it in row["items_b"]], dtype=np.int64)
                va = np.array([it["vec"] for it in row["items_a"]], dtype=np.float64)
                vb = np.array([it["vec"] for it in row["items_b"]], dtype=np.float64)
                _row_normalize(va)
                _row_normalize(vb)
                sim = va @ vb.T
                keep = sim >= margin
                if row["blk_a"] == row["blk_b"]:
                    # diagonal block: both orderings present — keep one
                    keep &= ids_a[:, None] < ids_b[None, :]
                ia, ib = np.nonzero(keep)
                lo = np.minimum(ids_a[ia], ids_b[ib])
                hi = np.maximum(ids_a[ia], ids_b[ib])
                yield pd.DataFrame(
                    {"vec_id_a": lo, "vec_id_b": hi, "raw_cos": sim[ia, ib]}
                )

    raw = pairs.mapInPandas(
        gemm, "vec_id_a long, vec_id_b long, raw_cos double"
    )
    return raw.select(
        "vec_id_a", "vec_id_b", F.round("raw_cos", 6).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def cross_cosine_pairs(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks_left: int | None = None,
    n_blocks_right: int | None = None,
) -> DataFrame:
    """Exact CROSS-frame cosine pairs ≥ threshold — the blocked-GEMM
    discipline of :func:`cosine_pairs_exact`, but between two different
    frames, so within-side pairs are never generated. The incremental
    shape: left = history, right = new batch → work is |L|·|R| dots,
    not (|L|+|R|)², and the left side only ever shuffles as packed
    block rows. Returns (left_id, right_id, cos_sim) with the same
    JVM-side HALF_UP round-6 as the self-pair operator.

    ``n_blocks_*=None`` auto-sizes each side to ~4096-vector blocks
    via one count job per side — callers with footer metadata should
    pass sizes to keep the query job-free before execution."""
    import pandas as pd  # noqa: F811 — local for executor pickling

    if n_blocks_left is None:
        n_blocks_left = gemm_blocks(left.count())
    if n_blocks_right is None:
        n_blocks_right = gemm_blocks(right.count())

    def packed(df, n_blocks, blk_name, items_name):
        blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias(blk_name)
        return (
            df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), blk)
            .groupBy(blk_name)
            .agg(F.collect_list(F.struct("vid", "vec")).alias(items_name))
        )

    a = packed(left, n_blocks_left, "blk_a", "items_a")
    b = packed(right, n_blocks_right, "blk_b", "items_b")
    grid = a.crossJoin(b).repartition(n_blocks_left * n_blocks_right)

    margin = threshold - 1e-6

    def gemm(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids_a = np.array([it["vid"] for it in row["items_a"]], dtype=np.int64)
                ids_b = np.array([it["vid"] for it in row["items_b"]], dtype=np.int64)
                va = np.array([it["vec"] for it in row["items_a"]], dtype=np.float64)
                vb = np.array([it["vec"] for it in row["items_b"]], dtype=np.float64)
                _row_normalize(va)
                _row_normalize(vb)
                sim = va @ vb.T
                ia, ib = np.nonzero(sim >= margin)
                yield pd.DataFrame(
                    {
                        "left_id": ids_a[ia],
                        "right_id": ids_b[ib],
                        "raw_cos": sim[ia, ib],
                    }
                )

    raw = grid.mapInPandas(gemm, "left_id long, right_id long, raw_cos double")
    return raw.select(
        "left_id", "right_id", F.round("raw_cos", 6).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def _hyperplanes(n_planes: int, n_tables: int) -> np.ndarray:
    """Integer hyperplanes derived from md5("t_p_d") — deterministic on
    every executor AND engine-reproducible: the DuckDB oracle for the
    raw LSH pair query regenerates the identical planes in SQL (md5 is
    the one hash both engines share), which is what makes the raw
    production arm full-oracle instead of rows-only.

    Entry = Irwin-Hall(6) centered sum of the digest's six leading
    16-bit words (Σ uᵢ − 3·65535, uᵢ ∈ [0, 65535]) — an integer-valued
    ≈Gaussian. The distribution matters: a first cut used Rademacher
    ±1 entries (Achlioptas-style) and MEASURED pair recall at
    sf1.0-density fell 0.90 → 0.83 — the synthetic embeddings are not
    rotation-symmetric, so sign-LSH's collision-vs-angle curve needs
    (near-)spherically-symmetric planes; the Irwin-Hall entries
    restore the seeded-Gaussian recall (RECALL artifact re-measures
    per round). Integer entries keep the projection EXACT int64
    arithmetic after the LSH_QUANT fixed-point step — bit-identical
    across engines, no float-summation-order sensitivity in the sign
    (|dot| ≤ 64 · 2²¹ · 196605 ≈ 2.6e13, well inside int64)."""
    import hashlib

    planes = np.empty((n_tables, n_planes, EMBED_DIM), dtype=np.int64)
    for t in range(n_tables):
        for p in range(n_planes):
            for d in range(EMBED_DIM):
                h = hashlib.md5(f"{t}_{p}_{d}".encode()).hexdigest()
                planes[t, p, d] = (
                    sum(int(h[4 * i : 4 * i + 4], 16) for i in range(6))
                    - 196605
                )
    return planes


def ivf_auto_params(
    n_rows: int,
    min_centroids: int = 16,
    max_centroids: int = 65536,
    probe_fraction: float = 0.125,
) -> tuple[int, int]:
    """Derive (n_centroids, n_probe) for the IVF paths from the corpus
    size: ``n_centroids ≈ √n`` (the standard IVF sizing — cell
    membership grows as √n instead of linearly, so a fixed-16 cell
    count never degenerates into scanning 1/16th of a 10⁹-vector
    corpus per probe), and ``n_probe`` a constant fraction of the
    cells (recall under random cell geometry tracks the probed
    probability mass; the per-round RECALL artifact guards the
    realized number). Per-query scan work ≈ n × probe_fraction of a
    brute-force pass with strictly better constants as centroids
    sharpen."""
    import math

    n_centroids = max(
        min_centroids, min(max_centroids, round(math.sqrt(max(n_rows, 1))))
    )
    n_probe = max(4, int(n_centroids * probe_fraction))
    return n_centroids, min(n_probe, n_centroids)


def lsh_auto_params(
    n_rows: int,
    threshold: float,
    target_recall: float = 0.95,
    probe_radius: int = 1,
    min_planes: int = 8,
    max_tables: int = 256,
) -> tuple[int, int]:
    """Derive (n_planes, n_tables) for :func:`cosine_pairs_lsh` from the
    corpus size and the similarity threshold — the scaling law, not a
    hardcoded guess:

    - ``n_planes ≈ log2(n)`` keeps expected bucket occupancy (and hence
      the per-bucket C(m,2) expansion) constant as the corpus grows —
      fixed planes on a growing corpus degrade to quadratic buckets.
    - ``n_tables`` is solved from the marginal pair's per-table
      collision probability so a pair AT the threshold (per-bit
      agreement q = 1 − arccos(t)/π, the hardest case) reaches
      ``target_recall``: with multi-probe radius 1 a table catches
      signature distance ≤ 2, P = Σ_{d≤2} C(p,d)(1−q)^d q^(p−d).

    Table growth with n is the LSH contract, not a bug: with planes =
    log2(n) the marginal per-table hit rate falls as ~n^(−log2(1/q)),
    so holding recall costs ~n^ρ tables (ρ = ln(1/p1)/ln(1/p2) — ≈0.66
    at t = 0.4) for total work ~n^(1+ρ), the classic subquadratic LSH
    exponent vs the n² GEMM. The round-7 default capped tables at 32,
    which SILENTLY abandoned the recall target as n grew — at n = 20k /
    t = 0.4 the solve needs 64 tables, the cap's marginal recall is
    0.78 (predicted) and the measured sf1.0-density aggregate was 0.83,
    red against the 0.9 in-query floor; model and measurement agree, so
    round 8 raised the cap to 256. Binding point, measured not guessed
    (round 9): the 19-plane solve at t = 0.4 needs 266 tables, so the
    256 cap binds for every n > 2^18 = 262,144 — ~1.3x the sf10-density
    probe corpus, NOT the "n ≈ 1M" round-8 estimate.
    ``max_tables`` remains the web-scale stop — past it the honest move
    is accepting lower marginal recall or switching to the IVF path,
    not unbounded tables — but the cap must sit ABOVE every gated
    corpus so capping is always an explicit, measured decision. When
    the cap binds this function WARNS (see :func:`lsh_tables_solve`);
    callers that need the fact programmatically use
    :func:`lsh_auto_params_solve`, and the q_sim_pairs_lsh verdict
    surfaces it as a ``tables_capped`` column so the driver's hash
    compare — not just a log line — flags the regime change. This
    exact silent-clamp failure shipped twice (r6 fixed banding, r8 the
    32-table cap at measured recall 0.83 vs the 0.9 floor)."""
    planes, tables, _ = lsh_auto_params_solve(
        n_rows, threshold, target_recall, probe_radius, min_planes, max_tables
    )
    return planes, tables


def lsh_auto_params_solve(
    n_rows: int,
    threshold: float,
    target_recall: float = 0.95,
    probe_radius: int = 1,
    min_planes: int = 8,
    max_tables: int = 256,
) -> tuple[int, int, bool]:
    """:func:`lsh_auto_params` plus the capped flag: returns
    (n_planes, n_tables, capped) where ``capped`` is True iff the
    recall solve wanted more than ``max_tables`` tables and was
    clamped — i.e. the returned configuration does NOT meet
    ``target_recall`` for the marginal pair and the caller must either
    accept degraded recall explicitly or switch strategies (IVF)."""
    import math

    planes = max(min_planes, math.ceil(math.log2(max(n_rows, 2))))
    tables, capped = lsh_tables_solve(
        planes, threshold, target_recall, probe_radius, max_tables
    )
    return planes, tables, capped


def lsh_plan_solve(
    n_rows: int,
    threshold: float,
    target_recall: float = 0.95,
    min_planes: int = 8,
    max_tables: int = 256,
) -> tuple[int, int, int, bool]:
    """(n_planes, probe_radius, n_tables, capped) — the scale-complete
    successor to :func:`lsh_auto_params_solve` (round-9 verdict item 2:
    the 256-table cap made the 0.95 recall contract UNREACHABLE past
    n = 2^18 = 262,144 at t = 0.4; loud failure is not a 100-TB
    answer). The recall solve is now satisfied at EVERY corpus size by
    escalating, in order:

    1. radius-1 multi-probe at planes = ceil(log2 n) — bit-identical to
       the historical :func:`lsh_auto_params_solve` whenever its table
       solve fits the budget, i.e. at every current gate/probe fixture
       (n <= 200k), so registered pair sets and their replay oracles
       are unchanged below the old wall (pinned by test_param_sizing).
    2. radius-2 multi-probe at the same planes: widening the collision
       window to <= 4 bits raises the marginal pair's per-table hit
       rate by orders of magnitude, collapsing the table solve back
       under the budget (at t = 0.4 the radius-1 solve wants 266
       tables at n = 2^19 — radius 2 wants ~16). Posting fan-out per
       vector grows from 1+p to 1+p+C(p,2) keys per table, the
       explicit multi-probe trade (Lv et al., VLDB'07): probes are
       ~quadratically cheaper than tables because they reuse one
       stored signature instead of hashing the corpus again.
    3. plane reduction at radius 2: if even radius 2 exceeds the
       budget, shrink planes (denser buckets, higher per-table hit)
       until the solve fits. Bucket occupancy n/2^p then grows past
       the log2-contract, so candidate verification drifts toward
       n^2/2^p — a SMOOTH, documented cost crossover (at 64-dim a
       verification is one cheap dot), never a recall cliff.

    ``capped`` is True only if the recall target is unreachable even at
    (min_planes, radius 2, max_tables) — with the radius-2 hit rate at
    8 planes that requires a target_recall so close to 1.0 no caller
    uses it; every practical (n, t) has capped == False, which is the
    point: q_sim_pairs_lsh's ``tables_capped`` verdict column now pins
    a contract the solve can actually honor at any n. Work model per
    config: posting ~ n·tables·keys, candidates ~ n²·tables·keys²/2^p
    with keys = Σ_{d<=radius} C(p,d); unit-tested growth schedule in
    tests/test_param_sizing.py covers n up to 10^10."""
    import math

    planes = max(min_planes, math.ceil(math.log2(max(n_rows, 2))))
    tables, capped = lsh_tables_solve(
        planes, threshold, target_recall, 1, max_tables, warn=False
    )
    if not capped:
        return planes, 1, tables, False
    tables, capped = lsh_tables_solve(
        planes, threshold, target_recall, 2, max_tables, warn=False
    )
    if not capped:
        return planes, 2, tables, False
    for p in range(planes - 1, min_planes - 1, -1):
        tables, capped = lsh_tables_solve(
            p, threshold, target_recall, 2, max_tables, warn=False
        )
        if not capped:
            return p, 2, tables, False
    tables, _ = lsh_tables_solve(
        min_planes, threshold, target_recall, 2, max_tables
    )
    return min_planes, 2, tables, True


def lsh_tables_for_planes(
    planes: int,
    threshold: float,
    target_recall: float = 0.95,
    probe_radius: int = 1,
    max_tables: int = 256,
) -> int:
    """Table count for a given plane count — the second half of
    :func:`lsh_auto_params`, split out so the DuckDB oracle can embed
    a Python-computed (planes → tables) lookup literal instead of
    re-deriving the transcendental math in SQL (a ceil() boundary that
    rounds differently between libm builds would silently change the
    emitted pair set; a lookup computed once here cannot). WARNS via
    :func:`lsh_tables_solve` when the cap binds."""
    tables, _ = lsh_tables_solve(
        planes, threshold, target_recall, probe_radius, max_tables
    )
    return tables


def lsh_tables_solve(
    planes: int,
    threshold: float,
    target_recall: float = 0.95,
    probe_radius: int = 1,
    max_tables: int = 256,
    warn: bool = True,
) -> tuple[int, bool]:
    """Recall-solve for the table count, returning (n_tables, capped).

    ``capped`` is True iff the exact solve exceeded ``max_tables`` and
    the result was clamped — the returned table count then delivers
    LESS than ``target_recall`` for a pair sitting exactly at the
    threshold. The clamp also emits a ``RuntimeWarning`` (once per
    distinct parameter tuple per process): a silent clamp shipped a
    real recall regression twice (the r6 fixed (16,4) banding and the
    r8 32-table cap, measured 0.83 vs the 0.9 floor at sf1.0 density),
    so capping must always be visible both in logs (this warning) and
    in data (the verdict queries' ``tables_capped`` column)."""
    import math

    q = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    r = 1.0 - q
    # multi-probe radius R posts every signature within Hamming distance
    # R, so two vectors collide in a table iff their signatures differ
    # in <= 2R bits: p_hit = P(Binom(planes, r) <= 2R)
    p_hit = sum(
        math.comb(planes, d) * r**d * q ** (planes - d)
        for d in range(0, 2 * probe_radius + 1)
    )
    if p_hit >= 1.0:
        return 1, False
    tables = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_hit))
    capped = tables > max_tables
    if capped and warn:
        _warn_capped(planes, threshold, target_recall, tables, max_tables)
    return max(1, min(max_tables, tables)), capped


_WARNED_CAPS: set[tuple] = set()


def _warn_capped(
    planes: int, threshold: float, target_recall: float, want: int, cap: int
) -> None:
    key = (planes, threshold, target_recall, cap)
    if key in _WARNED_CAPS:
        return
    _WARNED_CAPS.add(key)
    import warnings

    warnings.warn(
        f"LSH table solve clamped: {want} tables needed for recall "
        f"{target_recall} at threshold {threshold} with {planes} planes, "
        f"capped to {cap}. Marginal-pair recall will be BELOW the target; "
        f"either raise max_tables, accept degraded recall explicitly, or "
        f"switch to the IVF path. (This silent-clamp mode shipped real "
        f"recall regressions in rounds 6 and 8 — do not ignore.)",
        RuntimeWarning,
        stacklevel=3,
    )


def _rowwise_raw_cosine_udf():
    """Raw (unrounded) cosine per row, one numpy batch per Arrow chunk —
    callers round JVM-side (HALF_UP) to stay hash-identical to the
    expression path. Zero-norm vectors yield cosine 0 (the JVM path's
    0/0 → NULL also never passes a positive threshold). Built lazily:
    pandas_udf parses its DDL type against the active session."""

    @pandas_udf("double")
    def raw_cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.array(va.to_list(), dtype=np.float64)
        B = np.array(vb.to_list(), dtype=np.float64)
        denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        s = (A * B).sum(axis=1)
        return pd.Series(
            np.where(denom == 0, 0.0, s / np.where(denom == 0, 1, denom))
        )

    # SEMANTICALLY deterministic — the flag only forbids the optimizer
    # reorderings that DUPLICATE the eval: filter pushdown through the
    # round-6 projection re-evaluated this UDF in a SECOND chained
    # ArrowEvalPython node (2x the verification cost — the dominant
    # stage of the LSH pair keys — and the chained-runner pipeline that
    # wedged the sf10-density probe for 100+ minutes, both Arrow pipes
    # read-blocked).
    return raw_cos.asNondeterministic()


def lsh_signature_udf(n_planes: int = 8, n_tables: int = 8):
    """Arrow-batched signature: per table, the sign-bit pattern of the
    vector against `n_planes` integer ≈Gaussian hyperplanes, packed
    into an int. The projection is exact int64 arithmetic on LSH_QUANT
    fixed-point components (see :func:`_hyperplanes`), so the signature is a pure
    function of the bytes of the embedding — identical in numpy and in
    the DuckDB oracle's SQL replay."""
    planes = _hyperplanes(n_planes, n_tables)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def sig(vecs: pd.Series) -> pd.Series:
        V = np.vstack(vecs.to_numpy()).astype(np.float64)  # float32 → exact
        Q = np.floor(V * LSH_QUANT + 0.5).astype(np.int64)  # exact: 2^20 shift
        out = []
        for t in range(n_tables):
            bits = (Q @ planes[t].T) > 0  # (batch, planes), int64-exact
            out.append(bits.astype(np.int64) @ weights)
        packed = np.stack(out, axis=1)  # (batch, tables)
        return pd.Series(list(packed))

    # SEMANTICALLY deterministic (pure function of the embedding bytes
    # — that is the whole replay-oracle contract); the flag only stops
    # the posexplode-inferred size(sigs)>0 constraint from being
    # pushed below the signature projection, which re-evaluated the
    # signature GEMM over the whole corpus a second time.
    return sig.asNondeterministic()


def _ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse centroids: the vectors with the
    ``n_centroids`` smallest ids, refined by one Lloyd iteration over
    the corpus (means in float64), returned normalized.

    The refinement is a map-side partial aggregation: each partition's
    assign pass emits ``n_centroids`` rows of (cell, partial-sum vector,
    count), so the only shuffle moving data for the build is
    n_partitions × n_centroids tiny rows — never the n_vectors × d
    exploded cells a naive posexplode/groupBy would move (at 100 TB
    that difference is trillions of rows vs thousands)."""
    import pandas as pd

    seed_rows = (
        embeddings.orderBy(F.asc(id_col)).limit(n_centroids).select(vec_col).collect()
    )
    C = np.array([r[0] for r in seed_rows], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    dim = C.shape[1]

    def lloyd_partials(batches):
        # one row group per PARTITION (not per vector): partial raw-vector
        # sums + counts per cell, tagged with the partition id so the
        # reduce can sum in a deterministic order
        from pyspark import TaskContext

        sums = np.zeros((n_centroids, dim), dtype=np.float64)
        counts = np.zeros(n_centroids, dtype=np.int64)
        for pdf in batches:
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            cell = np.argmax(Vn @ Cn.T, axis=1)
            np.add.at(sums, cell, V)
            counts += np.bincount(cell, minlength=n_centroids)
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            {
                "pid": np.full(n_centroids, pid, dtype=np.int32),
                "cell": np.arange(n_centroids, dtype=np.int32),
                "vsum": list(sums),
                "cnt": counts,
            }
        )

    base = embeddings.select(id_col, vec_col)
    partials = base.mapInPandas(
        lloyd_partials, "pid int, cell int, vsum array<double>, cnt long"
    )
    # reduce: n_partitions × n_centroids rows → n_centroids sums; with a
    # handful of input partitions the driver reduce (pid-sorted numpy) is
    # one job instead of shuffle+job, and identical arithmetic; past that
    # a JVM pre-reduce keeps the collect at n_centroids rows (at 100 TB
    # n_partitions is ~10^5 and the partials must NOT all hit the driver)
    C2 = np.array(Cn)
    sums = np.zeros((n_centroids, dim), dtype=np.float64)
    counts = np.zeros(n_centroids, dtype=np.int64)
    if base.rdd.getNumPartitions() * n_centroids <= 65536:
        for r in sorted(partials.collect(), key=lambda r: (r["pid"], r["cell"])):
            sums[r["cell"]] += np.asarray(r["vsum"], dtype=np.float64)
            counts[r["cell"]] += r["cnt"]
    else:
        # pid-sorted fold keeps float64 summation order deterministic
        reduced = (
            partials.groupBy("cell")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pid", "vsum"))),
                        lambda s: s["vsum"],
                    ),
                    F.array_repeat(F.lit(0.0), dim),
                    lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y),
                ).alias("vsum"),
            )
            .collect()
        )
        for r in reduced:
            sums[r["cell"]] = np.asarray(r["vsum"], dtype=np.float64)
            counts[r["cell"]] = r["cnt"]
    for c in range(n_centroids):
        if counts[c]:
            v = sums[c] / counts[c]
            C2[c] = v / np.linalg.norm(v)
    return C2


def ivf_build_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize the IVF index: vectors written as parquet PARTITIONED
    BY their coarse cell, centroids stored in a JSON sidecar. This is
    the at-scale counterpart of :func:`ivf_topk`'s fused index-free
    probe — with the cell as a physical partition column, a probe scans
    only ``n_probe`` of ``n_centroids`` directories (partition pruning
    at the file-listing level, asserted by tests on the scan plan).
    Returns the centroid matrix."""
    import json

    import pandas as pd

    C2 = _ivf_centroids(embeddings, n_centroids, id_col, vec_col)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cell": np.argmax(Vn @ C2.T, axis=1).astype(np.int32),
                }
            )

    assigned = embeddings.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, {vec_col} array<float>, cell int"
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as f:
        json.dump({"centroids": C2.tolist()}, f)
    return C2


def ivf_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized IVF index: load centroids from the sidecar,
    pick each query's ``n_probe`` nearest cells driver-side, and scan
    ONLY those cell partitions (`cell IN (...)` is a partition filter —
    pruned at file-listing time, before any I/O). Scoring reuses the
    exact GEMM per Arrow batch; results match :func:`ivf_topk` exactly
    for the same centroid/probe parameters."""
    import json

    import pandas as pd

    with open(os.path.join(path, "_ivf_centroids.json")) as f:
        C2 = np.array(json.load(f)["centroids"], dtype=np.float64)
    qids, Q = _collect_query_matrix(queries, id_col, vec_col)
    probe_cells = np.argsort(-(Q @ C2.T), axis=1)[:, :n_probe]
    needed = sorted({int(c) for row in probe_cells for c in row})

    scan = spark.read.parquet(path).filter(F.col("cell").isin(needed))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cell = pdf["cell"].to_numpy(dtype=np.int64)
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            out_q, out_c, out_s = [], [], []
            for i in range(len(qids)):
                mask = np.isin(cell, probe_cells[i]) & (ids != qids[i])
                if not mask.any():
                    continue
                out_q.append(np.full(mask.sum(), qids[i], dtype=np.int64))
                out_c.append(ids[mask])
                out_s.append(Vn[mask] @ Q[i])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "raw_cos": np.concatenate(out_s),
                }
            )

    scored = scan.mapInPandas(
        score, "query_id long, cand_id long, raw_cos double"
    ).select("query_id", "cand_id", F.round("raw_cos", 6).alias("cos_sim"))

    from hbase_bulkload_spark.operators.relational import ranked

    return ranked(
        scored, ["query_id"], [F.desc("cos_sim"), F.asc("cand_id")], n=k
    ).select("query_id", "cand_id", "cos_sim", "rn")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: the inverted-file ANN scale path.

    Index build = one pass assigning every vector to its nearest coarse
    centroid (the partition key). Search probes only the ``n_probe``
    closest cells per query, so the scored fraction is ~n_probe /
    n_centroids of the corpus — sub-linear scan cost at a recall knob,
    the standard IVF trade. At 100 TB the cell assignment is written as
    a partition column so a probe prunes file listings, not just rows.

    Centroids come from :func:`_ivf_centroids` (deterministic seed + one
    map-side-partial Lloyd step); the materialized-index counterpart
    (:func:`ivf_build_index` / :func:`ivf_probe_index`) persists the
    cell as a physical partition column instead. Candidate scoring
    reuses the exact GEMM; precision is exact, recall depends on the
    probe count (rows-only oracle).
    """
    import pandas as pd

    C2 = _ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    base = embeddings.select(id_col, vec_col)

    # --- probe: n_probe nearest cells per query -------------------------
    # The probe plan (query -> cells) is computed driver-side from the
    # refined centroids, so assign + probe + score fuse into ONE narrow
    # mapInPandas stage: per Arrow batch, assign cells with a GEMM, then
    # for each query score only the rows in its probe cells. No join, no
    # second Python round trip, no exchange before the top-k window. A
    # materialized index (cell as a partition column) would instead prune
    # file listings at scan time; this fused path is the index-free probe.
    qids, Q = _collect_query_matrix(queries, id_col, vec_col)
    probe_cells = np.argsort(-(Q @ C2.T), axis=1)[:, :n_probe]

    def probe_score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            cell = np.argmax(Vn @ C2.T, axis=1)
            out_q, out_c, out_s = [], [], []
            for i in range(len(qids)):
                mask = np.isin(cell, probe_cells[i]) & (ids != qids[i])
                if not mask.any():
                    continue
                out_q.append(np.full(mask.sum(), qids[i], dtype=np.int64))
                out_c.append(ids[mask])
                out_s.append(Vn[mask] @ Q[i])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "raw_cos": np.concatenate(out_s),
                }
            )

    scored = base.mapInPandas(
        probe_score, "query_id long, cand_id long, raw_cos double"
    ).select("query_id", "cand_id", F.round("raw_cos", 6).alias("cos_sim"))

    from hbase_bulkload_spark.operators.relational import ranked

    return ranked(
        scored, ["query_id"], [F.desc("cos_sim"), F.asc("cand_id")], n=k
    ).select("query_id", "cand_id", "cos_sim", "rn")


def cosine_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 8,
    n_tables: int = 8,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    broadcast_vectors: bool = True,
    signature_partitions: int | None = None,
    restrict_ids: DataFrame | None = None,
    pack_pair_ids: bool = False,
) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets per table → candidate
    pairs within a bucket → exact cosine verification. Precision exact,
    recall probabilistic (rises with n_tables and probe_radius).

    MULTI-PROBE (Lv et al., VLDB'07): with ``probe_radius=1`` every
    vector posts its per-table signature AND the n_planes single-bit
    flips, so two vectors collide in a table whenever their signatures
    differ in ≤ 2·radius bits. For a marginal pair at cos = 0.4
    (per-bit agreement 0.633), per-table collision rises 0.026 → 0.387,
    i.e. 8-table recall 0.19 → 0.98 — measured 0.31 → ~0.95 pair
    recall on the oracle corpus (RECALL artifact) for a 9× key fan-out.
    ``probe_radius=0`` is the classic exact-bucket scheme.

    Plan shape: the probe keys carry ONLY (table, bucket, id) — ids
    pair up via per-bucket posting lists (one shuffle, no self-join),
    and vectors join back by id for the verification step, so the
    9×-fanned exchange never ships an embedding. At 100 TB the knobs
    scale with the corpus, not the code: n_planes ~ log n keeps bucket
    occupancy (and the 2^n_planes keyspace) proportionate, n_tables
    ~ n^ρ (ρ = ln 1/p₁ / ln 1/p₂ ≈ 0.66 at this threshold) holds
    recall — fixed parameters on a growing corpus degrade to quadratic
    buckets exactly like any banding scheme."""
    if probe_radius not in (0, 1, 2):
        raise ValueError("probe_radius must be 0, 1, or 2")
    sig = lsh_signature_udf(n_planes, n_tables)
    # repartition ONLY the signature/explode path (the per-row-heavy
    # map side a single-row-group fixture would otherwise serialize on
    # one core); the verification join sides below stay on the raw
    # scan — they are broadcast builds (or sort-merge inputs past the
    # gate) and gain nothing from a round-robin exchange.
    sig_in = (
        embeddings.repartition(signature_partitions)
        if signature_partitions
        else embeddings
    )
    e = sig_in.select(
        F.col(id_col).alias("vec_id"), sig(F.col(vec_col)).alias("sigs")
    )
    per_table = e.select("vec_id", F.posexplode("sigs").alias("tbl", "s"))
    # every signature within Hamming distance <= probe_radius: XOR with
    # all <=radius-bit masks (mask 0 = the signature itself). Two
    # vectors then share a probe key in a table iff their signatures
    # differ in <= 2·radius bits. Radius 2 is the scale-escalation step
    # of lsh_plan_solve — 1+p+C(p,2) keys per vector per table, traded
    # against the order-of-magnitude table-count collapse it buys.
    masks = [0]
    if probe_radius >= 1:
        masks += [1 << p for p in range(n_planes)]
    if probe_radius >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    probe_keys = F.array(
        *[F.col("s").bitwiseXOR(F.lit(m)) for m in masks]
    )
    keyed = per_table.select(
        "vec_id", "tbl", F.explode(probe_keys).alias("bucket")
    )
    postings = (
        keyed.groupBy("tbl", "bucket")
        .agg(F.array_sort(F.collect_set("vec_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket_size is not None:
        # degenerate-corpus valve, same never-silent contract as the
        # MinHash/SimHash caps: a bucket of m members expands to C(m,2)
        # candidates, so one pathological bucket (near-identical
        # signature mass) is a quadratic tail no executor count fixes —
        # the cap drops it and PUBLISHES the drop count via observe()
        # so the trade is visible in metrics, never silent. None
        # (default) preserves the replay-oracle pair set exactly.
        postings = postings.observe(
            "lsh_bucket_cap",
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(
                (F.size("ids") > max_bucket_size).cast("long")
            ).alias("n_dropped_buckets"),
        ).filter(F.size("ids") <= max_bucket_size)
    p1 = postings.select("ids", F.posexplode("ids").alias("i", "vec_id_a"))
    if pack_pair_ids:
        # §2.3 narrower shuffle types (r11 verdict item 1): the
        # candidate-dedup exchange is the largest shuffle in the plan
        # at scale (sf10-density: ~1e10 candidate rows; its zstd'd
        # shuffle files exceed the page cache and the key measures
        # 1.23x its cost model). When every id fits u32 the (a, b)
        # pair packs into ONE unsigned-decomposable long — the dedup
        # exchange and its hash table key halve from two longs to one.
        # CALLER-GATED: only safe when 0 <= id < 2^32, an invariant the
        # operator cannot assume at 100 TB — callers check parquet
        # footer min/max stats (datasets.parquet_column_minmax) and
        # fall back loudly to the unpacked plan. Bijective for any
        # a, b in [0, 2^32): the shift may wrap long's sign bit, but
        # shiftrightunsigned/bitwiseAND decompose exactly; pairs are
        # (a, b) with a < b from the sorted posting arrays, so packing
        # changes neither the dedup'd set nor row values.
        cand = (
            p1.select(
                F.explode(
                    F.transform(
                        F.slice("ids", F.col("i") + 2, F.size("ids")),
                        lambda b: F.shiftleft(
                            F.col("vec_id_a").cast("long"), 32
                        ).bitwiseOR(b.cast("long")),
                    )
                ).alias("pk")
            )
            .dropDuplicates(["pk"])
            .select(
                F.shiftrightunsigned("pk", 32).alias("vec_id_a"),
                F.col("pk").bitwiseAND(F.lit(0xFFFFFFFF)).alias("vec_id_b"),
            )
        )
    else:
        cand = (
            p1.select(
                "vec_id_a",
                F.explode(
                    F.slice("ids", F.col("i") + 2, F.size("ids"))
                ).alias("vec_id_b"),
            )
            .dropDuplicates(["vec_id_a", "vec_id_b"])
        )
    if restrict_ids is not None:
        # EXPLICIT candidate restriction (e.g. a verdict key's bounded
        # exact-twin subset) applied BEFORE the expensive verification.
        # This used to happen implicitly — Catalyst pushed the caller's
        # after-the-fact semi-joins below the verification projection —
        # but the asNondeterministic flag (which stops the UDF's
        # duplicated eval) also forbids that reorder, so the
        # restriction must be part of the plan, not an optimizer
        # accident. Semi-filter commutes with per-pair verification:
        # results are identical either side of it.
        for side in ("vec_id_a", "vec_id_b"):
            ids = restrict_ids.select(F.col(restrict_ids.columns[0]).alias(side))
            cand = cand.join(F.broadcast(ids), side, "left_semi")
    va = embeddings.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("va")
    )
    vb = embeddings.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vb")
    )
    if broadcast_vectors:
        # pin the VECTOR side as the broadcast build — the choice the
        # static planner already made whenever embeddings were a small
        # raw scan. Once the input sits behind an exchange (the
        # round-10 parallelism floor), the planner loses that estimate
        # and AQE instead broadcast the CANDIDATE side at sf10-density:
        # sorted id pairs zstd-compress ~30:1, so a multi-GB pair set
        # measured under the 32 MB threshold and the build died on
        # spark.driver.maxResultSize (observed: >1.1 GiB from 6 of 32
        # tasks). Callers gate this off (LSH_BROADCAST_MAX_VECTORS)
        # when the corpus itself is too big to broadcast — there the
        # shuffle join is the only correct shape and the candidate
        # side must still never be broadcast (its compressed size is
        # a lie).
        va, vb = F.broadcast(va), F.broadcast(vb)
    else:
        # over the broadcast gate: force sort-merge so AQE cannot
        # promote EITHER side on the candidate set's lying compressed
        # stats — at this size the shuffle join is the only shape that
        # scales (both sides exceed any sane broadcast budget)
        cand = cand.hint("merge")
    # verification is Arrow-batched numpy (multi-probe candidates number
    # ~9²/2 × the classic scheme's, and the expression-tree cosine is
    # interpreted per pair — measured ~4× the whole query's wall at
    # sf0.1); raw cosines only, the HALF_UP round-6 + threshold stay
    # JVM-side so scores hash-match the exact twin
    joined = cand.join(va, "vec_id_a")
    if not broadcast_vectors:
        # re-hint the intermediate: join hints do not propagate, and
        # the (cand ⋈ va) stage inherits the candidate side's lying
        # compressed stats
        joined = joined.hint("merge")
    return (
        joined.join(vb, "vec_id_b")
        .select(
            "vec_id_a",
            "vec_id_b",
            F.round(
                _rowwise_raw_cosine_udf()(F.col("va"), F.col("vb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_pair_cells(
    n_rows: int, min_cells: int = 8, max_cells: int = 65536
) -> int:
    """Cell count for :func:`cosine_pairs_ivf`: ``~sqrt(n)`` cells keep
    expected per-cell membership at ``n_assign·sqrt(n)``, so total
    within-cell pair work is ``~(n_assign²/2)·n^1.5`` — smooth,
    table-free sub-quadratic growth with NO recall-solve that can cap
    out (the round-9 sign-LSH wall). ``floor(sqrt(n)+0.5)`` rather than
    Python ``round`` so the DuckDB replay oracle can mirror the formula
    exactly (SQL ROUND is half-up; Python round is banker's)."""
    import math

    return max(
        min_cells, min(max_cells, int(math.floor(math.sqrt(max(n_rows, 1)) + 0.5)))
    )


def cosine_pairs_ivf(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_cells: int = 16,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-blocked cosine pairs: assign every vector to its ``n_assign``
    nearest coarse cells, generate candidates ONLY within a cell (one
    chunked GEMM per cell), verify with the exact cosine. The table-free
    embedding-pair scale path (round-9 verdict item 2): sizing never
    caps — cells grow as sqrt(n) (:func:`ivf_pair_cells`) and cost grows
    as ~(n_assign²/2)·n^1.5 with no recall-solve wall, the SemDeDup-
    style blocking recipe re-expressed for shuffle execution.

    HONEST RECALL CONTRACT — this is deliberately NOT a
    recall-floor-verdict operator like :func:`cosine_pairs_lsh`'s
    q_sim_pairs_lsh key. Measured on the round-10 fixtures (driver-side
    numpy replay, threshold 0.4): the gate corpus's qualifying pairs
    are the ~3.2σ tail of UNSTRUCTURED 64-dim vectors (98.5% of pairs
    in cos [0.4, 0.5); zero pairs above 0.7), where NO blocking scheme
    holds high recall — the registered seed-centroid blocking catches
    0.35-0.52 of pairs falling with n (RECALL artifact; one Lloyd
    refinement raises it only to 0.45-0.80, still nowhere near a 0.9
    floor, and costs the replay oracle its engine-portability), and
    triangle-inequality cell-pair pruning prunes
    nothing (measured cell radii ~75° > θ_t = 66°, so the exact-recall
    variant degenerates to quadratic). The operator therefore ships as
    a FULL-ORACLE-BY-REPLAY key (the DuckDB oracle regenerates the
    identical blocked pair set, misses included) with blocking recall
    REPORTED per round in the RECALL artifact, and the 0.95-recall
    production path at this threshold remains the sign-LSH plan
    (:func:`lsh_plan_solve`, uncapped since round 10). On corpora with
    genuine near-dup structure (cos ≥ ~0.7 clusters — the published
    SemDeDup regime) the same blocking recall is measured ≥ 0.95
    (tests/test_recall.py pins both regimes).

    Engine-portable determinism (what makes the replay oracle
    possible): centroids are the ``n_cells`` smallest-id vectors
    normalized in float64 — NO Lloyd refinement, whose float summation
    order would diverge between engines; assignment ranks cells by
    ``round(cos, 6)`` descending with cell-id tie-break, the same
    round-6 cross-engine equality every green cosine key already
    relies on.

    Scale shape: one bounded driver collect (n_cells ≤ 65536 rows — the
    coarse codebook, same bound as :func:`_ivf_centroids`), one
    map-only Arrow assign pass (batch GEMM against the broadcast
    codebook), ONE shuffle of (cell, id, vector) rows (n·n_assign rows
    — never candidate pairs, which at the sf10-density corpus would be
    ~1e10 rows; the round-9 ENOSPC), per-cell chunked GEMM bounded at
    ~128 MB scratch regardless of cell skew, and a pair-id-only
    dedup shuffle of the (small) qualifying output. Past ~10^8 vectors
    the next rung is a hierarchical coarse quantizer (two-level cell
    keys) — the assignment GEMM's n·n_cells cost is the binding term,
    not this operator's shuffle shape."""
    import pandas as pd

    seed_rows = (
        embeddings.orderBy(F.asc(id_col)).limit(n_cells).select(vec_col).collect()
    )
    C = np.array([r[0] for r in seed_rows], dtype=np.float64)
    Cn = _row_normalize(C)
    r_assign = min(n_assign, len(Cn))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Vn = _row_normalize(V)
            S6 = _round6_half_away(Vn @ Cn.T)
            # stable argsort of -cos: equal rounded scores keep
            # ascending cell order — the deterministic (cos DESC,
            # cell ASC) ranking the SQL replay mirrors; rounding is
            # half-away-from-zero to match the oracle's DuckDB ROUND
            # (np.round's half-to-even flips boundary assignments)
            top = np.argsort(-S6, axis=1, kind="stable")[:, :r_assign]
            reps = np.repeat(np.arange(len(pdf)), r_assign)
            yield pd.DataFrame(
                {
                    "cell": top.ravel().astype(np.int32),
                    id_col: pdf[id_col].to_numpy()[reps],
                    vec_col: pdf[vec_col].take(reps).to_numpy(),
                }
            )

    assigned = embeddings.select(id_col, vec_col).mapInPandas(
        assign, f"cell int, {id_col} long, {vec_col} array<float>"
    )

    margin = threshold - 1e-6

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_id_a": np.array([], dtype=np.int64),
                "vec_id_b": np.array([], dtype=np.int64),
                "raw_cos": np.array([], dtype=np.float64),
            }
        )
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        m = len(ids)
        if m < 2:
            return empty
        V = np.array(list(pdf[vec_col]), dtype=np.float64)
        Vn = _row_normalize(V)
        # chunked GEMM: chunk·m ≤ 2^24 doubles (~128 MB) bounds scratch
        # even for a skew-collapsed mega-cell
        chunk = max(1, (1 << 24) // m)
        frames = []
        for s0 in range(0, m, chunk):
            S = Vn[s0 : s0 + chunk] @ Vn.T
            ia, ib = np.nonzero(S >= margin)
            ga = ia + s0
            keep = ids[ga] < ids[ib]
            if keep.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id_a": ids[ga[keep]],
                            "vec_id_b": ids[ib[keep]],
                            "raw_cos": S[ia[keep], ib[keep]],
                        }
                    )
                )
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    raw = assigned.groupBy("cell").applyInPandas(
        cell_pairs, "vec_id_a long, vec_id_b long, raw_cos double"
    )
    # a pair shared by two cells is computed by GEMMs of different
    # shapes/chunkings, so its two raw_cos values need not be
    # bit-identical — deduplicate with a deterministic MAX aggregation
    # on the raw value BEFORE rounding (dropDuplicates would keep an
    # arbitrary one); round-6 + threshold stay JVM-side (HALF_UP,
    # matches the oracle) like every other cosine operator here
    return (
        raw.groupBy("vec_id_a", "vec_id_b")
        .agg(F.max("raw_cos").alias("raw_cos"))
        .select(
            "vec_id_a", "vec_id_b", F.round("raw_cos", 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )
