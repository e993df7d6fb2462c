"""Recall floors for the probabilistic (rows-only) ANN/LSH paths.

Precision = 1 is already pinned by tests/test_containment.py (emitted ⊆
exact with matching scores); these floors pin the RECALL side at the
registered parameters so a regression in the probe budget / band count /
table sizing breaks a test instead of silently shrinking a rows-only
result. The per-round artifact (RECALL_r{N}.json, written by
tools/record_recall.py at sf0.1) records the exact numbers; measured at
this test scale: IVF 0.925, LSH pairs 0.939, MinHash near-dup 1.0.
"""

from __future__ import annotations

from tools.record_recall import (
    dedup_near_recall,
    incremental_minhash_recall,
    pairs_lsh_recall,
    topk_recall,
)


def test_ivf_topk_recall_floor(spark, sf_dir):
    m = topk_recall(spark, sf_dir)
    assert m["n_queries"] > 0
    assert m["value"] >= 0.9, m


def test_lsh_pairs_recall_floor(spark, sf_dir):
    m = pairs_lsh_recall(spark, sf_dir)
    assert m["n_exact_pairs"] > 0
    assert m["value"] >= 0.9, m


def test_minhash_near_dedup_recall_floor(spark, sf_dir):
    m = dedup_near_recall(spark, sf_dir)
    assert m["n_exact_pairs"] > 0
    assert m["value"] >= 0.95, m


def test_incremental_minhash_recall_floor(spark, sf_dir):
    m = incremental_minhash_recall(spark, sf_dir)
    assert m["n_exact_flagged"] > 0
    assert m["value"] >= 0.95, m


def test_ivf_pairs_blocking_recall_reported(spark, sf_dir):
    """q_sim_pairs_ivf's recall contract is REPORTED-only (full replay
    oracle pins correctness): on the unstructured tail-pair fixture
    blocking recall is structurally mid-range — the band here is a
    regression canary on the registered (sqrt(n) cells, 2-assign)
    sizing, not a quality floor (see pairs_ivf_recall docstring)."""
    from tools.record_recall import pairs_ivf_recall

    m = pairs_ivf_recall(spark, sf_dir)
    assert m["n_exact_pairs"] > 0
    assert 0.3 <= m["value"] <= 1.0, m


def test_ivf_pairs_precision_exact(spark, sf_dir):
    """Every emitted IVF pair must be a true threshold pair with the
    exact round-6 cosine — candidates verify with the exact dot, so
    precision is 1 by construction."""
    from hbase_bulkload_spark.queries.extensions import (
        q_sim_pairs,
        q_sim_pairs_ivf,
    )

    got = {
        (r.vec_id_a, r.vec_id_b): r.cos_sim
        for r in q_sim_pairs_ivf(spark, sf_dir).collect()
    }
    want = {
        (r.vec_id_a, r.vec_id_b): r.cos_sim
        for r in q_sim_pairs(spark, sf_dir).collect()
    }
    assert got
    for pair, cos in got.items():
        assert pair in want and want[pair] == cos, pair


def test_ivf_pairs_high_recall_on_clustered_corpus(spark):
    """The published SemDeDup regime: on a corpus with genuine near-dup
    structure (planted duplicates at cos >= ~0.9, threshold 0.7 so only
    planted pairs qualify) IVF blocking recall is >= 0.95 — the
    operator's honest home turf, vs the unstructured 3.2-sigma tail of
    the main fixture where no blocking scheme can hold a floor."""
    import numpy as np

    from hbase_bulkload_spark.operators.similarity import (
        cosine_pairs_exact,
        cosine_pairs_ivf,
        ivf_pair_cells,
    )

    rs = np.random.RandomState(7)
    base = rs.normal(size=(40, 64))
    dup = base + 0.15 * rs.normal(size=(40, 64))
    V = np.vstack([base, dup]).astype(np.float32)
    rows = [(i, [float(x) for x in V[i]]) for i in range(len(V))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.vec_id_a, r.vec_id_b)
        for r in cosine_pairs_exact(df, threshold=0.7, n_blocks=2).collect()
    }
    got = {
        (r.vec_id_a, r.vec_id_b)
        for r in cosine_pairs_ivf(
            df, threshold=0.7, n_cells=ivf_pair_cells(len(V)), n_assign=2
        ).collect()
    }
    assert len(exact) >= 30  # the planted pairs actually qualify
    assert len(got & exact) / len(exact) >= 0.95
    assert got <= exact  # precision exact here too
