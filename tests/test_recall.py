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
