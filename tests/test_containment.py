"""Precision-1 containment for the probabilistic (rows-only) dedup /
similarity paths: LSH-style methods may MISS pairs (recall is the
probabilistic part) but every pair they emit passes an exact
verification step, so emitted ⊆ exact must hold with matching scores.
SimHash chunk banding is stronger — pigeonhole makes recall 1 at
hamming ≤ 3 with 4 × 16-bit chunks — so there the sets must be EQUAL."""

from __future__ import annotations

import pytest

from hbase_bulkload_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_minhash_lsh_contained_in_exact_jaccard(docs):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, max_shingle_freq=None
        ).collect()
    }
    assert set(got) <= set(exact), sorted(set(got) - set(exact))[:5]
    for pair, jac in got.items():
        assert jac == exact[pair], (pair, jac, exact[pair])


def test_simhash_pairs_equal_brute_force_hamming(docs):
    sig = {r.doc_id: r.simhash for r in dedup.simhash64(docs).collect()}
    ids = sorted(sig)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sig[a] ^ sig[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3
    }
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_pairs(docs, max_hamming=3).collect()
    }
    assert set(got) == brute, (sorted(set(got) ^ brute)[:5])
    for (a, b), ham in got.items():
        assert ham == bin((sig[a] ^ sig[b]) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_cosine_lsh_contained_in_exact_pairs(emb):
    got = {
        (r.vec_id_a, r.vec_id_b): round(r.cos_sim, 5)
        for r in similarity.cosine_pairs_lsh(emb, threshold=0.4).collect()
    }
    exact = {
        (r.vec_id_a, r.vec_id_b): round(r.cos_sim, 5)
        for r in similarity.cosine_pairs_exact(emb, threshold=0.4).collect()
    }
    assert set(got) <= set(exact), sorted(set(got) - set(exact))[:5]
    for pair, cos in got.items():
        assert cos == exact[pair], (pair, cos, exact[pair])
    # recall is NOT asserted high: at threshold 0.4 (≈66° angle) the
    # per-plane collision prob is ~0.63, so 8 planes × 8 tables gives
    # ~1-(1-0.63^8)^8 ≈ 18% expected recall — measured 10/66 ≈ 15% on
    # this fixture. That is the documented n_tables/recall tradeoff, not
    # a bug; the test pins that the path finds SOMETHING and that every
    # find is exact-verified.
    if exact:
        assert len(got) >= 1


def test_phash_banding_equals_brute_force(spark, sf_dir):
    """pHash chunk banding must equal brute-force hamming ≤ 3 over the
    same signatures (pigeonhole recall 1, bit_count precision 1), and
    every emitted pair must be an exact-method near-dup on this corpus
    (perceptual precision against the n-gram Jaccard ground truth)."""
    from pyspark.sql import functions as F

    from hbase_bulkload_spark.operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    media = docs.select(
        "doc_id",
        F.lit("image").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
    )
    sig = {r.doc_id: r.phash for r in multimodal.phash64(media).collect()}
    ids = sorted(sig)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sig[a] ^ sig[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in multimodal.phash_pairs(media, max_hamming=3).collect()
    }
    assert got == brute, (sorted(got - brute)[:5], sorted(brute - got)[:5])

    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.3, max_shingle_freq=None
        ).collect()
    }
    assert got <= exact, sorted(got - exact)[:5]


def test_banding_rejects_out_of_recall_hamming(docs):
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_pairs(docs, max_hamming=4)
