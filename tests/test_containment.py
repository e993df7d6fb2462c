"""Precision-1 containment for the probabilistic (rows-only) dedup /
similarity paths: LSH-style methods may MISS pairs (recall is the
probabilistic part) but every pair they emit passes an exact
verification step, so emitted ⊆ exact must hold with matching scores.
SimHash chunk banding is stronger — pigeonhole makes recall 1 at
hamming ≤ 3 with 4 × 16-bit chunks — so there the sets must be EQUAL."""

from __future__ import annotations

import math

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


def test_incremental_minhash_contained_in_exact(spark, sf_dir):
    """Verdict-level precision for the incremental MinHash tier: every
    doc it flags (and every dup partner it names) must appear in the
    uncapped exact incremental twin's verdict graph — banding may MISS
    dups, never invent them (candidates verify with exact Jaccard)."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    hist = d.filter(F.col("doc_id") % 3 != 0)
    batch = d.filter(F.col("doc_id") % 3 == 0)
    got = {
        r.doc_id: r
        for r in dedup.incremental_minhash_dedup(hist, batch).collect()
    }
    exact = {
        r.doc_id: r
        for r in dedup.incremental_ngram_dedup(
            hist, batch, max_shingle_freq=None
        ).collect()
    }
    for doc_id, r in got.items():
        e = exact[doc_id]
        if r.dup_of_history is not None:
            assert e.dup_of_history is not None, doc_id
        if r.dup_in_batch is not None:
            assert e.dup_in_batch is not None, doc_id
        if not r.keep:
            assert not e.keep, doc_id


def test_banding_rejects_out_of_recall_hamming(docs):
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_pairs(docs, max_hamming=4)


def test_banding_rejects_non_tiling_chunks(spark):
    one = spark.createDataFrame([(1, 7)], "doc_id long, sig long")
    with pytest.raises(ValueError, match="tile"):
        dedup.hamming_pairs_banded(one, "sig", n_chunks=5, max_hamming=3).collect()


def test_refined_banding_bounds_degenerate_buckets(spark):
    """The 100 TB posture test: a corpus where every signature shares
    one 16-bit chunk value (the old chunk-only keys would put ALL n
    docs into one bucket, C(n,2) expansion) must still produce small
    buckets under the refined (chunk, sub-block) keys, because the
    remaining 48 bits differ. Measured directly on the band-key
    expressions the operator uses."""
    import random

    rng = random.Random(42)
    n = 400
    shared_chunk = 0xABCD  # low 16 bits identical across the corpus
    rows = [
        (i, (rng.getrandbits(48) << 16) | shared_chunk) for i in range(n)
    ]
    df = spark.createDataFrame(
        [(i, s - (1 << 64) if s >= 1 << 63 else s) for i, s in rows],
        "doc_id long, sig long",
    )
    keys = dedup.banding_key_columns("sig", n_chunks=4, max_hamming=3)
    assert len(keys) == 16  # n_chunks × n_sub combinations
    from pyspark.sql import functions as F

    sizes = (
        df.select(F.posexplode(F.array(*keys)).alias("band", "bk"))
        .groupBy("band", "bk")
        .count()
    )
    max_bucket = sizes.agg(F.max("count")).collect()[0][0]
    # chunk-0 band family keys carry 12 random bits (4096 keyspace) so
    # 400 docs spread to E[m] ≈ 1.1; other families carry 16 random
    # bits. Birthday-bounded: nothing remotely linear in n.
    assert max_bucket <= 8, max_bucket
    # and the pair finder still finds a planted hamming-2 pair amid the
    # degenerate corpus
    base = rows[0][1]
    planted = base ^ (1 << 20) ^ (1 << 63)
    extra = spark.createDataFrame(
        [(1000, planted - (1 << 64) if planted >= 1 << 63 else planted)],
        "doc_id long, sig long",
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.hamming_pairs_banded(df.union(extra), "sig").collect()
        if r.doc_a == 0 or r.doc_b == 0
    }
    assert (0, 1000) in got


def _ref_band_keys(sig: int, n_chunks: int = 4, max_hamming: int = 3):
    """Independent pure-Python reference of the Manku-refined band keys
    (from the spec, not the Spark code): for each chunk i, the remaining
    64-width bits re-packed contiguously and split into n_chunks
    sub-blocks; key = (band position, chunk value ‖ sub value)."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    rem_bits = 64 - width
    n_sub = min(n_chunks, rem_bits)
    sub_w = [
        rem_bits // n_sub + (1 if j < rem_bits % n_sub else 0)
        for j in range(n_sub)
    ]
    sub_off = [sum(sub_w[:j]) for j in range(n_sub)]
    sw_bits = max(sub_w)
    out = []
    for i in range(n_chunks):
        ck = (sig >> (i * width)) & mask
        lo = sig & ((1 << (i * width)) - 1)
        hi = sig >> ((i + 1) * width) if (i + 1) * width < 64 else 0
        rem = lo | (hi << (i * width))
        for j in range(n_sub):
            sk = (rem >> sub_off[j]) & ((1 << sub_w[j]) - 1)
            out.append((i * n_sub + j, (ck << sw_bits) | sk))
    return out


def test_banding_key_expressions_match_python_reference(spark):
    """The Spark band-key expressions must agree with an independent
    Python implementation of the same spec on random signatures (one
    batched job, 500 examples)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    sigs = [rng.getrandbits(64) for _ in range(500)]
    df = spark.createDataFrame(
        [(i, s - (1 << 64) if s >= 1 << 63 else s) for i, s in enumerate(sigs)],
        "i long, sig long",
    )
    keys = dedup.banding_key_columns("sig", n_chunks=4, max_hamming=3)
    got = {}
    for r in df.select(
        "i", F.posexplode(F.array(*keys)).alias("band", "bk")
    ).collect():
        got.setdefault(r.i, set()).add((r.band, r.bk & 0xFFFFFFFFFFFFFFFF))
    for i, s in enumerate(sigs):
        assert got[i] == set(_ref_band_keys(s)), (i, hex(s))


def test_banding_pigeonhole_property():
    """Hypothesis, pure Python (validated equal to the Spark
    expressions above): any two signatures at hamming ≤ 3 share at
    least one band key — the exact-recall guarantee the operator's
    final bit_count filter relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=0, max_value=(1 << 64) - 1),
        st.sets(st.integers(min_value=0, max_value=63), max_size=3),
    )
    def check(sig, flip_bits):
        other = sig
        for b in flip_bits:
            other ^= 1 << b
        assert set(_ref_band_keys(sig)) & set(_ref_band_keys(other))

    check()


def test_banding_bucket_cap_drops_degenerate_corpus(spark):
    """max_bucket_size is the safety valve for ~identical signatures
    (where pair output is legitimately quadratic): capped, the
    degenerate buckets drop (documented recall loss); uncapped, all
    C(n,2) pairs emerge."""
    n = 30
    df = spark.createDataFrame(
        [(i, 12345) for i in range(n)], "doc_id long, sig long"
    )
    capped = dedup.hamming_pairs_banded(
        df, "sig", max_bucket_size=16
    ).collect()
    assert capped == []
    uncapped = dedup.hamming_pairs_banded(df, "sig").collect()
    assert len(uncapped) == n * (n - 1) // 2


def test_lsh_banding_params_meet_design_floor():
    """The derived MinHash banding must clear its design recall floor
    AT the verification threshold — the worst admissible similarity —
    for every threshold the engine's queries use (the fixed (16, 4)
    default this replaced reached 0.95 recall only at s >= 0.85 and
    failed the sf1.0 in-query verdict at J near 0.5)."""
    for t in (0.3, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95):
        k, bands = dedup.lsh_banding_params(t)
        rows = k // bands
        # max_k is a soft budget: sub-0.5 thresholds may exceed it
        # rather than degrade to single-minhash bands
        assert k % bands == 0 and k <= 128
        recall_at_t = 1.0 - (1.0 - t**rows) ** bands
        assert recall_at_t >= 0.98, (t, k, bands, recall_at_t)
        # rows >= 2 keeps single-minhash band keys (and their massive
        # false-candidate buckets) out of every derivation
        assert rows >= 2, (t, k, bands)


def test_lsh_banding_params_tiny_threshold_no_underflow():
    """Sub-0.01 thresholds used to crash with ZeroDivisionError:
    threshold**8 underflowed 1 ulp of 1.0 so log(1 - t**r) was log(1.0)
    == 0.0 before the r=2 fallback was reached. log1p keeps the
    denominator exact for tiny t**r; full double underflow (t² == 0.0)
    raises a clear ValueError instead of dividing by zero."""
    import pytest

    for t in (0.009, 0.005, 1e-3, 1e-6):
        k, bands = dedup.lsh_banding_params(t)
        rows = k // bands
        assert rows >= 2 and k % bands == 0
        # the r=2 fallback still sizes b from the recall floor (max_k
        # is the soft budget, recall is not), so the design floor is
        # the real assertion even at tiny thresholds — the previous
        # `or bands >= 1` clause made this vacuously true. Evaluate
        # recall via log1p/expm1, the derivation's own float path:
        # the naive (1 - t**rows)**bands loses ~1e-4 relative precision
        # in the 1.0 - tr rounding (ulp near 1.0 is 2.2e-16 against a
        # 1e-12 gap) and bands ~ 4e12 amplifies that into a spurious
        # 1e-5 recall shortfall at t = 1e-6
        recall_at_t = -math.expm1(bands * math.log1p(-(t**rows)))
        assert recall_at_t >= 0.98, (t, k, bands, recall_at_t)
    with pytest.raises(ValueError, match="too small"):
        dedup.lsh_banding_params(1e-200)


def test_cosine_lsh_radius2_superset_of_radius1_and_contained(emb):
    """probe_radius=2 (lsh_plan_solve's scale-escalation step) widens
    the per-table collision window from <=2 to <=4 signature bits: at
    identical (planes, tables) the radius-2 pair set must contain the
    radius-1 set, and both stay inside the exact twin (precision 1)."""
    exact = {
        (r.vec_id_a, r.vec_id_b): r.cos_sim
        for r in similarity.cosine_pairs_exact(
            emb, threshold=0.4, n_blocks=2
        ).collect()
    }
    sets = {}
    for radius in (1, 2):
        sets[radius] = {
            (r.vec_id_a, r.vec_id_b): r.cos_sim
            for r in similarity.cosine_pairs_lsh(
                emb, threshold=0.4, n_planes=10, n_tables=4,
                probe_radius=radius,
            ).collect()
        }
    assert set(sets[1]) <= set(sets[2])
    assert len(sets[2]) > len(sets[1])  # the wider window really bites
    for radius in (1, 2):
        for pair, cos in sets[radius].items():
            assert pair in exact and exact[pair] == cos, (radius, pair)


def test_cosine_pairs_ivf_contained_in_exact(emb):
    got = {
        (r.vec_id_a, r.vec_id_b): r.cos_sim
        for r in similarity.cosine_pairs_ivf(
            emb, threshold=0.4, n_cells=8, n_assign=2
        ).collect()
    }
    exact = {
        (r.vec_id_a, r.vec_id_b): r.cos_sim
        for r in similarity.cosine_pairs_exact(
            emb, threshold=0.4, n_blocks=2
        ).collect()
    }
    assert got
    for pair, cos in got.items():
        assert pair in exact and exact[pair] == cos, pair


def test_cosine_lsh_bucket_cap_drops_loudly(spark):
    """max_bucket_size (round 10): a degenerate corpus (near-identical
    vectors -> one mega-bucket per table) is a quadratic tail no
    executor count fixes; the valve drops oversized buckets and
    publishes the count via the lsh_bucket_cap observation — never
    silent. Default None preserves the registered pair set."""
    import numpy as np

    base = np.ones(64, dtype=np.float32)
    rows = [
        (i, [float(x) for x in base + 0.001 * np.float32(i % 7)])
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.cosine_pairs_lsh(
        emb, threshold=0.99, n_planes=8, n_tables=2, max_bucket_size=5
    ).collect()
    assert len(got) == 0  # every bucket was the mega-bucket, all dropped
    uncapped = similarity.cosine_pairs_lsh(
        emb, threshold=0.99, n_planes=8, n_tables=2
    ).collect()
    assert len(uncapped) == 30 * 29 // 2
