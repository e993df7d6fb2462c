"""Deduplication operators for training-data pipelines (north-star ops,
SURVEY.md §2.14 ops 52-53): exact content-hash dedup, exact n-gram
Jaccard near-dup, MinHash+LSH banding, and SimHash.

Scale notes (the reason each exists):
- exact: one hash-groupBy — embarrassingly parallel, reuses the MD5 of
  the key layer (op 13a).
- n-gram Jaccard: the *exact* pairwise method; the shingle self-join is
  quadratic in docs sharing a shingle, so `max_shingle_freq` caps
  hot shingles (standard frequency-capping; dropped shingles are the
  stop-shingles that carry no dedup signal).
- MinHash+LSH: the sub-quadratic scale path — signatures are a single
  groupBy over exploded shingles (xxhash64, JVM-side), banding turns
  near-dup search into an equi-join; candidates are verified with exact
  Jaccard so precision is exact and only recall is probabilistic.
- SimHash: one 64-bit signature per doc via bit-majority of token
  hashes; hamming-≤-r pairs found by 16-bit chunk banding (any pair at
  hamming ≤ 3 shares at least one of 4 chunks — pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_bulkload_spark.functions.text import tokens, word_shingles


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Op 52: group by content hash; representative = min id."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("rep_doc"))
    )


def doc_shingles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Exploded distinct word-n-gram shingles: (doc_id, shingle)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Op 53a (exact): all doc pairs with n-gram Jaccard ≥ threshold.

    Plan shape: explode → (optional frequency cap) → self equi-join on
    shingle → count intersections → join sizes → filter. Three shuffles,
    all on uniformly-hashed keys.
    """
    sh = doc_shingles(docs, n=n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # posting-list formulation: group each shingle's (sorted, distinct)
    # doc list once, expand its C(m,2) pairs with higher-order functions
    # — one shuffle over the shingle set instead of a self-join that
    # shuffles it twice; the frequency cap bounds m so the expansion
    # can't blow up on stop-shingles
    postings = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ds")
    )
    if max_shingle_freq is not None:
        postings = postings.filter(F.size("ds") <= max_shingle_freq)
    pairs = F.flatten(
        F.transform(
            "ds",
            lambda x, i: F.transform(
                F.slice("ds", i + F.lit(2), F.size("ds")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    inter = (
        postings.filter(F.size("ds") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.round(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(docs: DataFrame, k: int = 16, n: int = 3) -> DataFrame:
    """k-permutation MinHash signature per doc: min over seeded xxhash64
    of each distinct shingle — one groupBy, all JVM expressions."""
    sh = doc_shingles(docs, n=n)
    mins = [
        F.min(F.xxhash64(F.concat(F.lit(f"s{s}|"), F.col("shingle")))).alias(f"mh{s}")
        for s in range(k)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Op 53b (scale path): MinHash banding → candidate pairs →
    exact-Jaccard verification ≥ threshold. Probabilistic recall, exact
    precision. Returns (doc_a, doc_b, jaccard)."""
    assert k % bands == 0
    rows = k // bands
    sig = minhash_signatures(docs, k=k, n=n)
    # all band keys in one pass: posexplode + a single self-join on
    # (band, key) instead of `bands` separate self-joins/unions — one
    # shuffle, `bands`× fewer stages
    band_keys = F.array(
        *[
            F.xxhash64(
                F.lit(band), *[F.col(f"mh{band * rows + r}") for r in range(rows)]
            )
            for band in range(bands)
        ]
    )
    bd = sig.select("doc_id", F.posexplode(band_keys).alias("band", "bkey"))
    a = bd.alias("a")
    b = bd.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact-Jaccard verification restricted to candidate pairs — the
    # whole point of LSH is that the quadratic join never happens; only
    # |candidates| × shingle intersections are computed
    sh = doc_shingles(docs, n=n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.round(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: explode tokens → xxhash64 → per-bit ±1
    majority vote → pack. All JVM expressions (64 conditional sums in
    one hash aggregate)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    ).select("doc_id", F.xxhash64("t").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(64)
    ]
    per_doc = tok.groupBy("doc_id").agg(*votes)
    packed = None
    for b in range(64):
        bit = F.when(F.col(f"v{b}") >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        packed = term if packed is None else packed.bitwiseXOR(term)
    return per_doc.select("doc_id", packed.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs at hamming ≤ max_hamming via 16-bit chunk
    banding (pigeonhole: ≤3 differing bits can't hit all 4 chunks)."""
    sig = simhash64(docs)
    # all 4 chunk keys in one posexplode + a single self-join (same
    # restructure as minhash_lsh_pairs: one shuffle, 4x fewer stages)
    chunk_keys = F.array(
        *[
            F.shiftrightunsigned("simhash", c * 16).bitwiseAND(F.lit(0xFFFF))
            for c in range(4)
        ]
    )
    bd = sig.select("doc_id", "simhash", F.posexplode(chunk_keys).alias("chunk", "ck"))
    a = bd.alias("a")
    b = bd.alias("b")
    cand = a.join(
        b,
        (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.ck") == F.col("b.ck"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
            "hamming"
        ),
    )
    return cand.distinct().filter(F.col("hamming") <= max_hamming)
