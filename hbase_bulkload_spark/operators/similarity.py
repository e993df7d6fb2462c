"""Vector similarity search over an embedding column (north-star op 54,
SURVEY.md §2.14): brute-force cosine top-k / threshold pairs as the
exact baselines, and a random-hyperplane LSH bucketed variant as the
sub-quadratic scale path.

All dot products run in double precision inside JVM higher-order
functions (`zip_with` + `aggregate`) — sequential, deterministic, no
Python per-row. The LSH signature uses an Arrow-batched pandas UDF
(numpy matmul over fixed seeded hyperplanes) because a 64×p matmul per
row is exactly what vectorized UDFs are for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

LSH_SEED = 42
EMBED_DIM = 64


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
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
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
            V /= np.linalg.norm(V, axis=1, keepdims=True)
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


def cosine_pairs_exact(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 16,
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

    Scale note: work is B(B+1)/2 independent tasks; pick
    ``n_blocks ≈ n_vectors / 4096`` so a block matrix stays ~1 MB and
    task count ≫ cores. Numpy emits raw float64 cosines; the round-6 +
    threshold runs JVM-side so HALF_UP rounding matches the oracle
    exactly (numpy would use banker's rounding). The 1e-6 margin below
    keeps any pair that could round up across the threshold.
    """
    import pandas as pd  # noqa: F811 — local for executor pickling

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
                va /= np.linalg.norm(va, axis=1, keepdims=True)
                vb /= np.linalg.norm(vb, axis=1, keepdims=True)
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


def _hyperplanes(n_planes: int, n_tables: int) -> np.ndarray:
    """Deterministic hyperplanes (seeded MT19937 — identical on every
    executor and every run)."""
    rng = np.random.RandomState(LSH_SEED)
    return rng.standard_normal((n_tables, n_planes, EMBED_DIM))


def lsh_signature_udf(n_planes: int = 8, n_tables: int = 8):
    """Arrow-batched signature: per table, the sign-bit pattern of the
    vector against `n_planes` hyperplanes, packed into an int."""
    planes = _hyperplanes(n_planes, n_tables)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def sig(vecs: pd.Series) -> pd.Series:
        V = np.vstack(vecs.to_numpy())  # (batch, dim) float32
        out = []
        for t in range(n_tables):
            bits = (V @ planes[t].T) > 0  # (batch, planes)
            out.append(bits.astype(np.int64) @ weights)
        packed = np.stack(out, axis=1)  # (batch, tables)
        return pd.Series(list(packed))

    return sig


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

    Centroids are deterministic: the vectors with the ``n_centroids``
    smallest ids, refined by one Lloyd iteration over the corpus (means
    in float64). Candidate scoring reuses the exact GEMM; precision is
    exact, recall depends on the probe count (rows-only oracle).
    """
    import pandas as pd

    # --- deterministic coarse centroids: seed + one Lloyd step ----------
    seed_rows = (
        embeddings.orderBy(F.asc(id_col)).limit(n_centroids).select(vec_col).collect()
    )
    C = np.array([r[0] for r in seed_rows], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    def assign_factory(cents: np.ndarray):
        # carries the vector through (narrow stage) so no shuffle join is
        # ever needed to reunite (id, vec, cell)
        def assign(batches):
            for pdf in batches:
                V = np.array(list(pdf[vec_col]), dtype=np.float64)
                Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
                cell = np.argmax(Vn @ cents.T, axis=1).astype(np.int32)
                pdf = pdf.copy()
                pdf["cell"] = cell
                yield pdf

        return assign

    assign_schema = f"{id_col} long, {vec_col} array<float>, cell int"
    base = embeddings.select(id_col, vec_col)
    first = base.mapInPandas(assign_factory(Cn), assign_schema)
    # one Lloyd refinement: new centroid = mean of its assigned vectors
    refined = (
        first.select("cell", F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select("cell", F.col("dm.m").alias("centroid"))
        .collect()
    )
    C2 = np.array(Cn)
    for r in refined:
        v = np.array(r["centroid"], dtype=np.float64)
        C2[r["cell"]] = v / np.linalg.norm(v)

    indexed = base.mapInPandas(assign_factory(C2), assign_schema)

    # --- probe: n_probe nearest cells per query -------------------------
    qids, Q = _collect_query_matrix(queries, id_col, vec_col)
    probe_cells = np.argsort(-(Q @ C2.T), axis=1)[:, :n_probe]
    probes = [
        (int(qids[i]), int(c)) for i in range(len(qids)) for c in probe_cells[i]
    ]
    probe_df = F.broadcast(
        embeddings.sparkSession.createDataFrame(probes, "query_id long, cell int")
    )
    qmat = {int(qids[i]): Q[i] for i in range(len(qids))}

    cand = indexed.join(probe_df, "cell").filter(F.col(id_col) != F.col("query_id"))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            Qm = np.array([qmat[q] for q in pdf["query_id"]])
            s = np.einsum("ij,ij->i", V, Qm)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(dtype=np.int64),
                    "cand_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "raw_cos": s,
                }
            )

    scored = cand.mapInPandas(
        score, "query_id long, cand_id long, raw_cos double"
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
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets per table → candidate
    pairs within a bucket → exact cosine verification. Precision exact,
    recall probabilistic (rises with n_tables)."""
    sig = lsh_signature_udf(n_planes, n_tables)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"), sig(F.col(vec_col)).alias("sigs")
    )
    e = e.select("vec_id", "vec", F.posexplode("sigs").alias("tbl", "bucket"))
    a = e.alias("a")
    b = e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .dropDuplicates(["vec_id_a", "vec_id_b"])
    )
    return cand.select(
        "vec_id_a",
        "vec_id_b",
        cosine(F.col("va"), F.col("vb")).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)
