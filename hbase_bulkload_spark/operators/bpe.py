"""Distributed BPE merge learning (tokenizer training) — the step that
turns a corpus into a byte-pair-encoding merge table before any LLM
training run.

Shape: the corpus collapses ONCE to a weighted word vocabulary (one
hash groupBy — at 100 TB this is the only corpus-scale pass; everything
after runs on the vocabulary, which is bounded by the language, not the
data). Each merge round then is:

1. adjacent symbol pairs exploded from the vocab arrays, weighted by
   word count → one hash aggregate over the pair domain (map-side
   partials; the reduced frame is pair-vocabulary-sized);
2. the argmax pair — deterministic tie-break (count desc, then pair
   lexicographic) so re-runs and the reference implementation agree —
   collected as ONE driver row and closed over into
3. a map-only merge pass: every vocab word's symbol array rewritten by
   a codegen'd sequential `aggregate` (leftmost-first, non-overlapping
   — standard greedy BPE apply), lineage cut per round.

O(n_merges) rounds of vocabulary-sized work after one corpus pass —
the same iterate-with-broadcast-state discipline as connected
components. No SQL oracle exists for an iterative argmax loop, so the
correctness pin is exact merge-list equality against an independent
pure-Python reference (tests/test_bpe.py), plus the rows-only driver
check.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_bulkload_spark.functions.text import tokens


def _chars(word: Column) -> Column:
    """Word → array of single characters (codegen'd, no UDF)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Rewrite one symbol array: every leftmost, non-overlapping
    adjacent (left, right) becomes the merged symbol — a sequential
    fold (`F.aggregate`) carrying a one-symbol lookahead."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, x):
        arr, prev = acc["arr"], acc["prev"]
        return (
            F.when(prev.isNull(), F.struct(arr.alias("arr"), x.alias("prev")))
            .when(
                (prev == left) & (x == right),
                F.struct(
                    F.concat(arr, F.array(F.lit(merged))).alias("arr"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .otherwise(
                F.struct(F.concat(arr, F.array(prev)).alias("arr"), x.alias("prev"))
            )
        )

    return F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(acc["prev"].isNull(), acc["arr"]).otherwise(
            F.concat(acc["arr"], F.array(acc["prev"]))
        ),
    )


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    vocab_partitions: int = 1,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the whitespace-token words of
    ``docs[text_col]``. Returns one row per learned merge:
    ``(step, left, right, pair_count)`` in learning order.

    ``vocab_partitions`` sizes the loop state: natural-language
    vocabularies are small, so the default collapses the weighted vocab
    to ONE partition after the corpus pass — every merge round is then
    a single-task job instead of 32 near-empty shuffle tasks (measured
    15 s → ~4 s for 8 rounds at sf0.1). Raise it for open-vocabulary
    corpora (URLs, code identifiers) where the vocab itself is big."""
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_chars(F.col("w")).alias("syms"), "cnt")
        .repartition(vocab_partitions)
        .localCheckpoint()
    )

    merges: list[tuple[int, str, str, int]] = []
    for step_i in range(n_merges):
        n = F.size("syms")
        pairs = (
            vocab.filter(n >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, n - 1).alias("a"),
                        F.slice("syms", 2, n - 1).alias("b"),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
        )
        top = pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((step_i, a, b, c))
        vocab = vocab.withColumn("syms", _merge_pair(F.col("syms"), a, b))
        if (step_i + 1) % 4 == 0:
            # cut lineage every few rounds: each uncut round nests one
            # more fold into the expression tree (re-derived from the
            # vocab checkpoint at ~no cost — the frame is tiny), but an
            # unbounded chain would blow up planning/codegen; a cut
            # every round costs one extra job per merge (measured ~30%
            # of the loop wall at 8 merges)
            vocab = vocab.localCheckpoint()

    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count bigint"
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to the corpus — the tokenizer APPLY
    step that :func:`learn_bpe` trains for: per word, characters →
    merges replayed in learning order (leftmost-first, non-overlapping
    — exactly the transform the learner applied to its own vocabulary,
    so the corpus segments identically to training). Returns
    (doc_id, tokens array<string>, n_tokens).

    Scale shape: MAP-ONLY — the merge table is vocabulary-bounded (a
    tokenizer is a few 10k merges), collected once driver-side and
    closure-broadcast into an Arrow-batched UDF; per-batch word
    memoization means each distinct word is encoded once per batch, so
    throughput tracks the corpus's word-vocabulary locality, not its
    token count. Deterministic given the merge list (no SQL oracle —
    iterative per-word rewriting — so the correctness pin is
    encode ≡ the pure-Python reference, tests/test_bpe.py)."""
    from pyspark.sql.functions import pandas_udf

    if isinstance(merges, DataFrame):
        mlist = [
            (r["left"], r["right"])
            for r in merges.orderBy("step").collect()
        ]
    else:
        mlist = list(merges)

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            t = cache.get(w)
            if t is None:
                syms = list(w)
                for left, right in mlist:
                    out: list[str] = []
                    i = 0
                    n = len(syms)
                    while i < n:
                        if (
                            i + 1 < n
                            and syms[i] == left
                            and syms[i + 1] == right
                        ):
                            out.append(left + right)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                cache[w] = syms
                t = syms
            return t

        return texts.map(
            lambda s: [t for w in s.split(" ") if w for t in enc_word(w)]
        )

    return docs.select(
        F.col(id_col).alias("doc_id"),
        enc(F.col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))
