"""Generate the committed DuckDB-oracle fixtures for ``q_bpe_encode``
and ``q_bpe_merges``.

BPE tokenizer APPLY (iterative per-word pair rewriting) is not
ANSI-SQL-expressible, so the driver's hash-compare needs a relational
stand-in: this script replays the fixed demo merge table
(``BPE_DEMO_MERGES``) over every document of every test scale with an
INDEPENDENT pure-Python encoder — no Spark, no imports from the engine
under test — and writes one small parquet the oracle SQL joins against:

    (corpus_chars, doc_id, n_tokens)

``corpus_chars`` = SUM(n_chars) of the source corpus, the scale
discriminator (sf0.001 and sf0.01 both hold 500 docs but different
text, so COUNT(*) cannot tell them apart; their char totals differ).
The oracle filters ``WHERE corpus_chars = (SELECT SUM(n_chars) FROM
documents)``, so one static SQL string works at every scale the gate
runs.

Regenerate with ``python tools/gen_bpe_oracle_fixture.py`` if the demo
merge table or the driver test data ever changes; the output is
deterministic.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

# Must mirror hbase_bulkload_spark/queries/extensions.py BPE_DEMO_MERGES
# (asserted by tests/test_bpe.py::test_bpe_oracle_fixture_in_sync).
DEMO_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("in", "g"),
]

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    # local 10x scale-ups (tools/scale_up.py output, both modes),
    # covered when present so the sf1.0 gate runs get full oracles too
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1.0",
    ),
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1.0-density",
    ),
]

_FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)
OUT = os.path.join(_FIXDIR, "bpe_encode_ref.parquet")
OUT_MERGES = os.path.join(_FIXDIR, "bpe_merges_ref.parquet")

# Must mirror the n_merges q_bpe_merges registers (extensions.py).
N_MERGES = 8


def encode_len(text: str, merges: list[tuple[str, str]]) -> int:
    """Token count of greedy in-priority-order BPE replay (the same
    reference semantics tests/test_bpe.py pins against the engine)."""
    n = 0
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        n += len(syms)
    return n


def learn_merges(word_counts: dict[str, int], n_merges: int):
    """Independent pure-Python BPE merge learning — the reference
    semantics tests/test_bpe.py pins against the engine: whitespace
    words, per-step (count desc, pair asc) argmax, leftmost-first
    non-overlapping apply. Returns [(step, left, right, pair_count)]."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, c))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def main() -> None:
    corpus_chars: list[int] = []
    doc_ids: list[int] = []
    n_tokens: list[int] = []
    m_chars: list[int] = []
    m_step: list[int] = []
    m_left: list[str] = []
    m_right: list[str] = []
    m_count: list[int] = []
    seen_totals: dict[int, str] = {}
    for sf_dir in SF_DIRS:
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            print(f"skip {sf_dir} (absent)")
            continue
        rows = duckdb.sql(
            f"SELECT doc_id, text, SUM(n_chars) OVER () AS total "
            f"FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
        if not rows:
            # an existing-but-empty corpus has no total to key by (and
            # rows[0] below would IndexError); nothing to fixture
            print(f"skip {sf_dir} (empty documents.parquet)")
            continue
        wc: dict[str, int] = {}
        for doc_id, text, total in rows:
            corpus_chars.append(int(total))
            doc_ids.append(int(doc_id))
            n_tokens.append(encode_len(text, DEMO_MERGES))
            for w in text.split(" "):
                if w:
                    wc[w] = wc.get(w, 0) + 1
        total = int(rows[0][2])
        # corpus_chars is the fixture's ONLY join key: two corpora with
        # equal SUM(n_chars) would both match in the q_bpe_merges/
        # q_bpe_encode oracles and fail the gate with a confusing
        # row-count mismatch — refuse to write an ambiguous fixture
        if total in seen_totals:
            raise SystemExit(
                f"corpus_chars collision: {sf_dir} and "
                f"{seen_totals[total]} both total {total} chars; the "
                "fixture key cannot discriminate them"
            )
        seen_totals[total] = sf_dir
        for step, a, b, c in learn_merges(wc, N_MERGES):
            m_chars.append(total)
            m_step.append(step)
            m_left.append(a)
            m_right.append(b)
            m_count.append(c)
    table = pa.table(
        {
            "corpus_chars": pa.array(corpus_chars, pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows, "
          f"{len(set(corpus_chars))} corpora")
    mtable = pa.table(
        {
            "corpus_chars": pa.array(m_chars, pa.int64()),
            "step": pa.array(m_step, pa.int32()),
            "left": pa.array(m_left, pa.string()),
            "right": pa.array(m_right, pa.string()),
            "pair_count": pa.array(m_count, pa.int64()),
        }
    )
    pq.write_table(mtable, OUT_MERGES, compression="zstd")
    print(f"wrote {OUT_MERGES}: {mtable.num_rows} rows, "
          f"{len(set(m_chars))} corpora")


if __name__ == "__main__":
    main()
