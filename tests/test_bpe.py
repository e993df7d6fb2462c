"""Distributed BPE merge learning must equal an independent pure-Python
reference exactly — merge list (order, pairs, counts) — on crafted and
corpus data. The reference re-implements greedy weighted BPE from the
published algorithm (count adjacent pairs over the word vocabulary,
merge the (count desc, pair asc) argmax, leftmost-first apply)."""

from __future__ import annotations

from collections import Counter

from hbase_bulkload_spark.operators.bpe import learn_bpe


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, c))
        new_vocab = {}
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


def _word_counts(rows):
    wc = Counter()
    for _id, text in rows:
        for w in text.split(" "):
            if w:
                wc[w] += 1
    return wc


def test_bpe_crafted_overlaps(spark):
    """Overlapping-run semantics: 'aaaa' under merge (a,a) must become
    ['aa','aa'] (leftmost-first, non-overlapping), and ties must break
    lexicographically."""
    rows = [(1, "aaaa aaaa abab"), (2, "abab cd cd")]
    got = [
        (r.step, r.left, r.right, r.pair_count)
        for r in learn_bpe(
            spark.createDataFrame(rows, "doc_id long, text string"), n_merges=4
        ).collect()
    ]
    want = _ref_bpe(_word_counts(rows), 4)
    assert got == want


def test_bpe_matches_reference_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r.step, r.left, r.right, r.pair_count)
        for r in learn_bpe(docs, n_merges=8).collect()
    ]
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    want = _ref_bpe(_word_counts(rows), 8)
    assert got == want
    assert len(got) == 8


def test_bpe_property_random_corpora(spark):
    """Hypothesis-driven: on random tiny-alphabet corpora the
    distributed merge list equals the reference exactly. Cases share
    one Spark session; each case runs its own learn_bpe (the loop is
    driver-coordinated, so cases cannot be batched into one frame)."""
    from hypothesis import given, settings, strategies as st

    cases: list[list[str]] = []
    word = st.text(alphabet="ab", min_size=1, max_size=5)
    doc = st.lists(word, min_size=1, max_size=6).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=3))
    def collect(docs):
        cases.append(docs)

    collect()

    for ci, docs in enumerate(cases[:6]):
        rows = [(i, t) for i, t in enumerate(docs)]
        got = [
            (r.step, r.left, r.right, r.pair_count)
            for r in learn_bpe(
                spark.createDataFrame(rows, "doc_id long, text string"),
                n_merges=3,
            ).collect()
        ]
        want = _ref_bpe(_word_counts(rows), 3)
        assert got == want, (ci, docs, got, want)


def _ref_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    out_tokens = []
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
        out_tokens += syms
    return out_tokens


def test_bpe_encode_matches_reference(spark, sf_dir):
    """Tokenizer APPLY: the distributed encode must reproduce the
    pure-Python replay of the learned merges word-for-word, and token
    concatenation must recover each doc's text (lossless)."""
    from hbase_bulkload_spark.operators.bpe import bpe_encode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(100)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    merges_df = learn_bpe(docs, n_merges=8)
    mlist = [(r.left, r.right) for r in merges_df.orderBy("step").collect()]
    got = {r.doc_id: (list(r.tokens), r.n_tokens) for r in bpe_encode(docs, merges_df).collect()}
    assert len(got) == len(rows)
    for doc_id, text in rows:
        want = _ref_encode(text, mlist)
        assert got[doc_id][0] == want, doc_id
        assert got[doc_id][1] == len(want)
        assert "".join(got[doc_id][0]) == text.replace(" ", "")


def test_bpe_encode_crafted(spark):
    """'aaaa' under merges [(a,a),(aa,aa)] → ['aaaa']; leftmost rule on
    'aaa' → ['aa','a']."""
    from hbase_bulkload_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "aaaa aaa ab")], "doc_id long, text string"
    )
    out = bpe_encode(docs, [("a", "a"), ("aa", "aa")]).collect()[0]
    assert list(out.tokens) == ["aaaa", "aa", "a", "a", "b"]
    assert out.n_tokens == 5


def test_bpe_oracle_fixture_in_sync(spark, sf_dir):
    """The committed q_bpe_encode oracle fixture
    (tests/fixtures/bpe_encode_ref.parquet) must stay in sync with the
    query: same merge table as BPE_DEMO_MERGES, and per-doc counts for
    this sf_dir's corpus equal to a fresh _ref_encode replay."""
    import duckdb

    from hbase_bulkload_spark.queries.extensions import BPE_DEMO_MERGES
    from tools.gen_bpe_oracle_fixture import DEMO_MERGES, OUT

    assert DEMO_MERGES == list(BPE_DEMO_MERGES)

    docs = duckdb.sql(
        f"SELECT doc_id, text, SUM(n_chars) OVER () AS total "
        f"FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    total = docs[0][2]
    fix = dict(
        duckdb.sql(
            f"SELECT doc_id, n_tokens FROM read_parquet('{OUT}') "
            f"WHERE corpus_chars = {total}"
        ).fetchall()
    )
    assert len(fix) == len(docs)
    for doc_id, text, _ in docs:
        assert fix[doc_id] == len(_ref_encode(text, list(BPE_DEMO_MERGES))), doc_id
