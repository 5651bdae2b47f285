"""Text-analysis column builders (north-star training-data operators).

All pure column algebra — JVM-side, codegen'd, no Python workers — so
they run at full scan speed over a 100 TB `documents` table. Each has a
matching ANSI-SQL oracle in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word/number/punctuation tokenizer: runs of letters, runs of
# digits, or single non-space punctuation — a deterministic, regex-only
# stand-in for a learned BPE vocabulary.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(c: Column | str) -> Column:
    """Number of whitespace-separated tokens; 0 for empty/blank text."""
    t = F.trim(_col(c))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, TOKEN_SPLIT_RE)))


def bpe_ish_token_count(c: Column | str) -> Column:
    """Count of BPE-ish tokens (letter runs / digit runs / punct chars)."""
    return F.size(F.regexp_extract_all(_col(c), F.lit(BPE_ISH_RE), F.lit(0)))


def char_count(c: Column | str) -> Column:
    return F.length(_col(c))


def punct_ratio(c: Column | str) -> Column:
    """Share of non-alphanumeric, non-space characters."""
    c = _col(c)
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(n_punct / F.length(c))


# Tiny per-language stopword lists: enough signal for an n-gram-free
# heuristic language ID over short documents. Public common words only.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "zu"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em", "um", "para"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我", "他", "这"],
}


def stopword_hit_count(c: Column | str, lang: str) -> Column:
    """Count tokens (with multiplicity) that are ``lang`` stopwords."""
    tokens = F.split(F.lower(F.trim(_col(c))), TOKEN_SPLIT_RE)
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(words, t)))


def language_id(c: Column | str, langs: list[str] | None = None) -> Column:
    """Heuristic language ID: argmax of stopword hit counts.

    Ties break by list order ('und' when nothing matches). Designed as
    one pass of column algebra — no UDF, no shuffle.
    """
    langs = langs or list(STOPWORDS)
    counts = [stopword_hit_count(c, lang) for lang in langs]
    best = F.greatest(*counts) if len(counts) > 1 else counts[0]
    expr = F.lit("und")
    # Build reversed so earlier langs win ties.
    for lang, cnt in reversed(list(zip(langs, counts))):
        expr = F.when((cnt == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(c: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1].

    Blend of: length sweet-spot (50..5000 chars), low punctuation ratio,
    and mean-word-length sanity (3..12 chars). Mirrors the usual
    pretraining-corpus quality filters; deterministic and SQL-matchable.
    """
    c = _col(c)
    n = F.length(c)
    len_ok = F.when((n >= 50) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(c) < 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    ntok = whitespace_token_count(c)
    mean_word = F.when(ntok > 0, n.cast("double") / ntok).otherwise(F.lit(0.0))
    word_ok = F.when((mean_word >= 3.0) & (mean_word <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + word_ok) / F.lit(3.0)


def quality_score_int3(c: Column | str) -> Column:
    """:func:`quality_score` at its EXACT integer grain — the 0..3
    indicator sum, never divided by 3 (r11 lint: consumers that
    threshold on the score were rounding ``score * 3`` back to an
    integer to undo the float division; this emits the integer
    directly). Same three indicators, bit-portable to the SQL twins'
    CASE sums."""
    c = _col(c)
    n = F.length(c)
    len_ok = F.when((n >= 50) & (n <= 5000), F.lit(1)).otherwise(F.lit(0))
    punct_ok = F.when(punct_ratio(c) < 0.2, F.lit(1)).otherwise(F.lit(0))
    ntok = whitespace_token_count(c)
    mean_word = F.when(ntok > 0, n.cast("double") / ntok).otherwise(F.lit(0.0))
    word_ok = F.when((mean_word >= 3.0) & (mean_word <= 12.0), F.lit(1)).otherwise(F.lit(0))
    return (len_ok + punct_ok + word_ok).cast("int")


# PII patterns kept RE2-compatible (no lookarounds) so the same regex
# runs on Spark (Java regex) and SQL oracles alike.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_CPF_RE = r"\d{3}\.\d{3}\.\d{3}-\d{2}"
PII_PHONE_RE = r"\+?\d[\d()/ .-]{7,}\d"


def pii_scrub(c: Column | str) -> Column:
    """Mask emails, CPF-format ids, and phone-like digit runs.

    Training-corpus hygiene pass: order matters (CPF before the generic
    phone pattern, or the phone rule would eat the CPF's digit run).
    Pure column expressions — codegen'd, shuffle-free, scale-linear.
    """
    out = F.regexp_replace(_col(c), PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_CPF_RE, "<CPF>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def fingerprint64(c: Column | str) -> Column:
    """64-bit content fingerprint of normalized text (xxhash64).

    Normalization: lowercase, collapse whitespace runs, trim — so
    near-identical formatting hashes identically (exact-dup detection).
    """
    norm = F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " "))
    return F.xxhash64(norm)


def token_set_fingerprint(c: Column | str) -> Column:
    """Canonical bag-of-words fingerprint: md5 over the space-joined
    SORTED DISTINCT token list of the normalized text.

    Catches reorderings and repetition-only edits that byte-level
    fingerprints miss (the dominant template-dup shape in crawled
    corpora) while staying pure column algebra AND portable SQL — the
    DuckDB oracle reproduces it with list_sort(list_distinct(...)):
    plain lexicographic string sort on both engines.
    """
    tokens = F.split(F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " ")), " ")
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens)), " "))


def rolling_fingerprint(c: Column | str, base: int = 31, mod: int = 2147483647) -> Column:
    """Polynomial rolling-hash fingerprint of the normalized text.

    h = fold(chars, 0, (acc, ch) -> (acc*base + codepoint(ch)) mod P)
    with P = 2^31-1: every intermediate stays < 2^36, so the arithmetic
    is ANSI-overflow-safe — and, unlike xxhash64, the recurrence is
    portable SQL (the DuckDB oracle reproduces it bit-for-bit with
    list_reduce). Use fingerprint64 when speed matters more than
    cross-engine portability.
    """
    norm = F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " "))
    return F.aggregate(
        F.split(norm, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * F.lit(base) + F.ascii(ch), F.lit(mod)),
    )


def shingles(c: Column | str, k: int = 3) -> Column:
    """Array of k-word shingles (token n-grams) of the normalized text.

    Built as a k−1-deep ``zip_with`` chain over the token array and its
    shifted slices — pure column algebra, no UDF. Empty array when
    fewer than k tokens (the final slice trims the partial tail that
    ``concat_ws``'s NULL-skipping leaves on the shorter zip side).

    Why zip_with and not transform-over-index (r10, measured 7x on the
    documents table): a lambda like ``transform(idx, i ->
    array_join(slice(tokens, i, k)))`` re-evaluates the non-cheap
    ``tokens`` split expression PER ELEMENT when callers inline
    ``shingles(text)`` into a single projection — O(tokens²) work per
    document. The zip_with chain references ``tokens`` only ~k times
    PER ROW, so every inline caller (minhash, jaccard joins, span and
    corpus shapes) gets the linear form without restructuring.

    NULL input returns an EMPTY ARRAY, not NULL (ADVICE r11): split
    propagates NULL through zip_with/slice, which would silently turn
    size-of-shingles consumers (e.g. ngram_jaccard_pairs' ``__n``)
    NULL instead of 0 — the coalesce restores the documented contract
    the pre-r10 when/otherwise form had.
    """
    tokens = F.split(F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " ")), " ")
    n = F.size(tokens)
    acc = tokens
    for j in range(1, k):
        acc = F.zip_with(
            acc,
            F.slice(tokens, j + 1, F.greatest(n - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.coalesce(
        F.slice(acc, 1, F.greatest(n - F.lit(k - 1), F.lit(0))),
        F.array().cast("array<string>"),
    )
