"""Text-analysis functions for LLM training-data pipelines.

All pure JVM column expressions (no Python UDFs): tokenization, token
counting (whitespace + BPE-ish regex), quality scoring, language ID by
stopword voting, and portable document fingerprints. Each has an exact
DuckDB-SQL twin (registered in registry.py) because every expression
sticks to functions both engines implement with identical semantics.

The portable 60-bit hash ``int(md5(s)[:15], 16)`` is the foundation
for fingerprints, MinHash, and SimHash (see dedup/): md5 is
byte-stable everywhere, and 15 hex digits (60 bits) fit a signed int64
in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small per-language stopword lists for the language-ID heuristic.
#: Deliberately tiny and embedded verbatim in the oracle SQL too.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}

#: BPE-ish token pattern: word pieces, digits, or single punctuation.
#: Kept to portable regex constructs (same meaning in Java regex and
#: RE2/PCRE): no lookarounds, no \p classes.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def portable_hash60(col: Column) -> Column:
    """Deterministic 60-bit hash of a string, identical in Spark,
    DuckDB and Python (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def ws_tokens(col: Column) -> Column:
    """Whitespace tokenization (empty strings removed)."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def ws_token_count(col: Column) -> Column:
    return F.size(ws_tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish regex tokens (a cheap, library-free stand-in
    for a real tokenizer's token count)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), 0))


def stopword_hits(
    col: Column, lang: str = "en", ltoks: Column | None = None
) -> Column:
    """Number of tokens that are stopwords of ``lang`` (with
    multiplicity). Pass ``ltoks`` (a PROJECTED lowercased-token array
    column) on hot paths — inlining re-lowercases and re-splits the
    text once per consumer (language_id alone has 4)."""
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    if ltoks is None:
        ltoks = ws_tokens(F.lower(col))
    return F.size(F.filter(ltoks, lambda t: F.array_contains(stops, t)))


def punct_count(col: Column) -> Column:
    """Number of non-alphanumeric, non-space characters."""
    return F.length(F.regexp_replace(col, "[A-Za-z0-9 ]", ""))


def quality_score(
    col: Column,
    toks: Column | None = None,
    ltoks: Column | None = None,
) -> Column:
    """Composite quality score in [0, 1] from cheap signals:

    - length_score: saturating n_chars / 400
    - word_score: saturating word count / 60
    - stopword_score: saturating en-stopword ratio * 8
    - punct_penalty: punctuation density

    score = 0.3*length + 0.3*words + 0.3*stopwords + 0.1*(1 - punct)

    The exact formula matters less than determinism: every term is
    double arithmetic both engines evaluate identically. ``toks`` /
    ``ltoks`` take pre-projected token arrays so pipelines computing
    several signals tokenize once (values are identical either way).
    """
    n_chars = F.length(col).cast("double")
    n_words = (
        F.size(toks) if toks is not None else ws_token_count(col)
    ).cast("double")
    stop_ratio = F.when(
        n_words > 0,
        stopword_hits(col, "en", ltoks=ltoks).cast("double") / n_words,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, punct_count(col).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    length_score = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    word_score = F.least(n_words / F.lit(60.0), F.lit(1.0))
    stop_score = F.least(stop_ratio * F.lit(8.0), F.lit(1.0))
    return (
        F.lit(0.3) * length_score
        + F.lit(0.3) * word_score
        + F.lit(0.3) * stop_score
        + F.lit(0.1) * (F.lit(1.0) - punct_ratio)
    )


def language_scores(
    col: Column, ltoks: Column | None = None
) -> dict[str, Column]:
    """Stopword-vote score per language."""
    return {
        lang: stopword_hits(col, lang, ltoks=ltoks)
        for lang in LANG_STOPWORDS
    }


def language_id(col: Column, ltoks: Column | None = None) -> Column:
    """Pick the language with the most stopword hits; ties resolve in
    the fixed key order of LANG_STOPWORDS; all-zero scores -> 'und'.
    ``ltoks``: see :func:`stopword_hits`."""
    scores = language_scores(col, ltoks=ltoks)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    # build the CASE from the last language backwards so earlier
    # languages win ties
    for lang in reversed(langs):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            expr
        )
        # reorder: when() chains evaluate first-match; constructing in
        # reverse and nesting otherwise() gives first-key-wins
    return expr


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Word n-grams (space-joined) from an ALREADY-TOKENIZED array
    column — no explode, no UDF; empty array below ``n`` tokens.

    Pass a *projected column* (``.select(ws_tokens(...).alias("toks"))``
    first), not the tokenizer expression itself: the lambda references
    the token array 3n times per row, and higher-order-function lambdas
    get no common-subexpression elimination — inlining the tokenizer
    re-splits the string once per referenced element (measured 20x
    slower on the fixture corpus)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.expr("CAST(array() AS ARRAY<STRING>)")
    )


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Word n-grams straight from a text column. Convenience for small
    inputs/tests; hot paths should project ``ws_tokens`` once and use
    :func:`ngrams_from_tokens` (see its docstring for why)."""
    return ngrams_from_tokens(ws_tokens(col), n)


def repetition_from_grams(grams: Column) -> Column:
    """Fraction of repeated n-grams in a projected gram-array column
    (0 when empty) — the Gopher-style boilerplate/repetition quality
    signal: spammy or templated documents repeat phrases, natural text
    rarely does."""
    total = F.size(grams).cast("double")
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
    ).otherwise(F.lit(0.0))


def repetition_ratio(col: Column, n: int = 3) -> Column:
    """Repetition signal straight from text (convenience form; hot
    paths project the grams once — see :func:`ngrams_from_tokens`)."""
    return repetition_from_grams(word_ngrams(col, n))


def doc_fingerprint(col: Column) -> Column:
    """Whole-document fingerprint: portable 60-bit hash of the
    whitespace-normalized, lowercased text (format-insensitive exact
    dedup key)."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), " +", " ")
    return portable_hash60(normalized)
