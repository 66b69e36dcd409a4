"""Text-analysis functions for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

All JVM-side Column expressions (whole-stage codegen) — these run over
every document of a 100 TB corpus, so no Python is allowed in the path.
Formulas are deliberately SQL-expressible so DuckDB oracles can replay
them bit-for-bit (rounded).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .tokenize import DEFAULT_TOKEN_PATTERN

#: tiny per-language stopword lists for the n-gram/stopword-ratio
#: language heuristic (public common-word lists)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "pas", "un", "une", "des", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "no", "un", "una", "que"),
}

PUNCT_PATTERN = r"[^a-zA-Z0-9\s]"


def tokens_of(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(DEFAULT_TOKEN_PATTERN), 0)


def token_count(text: Column) -> Column:
    """Whitespace/word-regex token count (int)."""
    return F.size(tokens_of(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy: word tokens + ceil(chars/4) for long words —
    approximates subword splitting without a vocab (JVM-side)."""
    toks = tokens_of(text)
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc
        + F.when(F.length(t) <= 4, F.lit(1)).otherwise(
            F.ceil(F.length(t) / F.lit(4.0)).cast("int")
        ),
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, PUNCT_PATTERN, ""))
    return F.when(n > 0, (n - stripped) / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    toks = tokens_of(text)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def mean_token_len(text: Column) -> Column:
    toks = tokens_of(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: rewards mid-length docs, low punctuation
    noise, dictionary-like token lengths. The weights are arbitrary but
    fixed — the operator contract is determinism, not linguistics."""
    n_toks = token_count(text)
    length_term = F.least(n_toks / F.lit(64.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    len_term = F.lit(1.0) - F.least(
        F.abs(mean_token_len(text) - F.lit(5.0)) / F.lit(5.0), F.lit(1.0)
    )
    return (0.4 * length_term + 0.3 * punct_term + 0.3 * len_term).cast("double")


def lang_id(text: Column) -> Column:
    """Stopword-ratio language heuristic: the language whose stopword list
    hits the most tokens; 'und' (undetermined) when nothing hits."""
    toks = tokens_of(text)
    scores = []
    for lang, words in LANG_STOPWORDS.items():
        stops = F.array(*[F.lit(s) for s in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(stops, t))).alias("n"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def content_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: sha256 over the sorted
    distinct token set. Robust to token reordering/duplication — the
    cheap cousin of the reference's Bloom exact-dup key, usable for
    bag-of-words-identical dedup."""
    toks = F.array_sort(F.array_distinct(tokens_of(text)))
    return F.sha2(F.array_join(toks, " "), 256)
