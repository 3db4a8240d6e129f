"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token counting, quality scoring, language-ID heuristic,
document fingerprinting. All hot-path logic is built-in column
expressions (JVM-side, whole-stage codegen) — no Python UDFs.

These extend the reference's string surface (SURVEY.md §2.9 F1) to the
document-corpus domain; designed so one scan of a 100 TB `documents`
table computes every feature (no per-feature rescans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit
# heuristic. Deliberately small: the operator's shape (argmax of
# per-language hit ratios) is what matters; lists are swappable.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "de", "un", "una", "por", "con"],
}

PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text; empty text → []."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(F.lower(c))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("int")


def stopword_hits(toks: Column, lang: str) -> Column:
    """Count of tokens (with multiplicity) in the language's list."""
    lits = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass quality features: char/token counts, mean token length,
    punctuation ratio, English-stopword ratio, composite score."""
    toks = tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_toks = F.size(toks)
    no_punct = F.regexp_replace(F.col(text_col), PUNCT_CLASS, "")
    punct_ratio = F.when(n_chars > 0, (n_chars - F.length(no_punct)) / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_toks > 0, stopword_hits(toks, "en") / n_toks).otherwise(0.0)
    mean_tok_len = F.when(n_toks > 0, (F.length(F.concat_ws("", toks)) / n_toks)).otherwise(0.0)
    # Composite score in [0,1]-ish: long enough, low punctuation,
    # some stopwords (natural-language-ness).
    score = (
        F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
    )
    return df.select(
        "*",
        n_chars.cast("int").alias("q_n_chars"),
        n_toks.cast("int").alias("q_n_tokens"),
        F.round(mean_tok_len, 6).alias("q_mean_token_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stopword_ratio"),
        F.round(score, 6).alias("q_score"),
    )


def lang_id(col: Column | str) -> Column:
    """Stopword-hit language heuristic: argmax of per-language hit
    ratios with a deterministic precedence order; 'und' when nothing
    hits."""
    toks = tokens(col)
    n = F.size(toks)
    ratios = {
        lang: F.when(n > 0, stopword_hits(toks, lang) / n).otherwise(0.0)
        for lang in STOPWORDS
    }
    best = F.greatest(*ratios.values())
    out = F.when(best <= 0.0, F.lit("und"))
    for lang in STOPWORDS:  # insertion order = precedence on ties
        out = out.when(ratios[lang] == best, F.lit(lang))
    return out.otherwise(F.lit("und"))


def fingerprint_md5(col: Column | str) -> Column:
    """Normalization fingerprint: md5 of lowercased,
    whitespace-collapsed text — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def fingerprint_rolling(col: Column | str, prime: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over token crc32s (order-sensitive
    document fingerprint). Pure fold expression — no UDF."""
    toks = tokens(col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * base + F.crc32(t)) % prime,
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Sliding word n-grams as strings; fewer than n tokens → []."""
    toks = tokens(col)
    count = F.size(toks) - (n - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
