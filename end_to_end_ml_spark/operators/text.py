"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All JVM-side expressions (split/regexp/array functions) — no Python in the
hot path, so these run at full whole-stage-codegen speed over a 100 TB
corpus. Each narrow transformation fuses with the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny stopword lists for the n-gram/stopword language heuristic. Deliberately
# small + deterministic (this is a heuristic operator, not a model).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "de": ["der", "die", "und", "das", "in", "von", "zu", "mit", "ist", "den"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "que"],
}

# BPE-ish pre-tokenizer: word pieces, digit runs, single punctuation marks.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text_col):
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(t), r"\s+")


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    return df.select(
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: length, word count, punctuation ratio,
    mean word length, stopword ratio (en), alpha ratio. Single narrow pass."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    toks = tokens(text_col)
    n_words = F.size(toks).cast("long")
    non_punct = F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))
    n_punct = (n_chars - non_punct).cast("long")
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("long")
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(en_stop, F.lower(x))))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (n_punct / n_chars).alias("punct_ratio"),
        (n_alpha / n_chars).alias("alpha_ratio"),
        ((n_chars - (n_words - 1)) / n_words).alias("mean_word_len"),
        (n_stop / n_words).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-overlap language heuristic: score = |distinct tokens ∩
    stopwords(lang)|; predict argmax with deterministic lexicographic
    tie-break ('und' = undetermined when no stopwords hit)."""
    toks = F.array_distinct(F.transform(tokens(text_col), F.lower))
    scores = [
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))
        ).alias(f"score_{lang}")
        for lang, ws in sorted(STOPWORDS.items())
    ]
    scored = df.select(F.col(id_col), *scores)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties → fold from the right
        pred = F.when((F.col(f"score_{lg}") == best) & (best > 0), F.lit(lg)).otherwise(pred)
    return scored.select(
        id_col, *[f"score_{lg}" for lg in langs], pred.alias("predicted_lang")
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprint after whitespace/case normalization — the
    standard near-exact-dup key (md5 so any engine can reproduce it)."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(normalized).alias("fingerprint"))
