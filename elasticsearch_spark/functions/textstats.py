"""Text-analysis columns for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure JVM-side column expressions (whole-stage-codegen; no Python in the
hot path) so they hold up on 100 TB scans. Each has a DuckDB-expressible twin
used by the driver's oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# minimal stopword profiles per language for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "ein", "zu"],
}


def _word_hits(text: Column, words: list[str]) -> Column:
    """Count of tokens in `text` that belong to `words` (JVM-side)."""
    toks = F.split(F.lower(text), r"\s+")
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword-profile hits; 'und' if none."""
    c = F.col(text) if isinstance(text, str) else text
    scores = [(lang, _word_hits(c, ws)) for lang, ws in LANG_STOPWORDS.items()]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # deterministic tie-break: first language (in dict order) achieving the max
    for lang, s in reversed(scores):
        result = F.when((best_score > 0) & (s == best_score), F.lit(lang)).otherwise(result)
    return result


def whitespace_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.filter(F.split(c, r"\s+"), lambda t: t != ""))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish proxy: count of GPT-2-style pretoken pieces (word/number/punct runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(r"[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]+"), F.lit(0)))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\p{L}\p{N}\s]", ""))
    return (n_punct.cast("double") / F.greatest(F.length(c), F.lit(1))).alias("punct_ratio")


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    hits = _word_hits(c, LANG_STOPWORDS[lang])
    return hits.cast("double") / F.greatest(whitespace_token_count(c), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    healthy stopword presence (the usual pretraining-filter trio)."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = whitespace_token_count(c)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio(c) < 0.2, 1.0).otherwise(0.5)
    stop_ok = F.when(stopword_ratio(c) > 0.05, 1.0).otherwise(0.6)
    return ((len_ok + punct_ok + stop_ok) / F.lit(3.0)).cast("double")


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the token-normalized text
    (md5 exists in both Spark and DuckDB, so the oracle can reproduce it)."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.array_join(
        F.regexp_extract_all(F.lower(c), F.lit(r"[\p{L}\p{N}]+"), F.lit(0)), " "
    )
    return F.md5(normalized)
