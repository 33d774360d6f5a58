"""Text analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting — all single-pass column expressions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram-free heuristic; chosen to be
# expressible as one word-boundary regex per language in both Spark and
# ANSI SQL engines
LANGUAGE_MARKERS: Dict[str, str] = {
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine)\b",
    "en": r"\b(the|and|of|to|is|in|that|it|for)\b",
    "es": r"\b(el|la|los|las|de|que|y|en|es|un|una)\b",
    "fr": r"\b(le|la|les|et|de|des|que|est|un|une)\b",
    "zh": r"[一-鿿]",
}


def token_count_whitespace(text: Column) -> Column:
    """Whitespace tokens (empty strings dropped)."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))


def token_count_regex(text: Column, pattern: str = r"\w+|[^\w\s]") -> Column:
    """BPE-ish pre-tokenizer count: words plus standalone punctuation."""
    return F.regexp_count(text, F.lit(pattern))


def language_id(df: DataFrame, text_col: str,
                output_col: str = "lang_pred") -> DataFrame:
    """Deterministic marker-count argmax with alphabetical tie-break."""
    counts = {lang: F.regexp_count(F.col(text_col), F.lit(pat))
              for lang, pat in LANGUAGE_MARKERS.items()}
    langs = sorted(counts)  # alphabetical tie-break: first max wins
    best_lang = F.lit(langs[0])
    best_count = counts[langs[0]]
    for lang in langs[1:]:
        is_better = counts[lang] > best_count
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_count = F.when(is_better, counts[lang]).otherwise(best_count)
    pred = F.when(best_count > 0, best_lang).otherwise(F.lit("unknown"))
    return df.withColumn(output_col, pred)


def text_quality(df: DataFrame, text_col: str) -> DataFrame:
    """Quality-signal columns: length, token counts, punctuation ratio,
    stopword ratio, mean token length, distinct-token ratio — one
    projection, no UDFs."""
    text = F.col(text_col)
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    n_stop = F.regexp_count(F.lower(text), F.lit(LANGUAGE_MARKERS["en"]))
    distinct_ratio = (F.size(F.array_distinct(toks)) /
                      F.greatest(n_tokens, F.lit(1)))
    mean_token_len = ((n_chars - (n_tokens - 1)) /
                      F.greatest(n_tokens, F.lit(1)))
    return (df
            .withColumn("q_n_chars", n_chars)
            .withColumn("q_n_tokens", n_tokens)
            .withColumn("q_punct_ratio",
                        n_punct / F.greatest(n_chars, F.lit(1)))
            .withColumn("q_stopword_ratio",
                        n_stop / F.greatest(n_tokens, F.lit(1)))
            .withColumn("q_mean_token_len", mean_token_len)
            .withColumn("q_distinct_ratio", distinct_ratio))


# PII patterns for training-data scrubbing — ordered so that broader
# patterns (email, card) are redacted before their substrings could match
# narrower ones; every pattern is valid in both Java regex and RE2, so
# DuckDB oracles replay them verbatim
PII_PATTERNS: "Dict[str, str]" = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(df: DataFrame, text_col: str,
               kinds: Optional[Sequence[str]] = None,
               prefix: str = "pii_") -> DataFrame:
    """One count column per PII kind (``pii_email``, ``pii_ssn``, …) in a
    single projection — regexp_count stays JVM-side, no shuffle."""
    out = df
    for kind in (kinds or PII_PATTERNS):
        out = out.withColumn(prefix + kind,
                             F.regexp_count(F.col(text_col),
                                            F.lit(PII_PATTERNS[kind])))
    return out


def redact_pii(text: Column, replacement: str = "[PII]",
               kinds: Optional[Sequence[str]] = None) -> Column:
    """Replace every PII match with ``replacement`` — a chained
    regexp_replace projection (Spark replaces globally by default; a
    DuckDB oracle needs the 'g' flag). Order follows PII_PATTERNS so
    emails/cards are consumed before their digit-substrings can match
    narrower patterns."""
    out = text
    for kind in (kinds or PII_PATTERNS):
        out = F.regexp_replace(out, F.lit(PII_PATTERNS[kind]),
                               F.lit(replacement))
    return out


def fingerprint(text: Column, normalize: bool = True) -> Column:
    """64-bit content fingerprint (xxhash64 of the normalized text) —
    the exact-dedup key at scale (hash-groupBy instead of comparing
    full documents)."""
    norm = text
    if normalize:
        norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(norm)
