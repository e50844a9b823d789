"""Text-analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All pure Catalyst column expressions
(JVM codegen, no UDF) so they survive 100 TB scans and push down cleanly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_PUNCT_CLASS = "[.,!?;:]"


def token_count(text_col):
    """Whitespace token count (split on single spaces, empty tokens kept —
    identical to DuckDB string_split semantics for oracle parity)."""
    return F.size(F.split(text_col, " "))


def word_token_count(text_col):
    """BPE-ish token estimate: words + digit runs + punctuation marks."""
    return F.size(F.regexp_extract_all(text_col, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)))


def punct_ratio(text_col):
    clean = F.regexp_replace(text_col, _PUNCT_CLASS, "")
    return (F.length(text_col) - F.length(clean)).cast("double") / F.length(text_col)


def stopword_hits(text_col):
    toks = F.split(F.lower(text_col), " ")
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def quality_score(text_col):
    """Heuristic quality score in [0,1]: length band + stopword presence -
    punctuation excess. Deterministic arithmetic only (oracle-parity)."""
    n = F.length(text_col).cast("double")
    length_term = F.least(n / F.lit(400.0), F.lit(1.0))
    stop_term = F.least(
        stopword_hits(text_col).cast("double") / F.greatest(token_count(text_col).cast("double"), F.lit(1.0)) * F.lit(5.0),
        F.lit(1.0),
    )
    punct_term = F.least(punct_ratio(text_col) * F.lit(5.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * length_term + F.lit(0.3) * stop_term + F.lit(0.2) * (F.lit(1.0) - punct_term),
        6,
    )


def doc_fingerprint(text_col, n_hex: int = 16):
    """Content fingerprint: first n_hex chars of md5 of the normalized text
    (lowercase, collapsed whitespace). Used as the exact-dedup key."""
    norm = F.regexp_replace(F.lower(text_col), r"\s+", " ")
    return F.substring(F.md5(norm), 1, n_hex)


# language-ID heuristic: per-language marker-token hit counts; prediction =
# argmax with deterministic tie-break on language code. With synthetic token
# soup this is feature plumbing, not linguistics — the operator shape
# (score columns + greatest/argmax) is what carries to real corpora.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
}


def _marker_counter(toks, markers):
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_scores(text_col):
    toks = F.split(F.lower(text_col), " ")
    return {lang: _marker_counter(toks, markers) for lang, markers in LANG_MARKERS.items()}
