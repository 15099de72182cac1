"""Text-analysis operators for training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` where
possible (whole-stage codegen; zero Python in the hot path) and has an exact
ANSI-SQL oracle; only language-ID — inherently a model — drops to an
Arrow-vectorised pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
_STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "is", "was", "for", "that", "with"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "nicht"},
    "fr": {"le", "la", "les", "de", "et", "est", "dans", "pour", "que", "une"},
    "es": {"el", "la", "los", "de", "y", "es", "en", "para", "que", "una"},
    "pt": {"o", "a", "os", "de", "e", "é", "em", "para", "que", "uma"},
    "ru": {"и", "в", "не", "на", "что", "это", "с", "как", "по", "из"},
    "zh": set("的一是不了人我在有他"),
    "ja": set("のにはをたがでてとし"),
}


def token_count(col: Column) -> Column:
    """Whitespace token count.  Value-identical to
    ``size(split(trim(col), '\\s+'))`` but computed as
    ``regexp_count + 1``: split materialises an array of UTF8String slices
    per row, and at 32 concurrent tasks that allocation rate made the
    combined feature pass GC-bound (measured 2.1x slower and *negatively*
    scaling 8->32 cores vs the count form)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.regexp_count(trimmed, F.lit(r"\s+")) + 1
    )


def char_count(col: Column) -> Column:
    return F.length(col)


# Exactly Java regex \s: [ \t\n\x0B\f\r].  Single-character-class counts are
# done with translate() below — one char-map pass per row instead of a
# java.util.regex scan, same value (the oracle keeps the regexp form).
_WS_CHARS = " \t\n\x0b\x0c\r"


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are sentence punctuation (translate-based
    count: one char-map pass, no regex engine; same value as
    ``regexp_count(col, '[.,!?;:]')``)."""
    punct = F.length(col) - F.length(F.translate(col, ".,!?;:", ""))
    return punct / F.greatest(F.length(col), F.lit(1))


def mean_token_length(col: Column) -> Column:
    # Length of the whitespace-stripped copy, via one translate pass — the
    # value regexp_count(trimmed, '\s') subtraction gave, without the regex.
    trimmed = F.trim(col)
    compact_len = F.length(F.translate(trimmed, _WS_CHARS, ""))
    return compact_len / F.greatest(token_count(col), F.lit(1))


def quality_score(col: Column) -> Column:
    """A deterministic [0,1] quality heuristic: length saturation x
    punctuation sanity x plausible word length.  Every term is plain column
    algebra, so the whole score stays inside whole-stage codegen."""
    length_term = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(4.0), F.lit(1.0))
    mtl = mean_token_length(col)
    word_term = F.when((mtl >= 2.5) & (mtl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(length_term * punct_term * word_term, 6)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalised lowercase text
    (md5 is identical in Spark and DuckDB, so the oracle is exact)."""
    # Collapse runs first, then trim: trim() strips only 0x20, so tabs and
    # newlines must become spaces before trimming (same order in the oracle).
    normalized = F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))
    return F.md5(normalized)


def language_id_batch(texts: pd.Series) -> pd.Series:
    """Stopword-profile language guesser — reference semantics in plain
    Python (kept as the differential-test oracle for ``language_id``)."""
    langs = list(_STOPWORDS)
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        words = set((t or "").lower().split())
        chars = set(t or "")
        best, best_score = "en", -1
        for lang in langs:
            profile = _STOPWORDS[lang]
            if lang in ("zh", "ja"):
                score = len(chars & profile)
            else:
                score = len(words & profile)
            if score > best_score:
                best, best_score = lang, score
        out[i] = best
    return pd.Series(out)


def _lang_score_columns(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts as pure column algebra: membership
    count = sum of per-term containment bits (10 terms x 8 languages, all
    inside whole-stage codegen — no Python, no UDF)."""
    safe = F.coalesce(col, F.lit(""))
    words = F.split(F.lower(F.trim(safe)), r"\s+")
    scores: dict[str, Column] = {}
    for lang, profile in _STOPWORDS.items():
        if lang in ("zh", "ja"):
            terms = [F.contains(safe, F.lit(ch)).cast("int") for ch in sorted(profile)]
        else:
            terms = [F.array_contains(words, w).cast("int") for w in sorted(profile)]
        total = terms[0]
        for term in terms[1:]:
            total = total + term
        scores[lang] = total
    return scores


def language_id(col: Column) -> Column:
    """Stopword-profile language guesser, fully JVM-side.  Tie-break mirrors
    the reference loop: ``array_position`` finds the FIRST language (in
    ``_STOPWORDS`` order) reaching the maximum score.  (The equivalent
    when-chain form repeats every score sub-tree per branch and overflows
    janino's codegen limits, forcing interpreted fallback.)"""
    scores = _lang_score_columns(col)
    langs = list(_STOPWORDS)
    score_arr = F.array(*[scores[lang] for lang in langs])
    idx = F.array_position(score_arr, F.array_max(score_arr))
    return F.element_at(F.array(*[F.lit(lang) for lang in langs]), idx.cast("int"))


def language_id_sql(col: str = "text") -> str:
    """DuckDB oracle expression mirroring ``language_id`` term-for-term."""
    safe = f"coalesce({col}, '')"
    words = f"regexp_split_to_array(lower(trim({safe})), '\\s+')"
    score_exprs = {}
    for lang, profile in _STOPWORDS.items():
        if lang in ("zh", "ja"):
            terms = [
                f"CASE WHEN contains({safe}, '{ch}') THEN 1 ELSE 0 END"
                for ch in sorted(profile)
            ]
        else:
            terms = [
                f"CASE WHEN list_contains({words}, '{w}') THEN 1 ELSE 0 END"
                for w in sorted(profile)
            ]
        score_exprs[lang] = "(" + " + ".join(terms) + ")"
    best = "greatest(" + ", ".join(score_exprs.values()) + ")"
    whens = " ".join(
        f"WHEN {expr} = {best} THEN '{lang}'" for lang, expr in score_exprs.items()
    )
    return f"CASE {whens} ELSE 'en' END"


def token_count_sql(col: str = "text") -> str:
    """DuckDB oracle expression for token_count."""
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({col}), '\\s+')) END"
    )


def quality_score_sql(col: str = "text") -> str:
    tokens = token_count_sql(col)
    punct = (
        f"(length({col}) - length(regexp_replace({col}, '[.,!?;:]', '', 'g')))"
        f" / greatest(length({col}), 1)"
    )
    mtl = (
        f"length(regexp_replace(trim({col}), '\\s+', '', 'g'))"
        f" / greatest({tokens}, 1)"
    )
    return (
        f"round(least(({tokens}) / 100.0, 1.0)"
        f" * (1.0 - least(({punct}) * 4.0, 1.0))"
        f" * (CASE WHEN ({mtl}) >= 2.5 AND ({mtl}) <= 12.0 THEN 1.0 ELSE 0.5 END), 6)"
    )


def fingerprint_sql(col: str = "text") -> str:
    return f"md5(lower(trim(regexp_replace({col}, '\\s+', ' ', 'g'))))"


# -- PII redaction ------------------------------------------------------------

# Deliberately simple, auditable patterns (the public regexes every crawl
# pipeline starts from); each replacement tag is greppable downstream.
_PII_PATTERNS = (
    # local@domain.tld — conservative: requires a dot in the domain.
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IPv4 dotted quads.
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # International-ish phone numbers: 7+ digits with separators, optional +CC.
    (r"\+?\d[\d\s().-]{6,}\d", "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Replace emails, IPv4 addresses, and phone-number-shaped digit runs
    with greppable tags — pure JVM ``regexp_replace`` chain (order matters:
    emails first so their digits never half-match the phone pattern).
    The patterns are the standard first-pass public ones: auditable and
    cheap, not an NER system; swap in a model-based pass downstream where
    recall matters more than throughput."""
    out = col
    for pattern, tag in _PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_counts(col: Column) -> Column:
    """struct(n_email, n_ip, n_phone) found in the text (pre-redaction
    counts, for corpus auditing) — counted by length delta of a tagged
    rewrite, no Python.  Patterns apply SEQUENTIALLY (same order as
    ``redact_pii``), so an IP's digits are never double-counted as a
    phone number."""
    counts = []
    current = col
    for pattern, tag in _PII_PATTERNS:
        # Count the MATCHES, not the tags: the delta between replacing
        # matches with the tag vs with nothing is n * len(tag) exactly, and
        # a literal tag string already present in the source text cancels
        # out (it appears identically in both rewrites).
        tagged = F.regexp_replace(current, pattern, tag)
        stripped = F.regexp_replace(current, pattern, "")
        counts.append(
            ((F.length(tagged) - F.length(stripped)) / F.lit(len(tag)))
            .cast("long")
        )
        current = tagged
    return F.struct(counts[0].alias("n_email"), counts[1].alias("n_ip"),
                    counts[2].alias("n_phone"))
