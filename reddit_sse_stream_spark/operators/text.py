"""Text-analysis operators over the documents table (training-data pipeline
surface; SURVEY.md §2.8 north-star). Everything is built-in Column algebra —
no Python UDFs in the hot path — so it rides whole-stage codegen and scales
linearly with executors (no shuffle at all: every op is per-row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword markers for the n-gram language heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "que"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "zh": ("de", "shi", "le"),
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count. split(..., -1) semantics match ANSI
    string_split; empty string -> 1 empty token in both engines."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(col, r"\s+"))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish subword proxy: count alternating letter/digit/punct runs —
    a cheap deterministic stand-in for a real tokenizer's token count."""
    col = F.col(text) if isinstance(text, str) else text
    # one token per run of letters, digits, or single punctuation char
    return F.size(F.split(F.trim(col), r"(?<=[a-zA-Z0-9])(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9\s])(?=[a-zA-Z0-9])|\s+"))


def marker_hits(text: Column | str, marker: str) -> Column:
    """Occurrences of ' marker ' (space-delimited) — oracle-parity trick:
    (len(x) - len(replace(x, m, ''))) / len(m), identical in any SQL engine."""
    col = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    needle = f" {marker} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def _trunc4(c: Column) -> Column:
    """floor(x*1e4)/1e4 — cross-engine-stable 4-digit truncation. Spark's
    round() goes through the double's shortest DECIMAL repr (BigDecimal
    HALF_UP: 0.60124999..9 prints as '0.60125' -> 0.6013) while ANSI engines
    round the BINARY value (-> 0.6012); floor on the identical IEEE double
    gives the same answer everywhere."""
    return F.floor(c * 10000) / 10000.0


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic doc-quality features + composite score:
    length, word count, mean word length, alpha ratio, space ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = token_count(t)
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_actual"),
        n_words.alias("n_words"),
        _trunc4(alpha / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        _trunc4(spaces / F.greatest(n_chars, F.lit(1))).alias("space_ratio"),
        _trunc4(
            (alpha / F.greatest(n_chars, F.lit(1))) * F.least(n_words / 50.0, F.lit(1.0))
        ).alias("quality"),
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: stopword-marker hit counts per language; the
    argmax (ties -> lexicographically first lang) is the predicted language."""
    cols = [
        sum(
            (marker_hits(F.col(text_col), m) for m in markers),
            start=F.lit(0).cast("long"),
        ).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    return df.select("doc_id", *cols)


def fingerprint(text: Column | str, length: int = 16) -> Column:
    """Document fingerprint: truncated md5 of the case-folded,
    whitespace-normalized text (rolling-hash stand-in, deterministic)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.substring(F.md5(F.regexp_replace(F.lower(col), r"\s+", " ")), 1, length)
