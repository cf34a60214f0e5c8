"""Text analysis operators for training-data pipelines.

All hot-path expressions are JVM builtins (WholeStageCodegen) — no Python.
Ratio metrics are emitted as integer per-mille (floor(ratio*1000)) so DuckDB
oracles compare exactly (no float-sum order sensitivity).

Dialect notes (tested in Java regex + RE2 + Python re):
- token split: `\\s+` on trimmed text, empty -> 0 tokens
- "BPE-ish" token count: occurrences of `\\w+|[^\\w\\s]` (word runs +
  isolated punctuation), the classic pre-tokenizer shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]

_PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}]"
_BPE_PAT = r"\w+|[^\w\s]"


def tokens(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(col), r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def bpe_token_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(_BPE_PAT)).cast("bigint")


def _per_mille(num: Column, den: Column) -> Column:
    return F.when(den > 0, F.floor(num * 1000.0 / den)).otherwise(F.lit(0)).cast("bigint")


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / alpha ratios — the standard cheap
    quality signals for corpus filtering (C4/Gopher-style heuristics)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_chars = F.length(c).cast("bigint")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    punct = F.length(c) - F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(s) for s in EN_STOPWORDS]), F.lower(t)))
    )
    n_toks = F.size(toks)
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_toks.cast("bigint"),
            "alpha_pm": _per_mille(alpha, n_chars),
            "punct_pm": _per_mille(punct, n_chars),
            "stopword_pm": _per_mille(stop_hits, n_toks),
            "mean_token_len_pm": _per_mille(F.length(F.regexp_replace(c, r"\s+", "")), n_toks),
        }
    )


def lang_guess(col: Column) -> Column:
    """N-gram/stopword heuristic language id.

    Deterministic scoring over marker-token hits per language; 'und' when no
    marker hits. (A real model is out of scope; the operator contract is a
    per-row deterministic classification usable in filters/routes.)
    """
    markers = {
        "en": ["the", "and", "of", "is"],
        "es": ["el", "la", "los", "que", "y"],
        "de": ["der", "die", "das", "und", "ist"],
        "fr": ["le", "la", "les", "et", "est"],
    }
    toks = tokens(F.lower(col))
    scores = []
    for lang, ms in markers.items():
        arr = F.array(*[F.lit(m) for m in ms])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max by (hits, lang) — deterministic tiebreak on lang name; struct
    # comparison is lexicographic by field order
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased text
    (the cheap rolling-hash analog; exact-dup key)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))
