"""PII redaction operator (training-data scrubbing).

The reference's only sanitization primitive is the attributes processor's
``hash`` action (SHA-1 a sensitive value in place,
``processor/processorhelper/attraction.go:242-243`` + ``hasher.go:37-77``);
a corpus pipeline needs the free-text analog: find PII *inside* a text
column and replace it with a typed placeholder, keeping per-category match
counts for the obsreport-style metrics table.

All patterns are plain regular expressions valid and identical in Java
regex (Spark ``regexp_replace``/``regexp_count``), RE2 (DuckDB oracle,
Go), and Python ``re`` — no backreferences, no lookaround — so the oracle
is exact. Counts are taken against the ORIGINAL text per category, then
replacements applied sequentially in declaration order (email before the
number-shaped categories so e.g. digits inside a local-part are consumed
first; phone before SSN so the longer dashed shape wins).

Everything is JVM builtins — one projection, WholeStageCodegen, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (category, pattern, placeholder) — order matters; see module docstring.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # TPC-H style international phone: 2-3-3-4 dashed groups
    ("phone", r"\b\d{2}-\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def redact_col(col: Column) -> Column:
    """The redacted text: placeholders substituted in declaration order."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category match counts against the original text."""
    return {
        f"n_{cat}": F.regexp_count(col, F.lit(pat)).cast("bigint")
        for cat, pat, _ in PII_PATTERNS
    }


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Add ``out_col`` (scrubbed text) and ``n_<category>`` count columns.

    Single narrow projection — scales linearly with the scan; the regex
    work stays inside whole-stage codegen exactly like the filter
    processor's ``rlike`` matchers.
    """
    c = F.col(text_col)
    cols = dict(pii_counts(c))
    cols[out_col] = redact_col(c)
    return df.withColumns(cols)
