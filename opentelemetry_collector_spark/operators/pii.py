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


def k_anonymity_report(df: DataFrame, qi_cols: list[str], k: int = 5) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns (Sweeney 2002): one
    row per distinct QI combination with its population and an ``at_risk``
    flag when fewer than ``k`` rows share it — the privacy gate a corpus
    pipeline runs before release, structurally the group-size complement
    of :func:`redact_pii`'s in-text scrubbing (that removes direct
    identifiers; this measures re-identification risk from the columns
    that remain).

    One partial-aggregated groupBy over the QI tuple — per-task distinct
    combinations ship through the shuffle, never rows. NULL is a QI value
    like any other (SQL GROUP BY semantics — both engines agree).

    Returns (qi_cols..., n_rows, at_risk).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not qi_cols:
        raise ValueError("at least one quasi-identifier column is required")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).select(*qi_cols, "n_rows", (F.col("n_rows") < k).alias("at_risk"))


def suppress_quasi_identifiers(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """The destructive form of :func:`k_anonymity_report`: rows whose QI
    combination has fewer than ``k`` peers get every QI column NULLed
    (full-domain suppression into one generalized bucket), all other
    columns untouched — after which every surviving QI group trivially
    satisfies k-anonymity or is the suppressed bucket.

    Physical shape: the at-risk QI set (small — it only holds rare
    combinations) joins back onto the corpus as a LEFT join on the QI
    tuple; AQE broadcasts it when it fits, so the 100 TB side is never
    shuffled. Row count is preserved exactly.
    """
    risky = (
        k_anonymity_report(df, qi_cols, k)
        .filter(F.col("at_risk"))
        .select(
            *[F.col(c).alias(f"_qi_{c}") for c in qi_cols],
            F.lit(True).alias("_suppress"),
        )
    )
    # null-safe join: a NULL QI value is a group member under GROUP BY, so
    # the join-back must match it too (plain equi-join would silently skip
    # NULL-keyed risky groups)
    cond = None
    for c in qi_cols:
        this = F.col(c).eqNullSafe(F.col(f"_qi_{c}"))
        cond = this if cond is None else cond & this
    out = df.join(risky, on=cond, how="left")
    keep = [c for c in df.columns if c not in qi_cols]
    masked = [
        F.when(F.col("_suppress").isNotNull(), F.lit(None)).otherwise(F.col(c)).alias(c)
        for c in qi_cols
    ]
    return out.select(*masked, *keep)
