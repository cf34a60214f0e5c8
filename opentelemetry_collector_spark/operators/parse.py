"""Parse stage: grok/regex field extraction from text columns.

The reference's extraction engine is the attributes processor's `extract`
action (``processor/processorhelper/attraction.go:181-204,265-285``): a regex
with all-named capture groups; each group becomes a new attribute. Here the
hot path extracts to **flat columns** (columnar, codegen-friendly); the
attrs-map variant lives in operators/attributes.py.

Two execution strategies:
- :func:`extract_columns` — one `regexp_extract` per group, pure JVM
  expressions, WholeStageCodegen, zero Python. Default.
- :func:`grok_pack` — many patterns applied in one Arrow-vectorized pandas
  UDF using precompiled `re` + `pd.Series.str.extract` (the reference
  precompiles at build time, attraction.go:139-212; its regex LRU cache
  regexpfilterset.go:42-76 is unnecessary under vectorized evaluation).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.attributes import _java_pattern


def extract_columns(
    df: DataFrame,
    src_col: str,
    pattern: str,
    prefix: str = "",
    keep_unmatched: bool = True,
) -> DataFrame:
    """Extract each named group of `pattern` from `src_col` into a new
    column `prefix+group`. Unmatched rows get NULL (regexp_extract returns ''
    on no-match; we normalize to NULL so the no-op/skip semantics of the
    reference's extract action are observable)."""
    jpat = _java_pattern(pattern)
    gi = re.compile(pattern).groupindex
    if not gi:
        raise ValueError("pattern must contain named capture groups")
    matched = F.col(src_col).isNotNull() & F.col(src_col).rlike(jpat)
    out = df
    for name, idx in gi.items():
        val = F.when(matched, F.regexp_extract(F.col(src_col), jpat, idx))
        out = out.withColumn(prefix + name, val)
    if not keep_unmatched:
        out = out.filter(matched)
    return out


def grok_pack(
    df: DataFrame,
    src_col: str,
    patterns: list[str],
    prefix: str = "",
) -> DataFrame:
    """Apply a pack of named-group patterns first-match-wins, vectorized.

    All groups across all patterns become output columns; each ROW is
    handled by the first pattern that matches it — that pattern supplies
    ALL its groups (unmatched optional groups stay NULL) and later patterns
    never touch the row. This is the grok-pack contract: one log shape per
    line, tried in declaration order. (A per-COLUMN fill would let a later
    pattern backfill holes in a row an earlier pattern already claimed.)
    """
    if not patterns:
        raise ValueError("grok_pack: patterns must be non-empty")
    compiled = [re.compile(p) for p in patterns]
    for p, c in zip(patterns, compiled):
        if not c.groupindex:
            raise ValueError(f"grok_pack: pattern has no named groups: {p!r}")
    names: list[str] = []
    for c in compiled:
        for n in c.groupindex:
            if n not in names:
                names.append(n)
    out_cols = [prefix + n for n in names]
    fields = ", ".join(f"`{c}` string" for c in out_cols)
    schema = f"{', '.join(f'`{f.name}` {f.dataType.simpleString()}' for f in df.schema.fields)}, {fields}"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf[src_col].astype("string")
            acc = {n: pd.Series([None] * len(s), dtype=object, index=s.index) for n in names}
            remaining = s.notna()
            for c in compiled:
                m = remaining & s.str.contains(c, na=False)
                if m.any():
                    ext = s[m].str.extract(c)  # vectorized per-pattern
                    for n in c.groupindex:
                        acc[n][m] = ext[n].astype(object).where(ext[n].notna(), None)
                    remaining &= ~m
            for n in names:
                pdf[prefix + n] = acc[n]
            yield pdf

    return df.mapInPandas(gen, schema=schema)
