"""Span processor analogs: name <-> attributes transforms.

Reference: ``processor/spanprocessor/span.go:82-221``.

- from_attributes (:105-156): rebuild the record name by joining attribute
  values with a separator; the rule ABORTS for a record if any key is
  missing (name left unchanged).
- to_attributes (:158-221): sequential regex rules over the name; named
  groups are upserted as attributes and each matched group's substring is
  replaced by `{group}` in the name; optional break_after_match.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.coerce import ensure_attrs
from opentelemetry_collector_spark.operators.attributes import _java_pattern, _map_set


def from_attributes(
    df: DataFrame,
    keys: list[str],
    separator: str = "",
    name_col: str = "name",
    attrs_col: str = "attrs",
) -> DataFrame:
    """name := join(attrs[k] for k in keys, sep) iff ALL keys present."""
    m = ensure_attrs(F.col(attrs_col))
    all_present = F.lit(True)
    for k in keys:
        all_present = all_present & F.map_contains_key(m, F.lit(k))
    new_name = F.concat_ws(separator, *[m[k] for k in keys])
    return df.withColumn(name_col, F.when(all_present, new_name).otherwise(F.col(name_col)))


@dataclass
class _Segmented:
    """Pattern split into literal-regex segments and named groups, so the
    group-substring placeholder rewrite (span.go:191-205) can be done with a
    single JVM regexp_replace using backreferences for the segments."""

    java_pattern: str  # all segments wrapped in groups
    replacement: str  # $i backrefs for segments, {name} for named groups
    group_names: list[str]
    group_index: dict[str, int]  # name -> group index in java_pattern


def _segment(pattern: str) -> _Segmented:
    """Wrap inter-group regex segments in their own groups.

    ``pre(?P<g>body)post`` -> ``(pre)((?:body))(post)`` with replacement
    ``$1{g}$3``. Supports multiple named groups and nested parens inside
    group bodies; segments themselves must not contain capture groups
    (the reference requires all groups named — attraction.go:193-199).
    """
    toks: list[tuple[str, str | None]] = []  # (regex_text, group_name|None)
    i, seg_start = 0, 0
    n = len(pattern)
    while i < n:
        if pattern[i] == "\\":
            i += 2
            continue
        if pattern.startswith("(?P<", i) or (
            pattern.startswith("(?<", i) and not pattern.startswith("(?<=", i) and not pattern.startswith("(?<!", i)
        ):
            if seg_start < i:
                toks.append((pattern[seg_start:i], None))
            close = pattern.index(">", i)
            name = pattern[i + (4 if pattern.startswith("(?P<", i) else 3) : close]
            depth, j = 1, close + 1
            while j < n and depth:
                if pattern[j] == "\\":
                    j += 2
                    continue
                if pattern[j] == "(":
                    depth += 1
                elif pattern[j] == ")":
                    depth -= 1
                j += 1
            toks.append((pattern[close + 1 : j - 1], name))
            i = seg_start = j
        else:
            i += 1
    if seg_start < n:
        toks.append((pattern[seg_start:], None))

    parts: list[str] = []
    repl: list[str] = []
    names: list[str] = []
    gidx: dict[str, int] = {}
    g = 0
    for text, name in toks:
        g += 1
        if name is None:
            parts.append(f"({text})")
            repl.append(f"${g}")
        else:
            parts.append(f"({text})")
            repl.append("{" + name + "}")
            names.append(name)
            gidx[name] = g
    return _Segmented("".join(parts), "".join(repl), names, gidx)


def to_attributes(
    df: DataFrame,
    patterns: list[str],
    name_col: str = "name",
    attrs_col: str = "attrs",
    break_after_match: bool = False,
) -> DataFrame:
    """Sequential to_attributes rules (span.go:158-221).

    For each rule, on rows whose name matches: upsert each named group into
    attrs and replace the group substring in the name with `{group}`.
    With break_after_match, later rules skip rows an earlier rule matched.
    """
    if attrs_col not in df.columns:
        df = df.withColumn(attrs_col, ensure_attrs(F.lit(None).cast("map<string,string>")))
    name: Column = F.col(name_col)
    attrs: Column = ensure_attrs(F.col(attrs_col))
    consumed: Column = F.lit(False)
    for p in patterns:
        seg = _segment(p)
        re.compile(p)  # validate in the source dialect too
        hit = name.rlike(seg.java_pattern) & ~consumed
        new_attrs = attrs
        for gname in seg.group_names:
            new_attrs = _map_set(
                new_attrs, gname, F.regexp_extract(name, seg.java_pattern, seg.group_index[gname])
            )
        new_name = F.regexp_replace(name, seg.java_pattern, seg.replacement)
        attrs = F.when(hit, new_attrs).otherwise(attrs)
        name = F.when(hit, new_name).otherwise(name)
        if break_after_match:
            consumed = consumed | hit
    # single projection: both expressions must see the ORIGINAL name column
    return df.withColumns({name_col: name, attrs_col: attrs})
