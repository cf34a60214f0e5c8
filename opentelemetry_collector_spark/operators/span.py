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

    java_pattern: str  # all segments wrapped in groups (unanchored; for rlike/extract)
    first_pattern: str  # '(?s)^(.*?)' + java_pattern — rewrites the FIRST occurrence only
    first_replacement: str  # $1 prefix + shifted $i backrefs + {name} placeholders
    group_names: list[str]
    group_index: dict[str, int]  # name -> group index in java_pattern


def _count_caps(text: str) -> int:
    """Capture groups inside a regex fragment: unescaped '(' not followed
    by '?' and not inside a character class. Needed to keep segment group
    numbering correct when a named group's BODY nests its own groups."""
    n, i, caps, in_class = len(text), 0, 0, False
    while i < n:
        c = text[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(" and not text.startswith("(?", i):
            caps += 1
        i += 1
    return caps


def _check_segment_safe(text: str, pattern: str) -> None:
    """Reject inter-group fragments the segment-wrapping rewrite cannot
    represent: wrapping ``pre`` as ``(pre)`` changes the meaning of a
    TOP-LEVEL alternation (``(?P<a>x)|(?P<b>y)`` would become the
    concatenation ``(x)(|)(y)``) and of a quantifier that applies to the
    PRECEDING named group (``(?P<g>\\d+)?`` would emit the invalid ``(?)``).
    Raising at build time replaces what would otherwise be a silently-
    never-matching or crashing pattern."""
    if text and text[0] in "?*+{":
        raise ValueError(
            f"to_attributes: quantifier {text[0]!r} directly after a named group "
            f"is not supported (pattern {pattern!r}) — quantified groups have no "
            "single substring to rewrite"
        )
    n, i, depth, in_class = len(text), 0, 0, False
    while i < n:
        c = text[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "|" and depth == 0:
            raise ValueError(
                f"to_attributes: top-level alternation is not supported "
                f"(pattern {pattern!r}) — put the '|' inside a group"
            )
        i += 1


def _segment(pattern: str) -> _Segmented:
    """Wrap inter-group regex segments in their own groups.

    ``pre(?P<g>body)post`` -> ``(pre)(body)(post)`` with replacement
    ``$1{g}$3``. Group numbering accounts for capture groups nested inside
    any fragment; unsupported shapes (top-level alternation, a quantifier
    applying to a named group) raise at build time (_check_segment_safe).
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
            _check_segment_safe(text, pattern)
            parts.append(f"({text})")
            repl.append(f"${g}")
        else:
            parts.append(f"({text})")
            repl.append("{" + name + "}")
            names.append(name)
            gidx[name] = g
        # groups nested INSIDE this fragment occupy the next indices
        g += _count_caps(text)
    java = "".join(parts)
    # first-occurrence rewrite: anchor a lazy prefix as group 1 and shift
    # every backreference by one — span.go uses FindStringSubmatchIndex
    # (first match), while a bare regexp_replace rewrites EVERY occurrence
    first_repl = "$1" + "".join(
        f"${int(r[1:]) + 1}" if r.startswith("$") else r for r in repl
    )
    return _Segmented(java, "(?s)^(.*?)" + java, first_repl, names, gidx)


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
    # one withColumns PER RULE (simultaneous name+attrs update, so each
    # rule's extraction sees the name as of the PREVIOUS rule, sequential
    # like span.go). Rule n's expressions reference the materialized column
    # from rule n-1 — linear plan growth; folding everything into one
    # expression would embed the prior name ~4x per rule (the O(3^n)
    # blowup attrs_expr's docstring measures and avoids).
    consumed_col = "_tam_consumed"
    if break_after_match:
        df = df.withColumn(consumed_col, F.lit(False))
    for p in patterns:
        seg = _segment(p)
        re.compile(p)  # validate in the source dialect too
        name: Column = F.col(name_col)
        attrs: Column = ensure_attrs(F.col(attrs_col))
        hit = name.rlike(seg.java_pattern)
        if break_after_match:
            hit = hit & ~F.col(consumed_col)
        new_attrs = attrs
        for gname in seg.group_names:
            new_attrs = _map_set(
                new_attrs, gname, F.regexp_extract(name, seg.java_pattern, seg.group_index[gname])
            )
        # first occurrence only (span.go FindStringSubmatchIndex); the
        # anchored lazy-prefix pattern can match at most once
        new_name = F.regexp_replace(name, seg.first_pattern, seg.first_replacement)
        updates = {
            name_col: F.when(hit, new_name).otherwise(name),
            attrs_col: F.when(hit, new_attrs).otherwise(attrs),
        }
        if break_after_match:
            updates[consumed_col] = F.col(consumed_col) | hit
        df = df.withColumns(updates)
    return df.drop(consumed_col) if break_after_match else df
