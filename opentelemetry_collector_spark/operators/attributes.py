"""Attributes processor: ordered attribute actions over the `attrs` map.

Action semantics per ``processor/processorhelper/attraction.go:87-285``:
- insert: set key only if absent (:225-229); value from literal or
  `from_attribute` (missing source attr => no-op, :250-257)
- update: set key only if present (:230-235)
- upsert: always set (:236-241)
- delete: remove key (:222-223)
- hash: overwrite value with SHA-1 hex of canonical bytes (:242-243,
  hasher.go:37-77) — our map values are canonical strings, so string-layout
  SHA-1; `algorithm` is configurable ('sha1' default, 'md5' supported)
- extract: regex with named capture groups over the value; each group name
  upserted as an attribute (:244-245, :265-285). Go re2's `(?P<name>...)` is
  translated to Java `(?<name>...)` and evaluated with positional
  `regexp_extract` per group — find-anywhere, first match, like Go
  FindStringSubmatch.

Include/exclude gating mirrors the attributes processor's skip protocol
(``processor/attributesprocessor/attributes_log.go:43-86``): matched rows are
transformed, unmatched rows pass through untouched.

Everything compiles to a single Column expression chain — one projection, no
shuffle, stays inside WholeStageCodegen (plan-once, like the reference's
build-time action compilation at attraction.go:139-212).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.coerce import canonical_str, ensure_attrs
from opentelemetry_collector_spark.operators.filters import MatchProperties, match_predicate

INSERT, UPDATE, UPSERT, DELETE, HASH, EXTRACT = (
    "insert",
    "update",
    "upsert",
    "delete",
    "hash",
    "extract",
)

_HASH_FNS = {"sha1": F.sha1, "md5": F.md5, "sha256": lambda c: F.sha2(c, 256)}


@dataclass
class Action:
    key: str
    action: str
    value: object | None = None  # literal (canonically stringified)
    from_attribute: str | None = None
    pattern: str | None = None  # extract only; named groups required
    algorithm: str = "sha1"  # hash only

    def validate(self) -> None:
        # mirrors attraction.go:139-212 validation
        if self.action in (INSERT, UPDATE, UPSERT):
            if (self.value is None) == (self.from_attribute is None):
                raise ValueError(f"{self.action} '{self.key}': exactly one of value/from_attribute")
        elif self.action in (DELETE, HASH):
            if self.value is not None or self.from_attribute is not None or self.pattern:
                raise ValueError(f"{self.action} '{self.key}': no value/from_attribute/pattern")
        elif self.action == EXTRACT:
            if not self.pattern:
                raise ValueError(f"extract '{self.key}': pattern required")
            gi = re.compile(self.pattern).groupindex
            if not gi:
                raise ValueError(f"extract '{self.key}': pattern must have named groups")
            n_groups = re.compile(self.pattern).groups
            if len(gi) != n_groups:
                raise ValueError(f"extract '{self.key}': all capture groups must be named (attraction.go:193-199)")
        else:
            raise ValueError(f"unknown action {self.action}")


_NAMED_GROUP_RE = re.compile(r"\(\?P?<(?![=!])[^>]+>")


def _java_pattern(pattern: str) -> str:
    """Go/Python (?P<name>...) -> plain Java group (...).

    Java group names may not contain underscores, and we address groups
    positionally (via Python's groupindex) anyway, so names are stripped."""
    return _NAMED_GROUP_RE.sub("(", pattern)


def _map_set(m: Column, key: str, value: Column) -> Column:
    """Unconditional key set: drop existing key, concat the new entry.
    Avoids duplicate-key errors under the default EXCEPTION dedup policy."""
    cleaned = F.map_filter(m, lambda k, _v: k != F.lit(key))
    return F.map_concat(cleaned, F.create_map(F.lit(key), value))


def _apply_one(m: Column, a: Action) -> Column:
    if a.action == DELETE:
        return F.map_filter(m, lambda k, _v: k != F.lit(a.key))

    if a.action == HASH:
        has = F.map_contains_key(m, F.lit(a.key))
        hashed = _HASH_FNS[a.algorithm](m[a.key])
        return F.when(has, _map_set(m, a.key, hashed)).otherwise(m)

    if a.action == EXTRACT:
        jpat = _java_pattern(a.pattern)
        src = m[a.key]
        matched = src.isNotNull() & src.rlike(jpat)
        out = m
        for name, idx in re.compile(a.pattern).groupindex.items():
            out = _map_set(out, name, F.regexp_extract(src, jpat, idx))
        return F.when(matched, out).otherwise(m)

    # insert / update / upsert share value resolution
    if a.value is not None:
        val: Column = F.lit(canonical_str(a.value))
        resolvable = F.lit(True)
    else:
        val = m[a.from_attribute]
        resolvable = F.map_contains_key(m, F.lit(a.from_attribute))

    has = F.map_contains_key(m, F.lit(a.key))
    if a.action == INSERT:
        cond = resolvable & ~has
    elif a.action == UPDATE:
        cond = resolvable & has
    else:  # UPSERT
        cond = resolvable
    return F.when(cond, _map_set(m, a.key, val)).otherwise(m)


def attrs_expr(actions: list[Action], attrs_col: str = "attrs") -> Column:
    """Fold the ordered action list into one Column expression."""
    m = ensure_attrs(F.col(attrs_col))
    for a in actions:
        a.validate()
        m = _apply_one(m, a)
    return m


def apply_actions(
    df: DataFrame,
    actions: list[Action],
    include: MatchProperties | None = None,
    exclude: MatchProperties | None = None,
    attrs_col: str = "attrs",
) -> DataFrame:
    """attributes processor over `df` (adds the attrs column if missing)."""
    if attrs_col not in df.columns:
        df = df.withColumn(attrs_col, ensure_attrs(F.lit(None).cast("map<string,string>")))
    new = attrs_expr(actions, attrs_col)
    if include is not None or exclude is not None:
        pred = match_predicate(include, exclude)
        new = F.when(pred, new).otherwise(ensure_attrs(F.col(attrs_col)))
    return df.withColumn(attrs_col, new)
