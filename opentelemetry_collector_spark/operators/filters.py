"""Filter sets and match-properties compiled to Column predicates.

Reference semantics reproduced:
- strict filterset: exact string membership
  (``internal/processor/filterset/strict/strictfilterset.go:22-43``).
- regexp filterset: OR of **full-match** re2 patterns — "automatically
  anchored" (``internal/processor/filterset/regexp/regexpfilterset.go:37-96``,
  anchor note :79-80). We anchor explicitly with ^(?:...)$ since Java
  ``rlike`` is find-anywhere.
- attribute matcher: all listed keys must exist and equal the (stringified)
  value, or regex-match for strings; an empty attribute map never matches a
  non-empty spec (``internal/processor/filtermatcher/attributematcher.go:83-114``).
- match properties: conjunction over name/attributes/resources
  (``internal/processor/filterspan/filterspan.go:90-134``,
  ``internal/processor/filterlog/filterlog.go:78-84``).
- include-then-exclude protocol: include mismatch => not matched; exclude
  match => not matched (``filterspan.go:90-106``).

The regex LRU cache of the reference (regexpfilterset.go:42-76) is not needed:
Catalyst evaluates ``rlike`` vectorized in codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.coerce import canonical_str

STRICT = "strict"
REGEXP = "regexp"


def filterset_predicate(col: Column, values: list[str], match_type: str = STRICT) -> Column:
    """OR-membership of `col` in `values` under strict/regexp semantics."""
    if not values:
        return F.lit(False)
    if match_type == STRICT:
        return col.isin(list(values))
    if match_type == REGEXP:
        # full-match anchored alternation (regexpfilterset.go:79-96)
        alt = "|".join(f"(?:{p})" for p in values)
        return col.rlike(f"^(?:{alt})$")
    raise ValueError(f"unknown match_type {match_type}")


@dataclass
class MatchProperties:
    """A single include- or exclude-spec (filterconfig.MatchProperties analog,
    ``internal/processor/filterconfig/config.go:70-136``).

    columns: envelope-column filtersets, e.g. {"role": ["assistant"]} — the
        record-name / service-name analog for transcript turns.
    attributes: dynamic-payload matchers over the `attrs` map column;
        value None means "key must exist" (attributematcher.go:96-100).
    match_type: strict|regexp, applies to columns and string attr values.
    """

    match_type: str = STRICT
    columns: dict[str, list[str]] = field(default_factory=dict)
    attributes: dict[str, object | None] = field(default_factory=dict)
    attrs_col: str = "attrs"

    def predicate(self) -> Column:
        preds: list[Column] = []
        for name, values in self.columns.items():
            preds.append(filterset_predicate(F.col(name), values, self.match_type))
        for key, value in self.attributes.items():
            m = F.col(self.attrs_col)
            has = F.coalesce(F.map_contains_key(m, F.lit(key)), F.lit(False))
            if value is None:
                preds.append(has)
            elif self.match_type == REGEXP and isinstance(value, str):
                preds.append(has & m[key].rlike(f"^(?:{value})$"))
            else:
                preds.append(has & (m[key] == F.lit(canonical_str(value))))
        if not preds:
            return F.lit(True)
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out


def match_predicate(
    include: MatchProperties | None = None, exclude: MatchProperties | None = None
) -> Column:
    """The acted-on set: include matches (or no include) AND NOT exclude
    (filterspan.go:90-106)."""
    pred = F.lit(True) if include is None else include.predicate()
    if exclude is not None:
        pred = pred & ~exclude.predicate()
    return pred


def filter_records(
    df: DataFrame,
    include: MatchProperties | None = None,
    exclude: MatchProperties | None = None,
) -> DataFrame:
    """filter processor: keep only include-matching, then drop
    exclude-matching (``processor/filterprocessor/filter_processor.go:117-187``).
    The RemoveIf empty-parent pruning and ErrSkipProcessingData short-circuit
    are subsumed by Catalyst empty-relation propagation."""
    return df.filter(match_predicate(include, exclude))
