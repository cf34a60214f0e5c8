"""Canonical AttributeValue -> string coercion.

The reference stringifies variant attribute values for matching
(``internal/processor/filtermatcher/attributematcher.go:116-129`` and
``translator/trace/protospan_translation.go:61-90``): bool -> "true"/"false",
int -> base-10, double -> shortest round-trip decimal, string as-is. Our attrs
map is MapType(string,string), so the same canonical form is applied at
ingest / literal-config time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_str(value: object) -> str:
    """Python-side canonicalization for config literals."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        # shortest round-trip, matching Go strconv.FormatFloat(f,'f',-1,64)
        # for the values used in configs/tests
        s = repr(value)
        return s[:-2] if s.endswith(".0") else s
    return str(value)


def empty_attrs() -> Column:
    """Typed empty map<string,string> literal."""
    return F.from_json(F.lit("{}"), "map<string,string>")


def ensure_attrs(col: Column) -> Column:
    return F.coalesce(col, empty_attrs())
