"""Filter sets and match-properties compiled to Column predicates.

Reference semantics reproduced:
- strict filterset: exact string membership
  (``internal/processor/filterset/strict/strictfilterset.go:22-43``).
- regexp filterset: OR of **find-anywhere** re2 patterns. The comment at
  ``regexpfilterset.go:79`` claims automatic anchoring, but the code compiles
  patterns verbatim and matches with Go's unanchored ``MatchString`` (:64);
  the golden table ``filter_processor_test.go:111-127`` pins the unanchored
  behavior (``prefixprefix/test/match`` matches ``prefix/.*``). Java
  ``rlike`` is also find-anywhere, so patterns pass through verbatim.
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

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.coerce import canonical_str

STRICT = "strict"
REGEXP = "regexp"
EXPR = "expr"


def filterset_predicate(col: Column, values: list[str], match_type: str = STRICT) -> Column:
    """OR-membership of `col` in `values` under strict/regexp semantics."""
    if not values:
        return F.lit(False)
    # coalesce: a NULL column yields SQL NULL from isin/rlike, and NULL is
    # three-valued poison downstream — an exclude spec composed as
    # `include & ~NULL` would DROP rows it never matched. A NULL column is
    # "not matched" (False), exactly like a missing attribute key.
    if match_type == STRICT:
        return F.coalesce(col.isin(list(values)), F.lit(False))
    if match_type == REGEXP:
        # find-anywhere alternation: regexpfilterset.go:79 COMMENTS that
        # patterns are "automatically anchored" but the code compiles them
        # verbatim and uses Go's unanchored MatchString (:64) — the golden
        # table in filter_processor_test.go:111-127 (prefixprefix/test/match
        # matching prefix/.*) pins the unanchored behavior, and Spark rlike
        # has the same find-anywhere semantics. Callers anchor explicitly.
        alt = "|".join(f"(?:{p})" for p in values)
        return F.coalesce(col.rlike(alt), F.lit(False))
    raise ValueError(f"unknown match_type {match_type}")


@dataclass
class MatchProperties:
    """A single include- or exclude-spec (filterconfig.MatchProperties analog,
    ``internal/processor/filterconfig/config.go:70-136``).

    columns: envelope-column filtersets, e.g. {"role": ["assistant"]} — the
        record-name / service-name analog for transcript turns.
    attributes: dynamic-payload matchers over the `attrs` map column;
        value None means "key must exist" (attributematcher.go:96-100).
    resources: the same matcher semantics applied to a resource-level map
        column — filterspan matches resource attributes with the identical
        attributesMatcher, just against Resource().Attributes()
        (``internal/processor/filterspan/filterspan.go:107-116``).
    match_type: strict|regexp, applies to columns and string attr values;
        "expr" switches to the expressions list below and IGNORES every
        other criterion, exactly like filtermetric.NewMatcher
        (``internal/processor/filtermetric/filtermetric.go:27-31``).
    expressions: expr-language strings OR'd together (exprMatcher loops
        until first match, ``expr_matcher.go:38-48``); an EMPTY list
        matches NOTHING (no matchers -> false), so an include spec with no
        expressions drops the whole stream — the reference's own
        config_expr.yaml ``filter/empty`` behavior.
    expr_name_col: the column ``MetricName``/``Name`` reads in expr mode.
    """

    match_type: str = STRICT
    columns: dict[str, list[str]] = field(default_factory=dict)
    attributes: dict[str, object | None] = field(default_factory=dict)
    attrs_col: str = "attrs"
    resources: dict[str, object | None] = field(default_factory=dict)
    resource_col: str = "resource"
    expressions: list[str] = field(default_factory=list)
    expr_name_col: str = "metric"

    def _map_matchers(self, col_name: str, spec: dict[str, object | None]) -> list[Column]:
        preds: list[Column] = []
        for key, value in spec.items():
            m = F.col(col_name)
            has = F.coalesce(F.map_contains_key(m, F.lit(key)), F.lit(False))
            if value is None:
                preds.append(has)
            elif self.match_type == REGEXP and isinstance(value, str):
                preds.append(has & m[key].rlike(value))
            else:
                preds.append(has & (m[key] == F.lit(canonical_str(value))))
        return preds

    def predicate(self) -> Column:
        if self.match_type == EXPR:
            if not self.expressions:
                return F.lit(False)
            out = expr_predicate(
                self.expressions[0], name_col=self.expr_name_col, attrs_col=self.attrs_col
            )
            for e in self.expressions[1:]:
                out = out | expr_predicate(
                    e, name_col=self.expr_name_col, attrs_col=self.attrs_col
                )
            return F.coalesce(out, F.lit(False))
        preds: list[Column] = []
        for name, values in self.columns.items():
            preds.append(filterset_predicate(F.col(name), values, self.match_type))
        preds += self._map_matchers(self.attrs_col, self.attributes)
        preds += self._map_matchers(self.resource_col, self.resources)
        if not preds:
            return F.lit(True)
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        # a NULL map VALUE makes `m[key] == lit` NULL; matched-or-not must
        # be two-valued or ~predicate() in match_predicate drops rows
        return F.coalesce(out, F.lit(False))


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


# ---------------------------------------------------------------------------
# expr mini-language (internal/processor/filterexpr/matcher.go:24-62)
# ---------------------------------------------------------------------------

def _unquote(tok: str) -> str:
    """Strip quotes and unescape a STRING token (shared by _cmp/_primary)."""
    return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")


_TOKEN_RE = re.compile(
    r"\s*(?:(?P<op>\(|\)|==|!=|=~|&&|\|\||!)"
    r"|(?P<str>\"(?:[^\"\\]|\\.)*\")"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*))"
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ValueError(f"expr: bad token at {src[pos:]!r}")
            break
        pos = m.end()
        for kind in ("op", "str", "ident"):
            if m.group(kind) is not None:
                out.append((kind, m.group(kind)))
                break
    return out


class _ExprParser:
    """Recursive-descent parser for the subset of antonmedv/expr the
    reference exposes (matcher.go env: MetricName, Label(k), HasLabel(k) —
    generalized here to Name / Attr(k) / HasAttr(k) over transcript columns).

    Grammar: or := and ('||' and)* ; and := unary ('&&' unary)* ;
    unary := '!' unary | cmp ; cmp := primary (('=='|'!='|'=~') primary)? ;
    primary := '(' or ')' | STRING | Name | Fn '(' STRING ')'.
    """

    def __init__(self, tokens: list[tuple[str, str]], name_col: str, attr_cols: dict[str, str] | None, attrs_col: str):
        self.toks = tokens
        self.i = 0
        self.name_col = name_col
        self.attr_cols = attr_cols or {}
        self.attrs_col = attrs_col

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _eat(self, val: str | None = None):
        kind, tok = self._peek()
        if kind is None or (val is not None and tok != val):
            raise ValueError(f"expr: expected {val!r}, got {tok!r}")
        self.i += 1
        return kind, tok

    def parse(self) -> Column:
        col = self._or()
        if self.i != len(self.toks):
            raise ValueError(f"expr: trailing tokens {self.toks[self.i:]}")
        return col

    def _or(self) -> Column:
        left = self._and()
        while self._peek()[1] == "||":
            self._eat("||")
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._unary()
        while self._peek()[1] == "&&":
            self._eat("&&")
            left = left & self._unary()
        return left

    def _unary(self) -> Column:
        if self._peek()[1] == "!":
            self._eat("!")
            return ~self._unary()
        return self._cmp()

    def _cmp(self) -> Column:
        left = self._primary()
        op = self._peek()[1]
        if op in ("==", "!=", "=~"):
            self._eat(op)
            if op == "=~":
                kind, tok = self._eat()
                if kind != "str":
                    raise ValueError("expr: =~ requires a string pattern on the right")
                return left.rlike(_unquote(tok))
            right = self._primary()
            if op == "==":
                return left == right
            # expr's != over a missing/NULL operand is false, not NULL —
            # a filter must drop, never keep, on missing
            return F.coalesce(left != right, F.lit(False))
        return left

    def _primary(self):
        kind, tok = self._peek()
        if tok == "(":
            self._eat("(")
            col = self._or()
            self._eat(")")
            return col
        if kind == "str":
            self._eat()
            return F.lit(_unquote(tok))
        if kind == "ident":
            self._eat()
            if tok in ("Name", "MetricName"):
                # env.MetricName is a Go string (zero value ""), never nil
                return F.coalesce(F.col(self.name_col).cast("string"), F.lit(""))
            if tok in ("Attr", "Label", "HasAttr", "HasLabel"):
                self._eat("(")
                skind, s = self._eat()
                if skind != "str":
                    raise ValueError(f"expr: {tok}() takes a string key")
                key = s[1:-1]
                self._eat(")")
                if tok in ("HasAttr", "HasLabel"):
                    if key in self.attr_cols:
                        return F.col(self.attr_cols[key]).isNotNull()
                    return F.coalesce(
                        F.map_contains_key(F.col(self.attrs_col), F.lit(key)), F.lit(False)
                    )
                # the reference's Label(k) env fn returns "" for a MISSING
                # key (matcher.go:159-162: `v, _ := labelsMap.Get(k)` — Go
                # zero value), so Attr("k") != "v" KEEPS rows without the
                # key; a bare NULL here would silently drop them
                if key in self.attr_cols:
                    return F.coalesce(F.col(self.attr_cols[key]).cast("string"), F.lit(""))
                return F.coalesce(F.col(self.attrs_col)[key], F.lit(""))
            raise ValueError(f"expr: unknown identifier {tok!r}")
        raise ValueError(f"expr: unexpected token {tok!r}")


def validate_expr(expression: str) -> None:
    """Parse-check an expr string WITHOUT building Columns (no session
    needed) — the load-time twin of :class:`_ExprParser`, so a config
    loader can fail at build time exactly where Go's filterexpr.NewMatcher
    compile fails. Grammar kept in lockstep with _ExprParser's docstring;
    raises ValueError with the parser's own messages."""
    toks = _tokenize(expression)
    i = 0

    def peek():
        return toks[i] if i < len(toks) else (None, None)

    def eat(val=None):
        nonlocal i
        kind, tok = peek()
        if kind is None or (val is not None and tok != val):
            raise ValueError(f"expr: expected {val!r}, got {tok!r}")
        i += 1
        return kind, tok

    def p_or():
        p_and()
        while peek()[1] == "||":
            eat("||")
            p_and()

    def p_and():
        p_unary()
        while peek()[1] == "&&":
            eat("&&")
            p_unary()

    def p_unary():
        if peek()[1] == "!":
            eat("!")
            p_unary()
        else:
            p_cmp()

    def p_cmp():
        p_primary()
        op = peek()[1]
        if op in ("==", "!=", "=~"):
            eat(op)
            if op == "=~":
                kind, _ = eat()
                if kind != "str":
                    raise ValueError("expr: =~ requires a string pattern on the right")
            else:
                p_primary()

    def p_primary():
        kind, tok = peek()
        if tok == "(":
            eat("(")
            p_or()
            eat(")")
            return
        if kind == "str":
            eat()
            return
        if kind == "ident":
            eat()
            if tok in ("Name", "MetricName"):
                return
            if tok in ("Attr", "Label", "HasAttr", "HasLabel"):
                eat("(")
                skind, _ = eat()
                if skind != "str":
                    raise ValueError(f"expr: {tok}() takes a string key")
                eat(")")
                return
            raise ValueError(f"expr: unknown identifier {tok!r}")
        raise ValueError(f"expr: unexpected token {tok!r}")

    p_or()
    if i != len(toks):
        raise ValueError(f"expr: trailing tokens {toks[i:]}")


def expr_predicate(
    expression: str,
    name_col: str = "text",
    attr_cols: dict[str, str] | None = None,
    attrs_col: str = "attrs",
) -> Column:
    """Translate an expr-language string to a boolean Column.

    The reference evaluates these per-datapoint in a VM
    (``internal/processor/filterexpr/matcher.go:24-62``); here the whole
    expression compiles once into Catalyst predicates (vectorized, and
    eligible for scan pushdown when it references plain columns).
    `attr_cols` maps Attr/Label keys to flattened envelope columns; other
    keys fall back to the `attrs` map column."""
    return _ExprParser(_tokenize(expression), name_col, attr_cols, attrs_col).parse()
