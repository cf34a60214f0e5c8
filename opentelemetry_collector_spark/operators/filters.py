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
    """Strip quotes and unescape a STRING token (shared by _cmp/_primary).

    Dispatches on the quote character, so ``'it\\'s'`` unescapes the inner
    quote just like ``"say \\"hi\\""`` does; a single left-to-right pass
    keeps ``\\\\`` from re-triggering the quote unescape."""
    q = tok[0]
    return re.sub(
        r"\\(.)",
        lambda m: m.group(1) if m.group(1) in (q, "\\") else "\\" + m.group(1),
        tok[1:-1],
    )


_TOKEN_RE = re.compile(
    r"\s*(?:(?P<op><=|>=|==|!=|=~|&&|\|\||[()<>!+\-*/%,\[\]])"
    r"|(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<str>\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')"
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
        for kind in ("op", "num", "str", "ident"):
            if m.group(kind) is not None:
                out.append((kind, m.group(kind)))
                break
    return out


# antonmedv/expr accepts both symbol and word forms of the booleans
_WORD_OPS = {"and": "&&", "or": "||", "not": "!"}
#: infix string builtins of the expr language
_STR_OPS = {"contains", "startsWith", "endsWith", "matches"}


class _ExprAst:
    """Recursive-descent parser for the antonmedv/expr subset the
    reference's filterexpr processor exposes (matcher.go env: MetricName,
    Label(k), HasLabel(k) — generalized to Name / Attr(k) / HasAttr(k)),
    extended per the contrib surface to arithmetic, ordered comparisons,
    list membership, and the infix string builtins.

    Produces a plain-tuple AST, so parsing doubles as session-free
    validation (:func:`validate_expr`) and :class:`_ExprCompiler` turns
    the same tree into Catalyst predicates — one grammar, two backends.

    Grammar (loosest to tightest):
      or    := and (('||'|'or') and)*
      and   := not (('&&'|'and') not)*
      not   := ('!'|'not') not | cmp
      cmp   := sum (('=='|'!='|'<'|'<='|'>'|'>='|'=~'|'matches'|'contains'
                     |'startsWith'|'endsWith') sum
                    | ['not'] 'in' list)?
      sum   := prod (('+'|'-') prod)*
      prod  := unary (('*'|'/'|'%') unary)*
      unary := '-' unary | primary
      primary := '(' or ')' | STRING | NUMBER | true | false
                 | Name | MetricName | len '(' or ')'
                 | (Attr|Label) '(' STRING ')' | (HasAttr|HasLabel) '(' STRING ')'
      list  := '[' (STRING|NUMBER) (',' (STRING|NUMBER))* ']'
    """

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _eat(self, val: str | None = None):
        kind, tok = self._peek()
        if kind is None or (val is not None and tok != val):
            raise ValueError(f"expr: expected {val!r}, got {tok!r}")
        self.i += 1
        return kind, tok

    def parse(self):
        node = self._or()
        if self.i != len(self.toks):
            raise ValueError(f"expr: trailing tokens {self.toks[self.i:]}")
        return node

    def _op_is(self, *names):
        kind, tok = self._peek()
        if kind == "op" and tok in names:
            return tok
        if kind == "ident" and _WORD_OPS.get(tok) in names:
            return _WORD_OPS[tok]
        return None

    def _or(self):
        left = self._and()
        while self._op_is("||"):
            self._eat()
            left = ("or", left, self._and())
        return left

    def _and(self):
        left = self._not()
        while self._op_is("&&"):
            self._eat()
            left = ("and", left, self._not())
        return left

    def _not(self):
        if self._op_is("!"):
            self._eat()
            return ("not", self._not())
        return self._cmp()

    def _cmp(self):
        left = self._sum()
        kind, tok = self._peek()
        if kind == "op" and tok in ("==", "!=", "<", "<=", ">", ">=", "=~"):
            self._eat()
            if tok == "=~":
                skind, stok = self._eat()
                if skind != "str":
                    raise ValueError("expr: =~ requires a string pattern on the right")
                return ("strop", "matches", left, ("lit", _unquote(stok), "str"))
            return ("cmp", tok, left, self._sum())
        if kind == "ident" and tok in _STR_OPS:
            self._eat()
            skind, stok = self._eat()
            if skind != "str":
                raise ValueError(f"expr: {tok} requires a string literal on the right")
            return ("strop", tok, left, ("lit", _unquote(stok), "str"))
        negated = False
        if kind == "ident" and tok == "not" and self.toks[self.i + 1 : self.i + 2] == [("ident", "in")]:
            self._eat()
            negated = True
        if self._peek() == ("ident", "in"):
            self._eat()
            return ("in", left, self._list(), negated)
        if negated:
            raise ValueError("expr: 'not' here must be followed by 'in'")
        return left

    def _list(self):
        self._eat("[")
        items = []
        while True:
            kind, tok = self._eat()
            if kind == "str":
                items.append(("lit", _unquote(tok), "str"))
            elif kind == "num":
                items.append(("lit", float(tok) if "." in tok else int(tok), "num"))
            else:
                raise ValueError("expr: list literals hold strings/numbers only")
            if self._peek() == ("op", ","):
                self._eat(",")
                continue
            self._eat("]")
            return items

    def _sum(self):
        left = self._prod()
        while True:
            op = self._op_is("+", "-")
            if not op:
                return left
            self._eat()
            left = ("arith", op, left, self._prod())

    def _prod(self):
        left = self._unary()
        while True:
            op = self._op_is("*", "/", "%")
            if not op:
                return left
            self._eat()
            left = ("arith", op, left, self._unary())

    def _unary(self):
        if self._op_is("-"):
            self._eat()
            return ("arith", "-", ("lit", 0, "num"), self._unary())
        return self._primary()

    def _primary(self):
        kind, tok = self._peek()
        if tok == "(":
            self._eat("(")
            node = self._or()
            self._eat(")")
            return node
        if kind == "str":
            self._eat()
            return ("lit", _unquote(tok), "str")
        if kind == "num":
            self._eat()
            return ("lit", float(tok) if "." in tok else int(tok), "num")
        if kind == "ident":
            self._eat()
            if tok in ("true", "false"):
                return ("lit", tok == "true", "bool")
            if tok in ("Name", "MetricName"):
                return ("name",)
            if tok == "len":
                self._eat("(")
                inner = self._or()
                self._eat(")")
                return ("len", inner)
            if tok in ("Attr", "Label", "HasAttr", "HasLabel"):
                self._eat("(")
                skind, s = self._eat()
                if skind != "str":
                    raise ValueError(f"expr: {tok}() takes a string key")
                self._eat(")")
                if tok in ("HasAttr", "HasLabel"):
                    return ("hasattr", _unquote(s))
                return ("attr", _unquote(s))
            raise ValueError(f"expr: unknown identifier {tok!r}")
        raise ValueError(f"expr: unexpected token {tok!r}")


_BOOL_NODES = {"or", "and", "not", "cmp", "strop", "in", "hasattr"}


class _ExprCompiler:
    """AST -> Catalyst. Type discipline: Attr()/Name are STRING columns
    (Go env zero-values: missing keys read as \"\", mirroring
    `v, _ := labelsMap.Get(k)`); wherever a NUMBER literal or arithmetic
    meets them (ordered compare, ==, in-list of numbers, math), both sides
    cast to double — the practical reading of expr's dynamic numbers over
    an attribute store that stringifies. != coalesces to false so a filter
    drops, never keeps, on missing data."""

    def __init__(self, name_col: str, attr_cols: dict[str, str] | None, attrs_col: str):
        self.name_col = name_col
        self.attr_cols = attr_cols or {}
        self.attrs_col = attrs_col

    def compile(self, node) -> Column:
        if node[0] not in _BOOL_NODES and not (node[0] == "lit" and node[2] == "bool"):
            raise ValueError("expr: expression does not evaluate to a boolean")
        return self._col(node)

    def _numeric(self, node) -> bool:
        if node[0] == "lit":
            return node[2] == "num"
        if node[0] in ("arith", "len"):
            return True
        return False

    def _col(self, node) -> Column:
        tag = node[0]
        if tag == "or":
            return self._col(node[1]) | self._col(node[2])
        if tag == "and":
            return self._col(node[1]) & self._col(node[2])
        if tag == "not":
            return ~self._col(node[1])
        if tag == "lit":
            return F.lit(node[1])
        if tag == "name":
            return F.coalesce(F.col(self.name_col).cast("string"), F.lit(""))
        if tag == "attr":
            key = node[1]
            if key in self.attr_cols:
                return F.coalesce(F.col(self.attr_cols[key]).cast("string"), F.lit(""))
            return F.coalesce(F.col(self.attrs_col)[key], F.lit(""))
        if tag == "hasattr":
            key = node[1]
            if key in self.attr_cols:
                return F.col(self.attr_cols[key]).isNotNull()
            return F.coalesce(
                F.map_contains_key(F.col(self.attrs_col), F.lit(key)), F.lit(False)
            )
        if tag == "len":
            return F.length(self._col(node[1])).cast("double")
        if tag == "arith":
            op, a, b = node[1], node[2], node[3]
            ca, cb = self._num(a), self._num(b)
            if op == "+":
                return ca + cb
            if op == "-":
                return ca - cb
            if op == "*":
                return ca * cb
            if op == "/":
                return ca / cb
            return ca % cb
        if tag == "strop":
            op, a, b = node[1], node[2], node[3]
            ca, pat = self._col(a), node[3][1]
            if op == "matches":
                return ca.rlike(pat)
            if op == "contains":
                return ca.contains(F.lit(pat))
            if op == "startsWith":
                return ca.startswith(pat)
            return ca.endswith(pat)
        if tag == "in":
            _, left, items, negated = node
            numeric = any(i[2] == "num" for i in items)
            lc = self._num(left) if numeric else self._col(left)
            vals = [F.lit(i[1]) for i in items]
            pred = F.coalesce(lc.isin(*[v.cast("double") for v in vals])
                              if numeric else lc.isin(*vals), F.lit(False))
            return ~pred if negated else pred
        if tag == "cmp":
            op, a, b = node[1], node[2], node[3]
            numeric = op in ("<", "<=", ">", ">=") and (self._numeric(a) or self._numeric(b))
            numeric = numeric or (op in ("==", "!=") and (self._numeric(a) or self._numeric(b)))
            if op in ("<", "<=", ">", ">="):
                ca = self._num(a) if numeric else self._col(a)
                cb = self._num(b) if numeric else self._col(b)
                ops = {"<": ca < cb, "<=": ca <= cb, ">": ca > cb, ">=": ca >= cb}
                return F.coalesce(ops[op], F.lit(False))
            ca = self._num(a) if numeric else self._col(a)
            cb = self._num(b) if numeric else self._col(b)
            if op == "==":
                return F.coalesce(ca == cb, F.lit(False))
            # expr's != over a missing/NULL operand is false, not NULL —
            # a filter must drop, never keep, on missing
            return F.coalesce(ca != cb, F.lit(False))
        raise ValueError(f"expr: unknown node {tag!r}")

    def _num(self, node) -> Column:
        # try_cast: the Go env's zero-value "" (and any non-numeric attr)
        # reads as NULL in numeric context instead of an ANSI cast error —
        # comparisons then coalesce to false, dropping the row per-row
        # rather than killing the job
        return self._col(node).try_cast("double")


def validate_expr(expression: str) -> None:
    """Parse-check an expr string WITHOUT building Columns (no session
    needed) — a config loader fails at build time exactly where Go's
    filterexpr.NewMatcher compile fails. Same AST parser the runtime
    compiler consumes, so the two can never drift. Note NewMatcher("foo")
    COMPILES in Go (the non-boolean error is a runtime one) — mirrored
    here: bare literals validate, and expr_predicate raises instead."""
    _ExprAst(_tokenize(expression)).parse()


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
    ast = _ExprAst(_tokenize(expression)).parse()
    return _ExprCompiler(name_col, attr_cols, attrs_col).compile(ast)
