"""expr mini-language tests (internal/processor/filterexpr/matcher.go).

The Go matcher evaluates `MetricName == '...' && HasLabel('k')` style
expressions per datapoint in an expr VM; ours compiles once to Catalyst
predicates. Cases mirror matcher_test.go's shapes over transcript columns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.filters import expr_predicate


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("c1", "user", None, {"k": "v"}),
        ("c2", "assistant", "calc", {}),
        ("c3", "tool", "search", {"k": "other"}),
        ("c4", "tool", "calc", None),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, role string, tool string, attrs map<string,string>"
    )


def _ids(df, pred):
    return {r.conv_id for r in df.filter(pred).collect()}


def test_name_equality(df):
    assert _ids(df, expr_predicate('Name == "user"', name_col="role")) == {"c1"}


def test_or_and_grouping(df):
    p = expr_predicate('Name == "user" || (HasAttr("tool") && Attr("tool") != "calc")',
                       name_col="role", attr_cols={"tool": "tool"})
    assert _ids(df, p) == {"c1", "c3"}


def test_not_and_regex_match(df):
    p = expr_predicate('!(Name =~ "user|assistant")', name_col="role")
    assert _ids(df, p) == {"c3", "c4"}


def test_attrs_map_fallback(df):
    p = expr_predicate('HasLabel("k") && Label("k") == "v"', name_col="role")
    assert _ids(df, p) == {"c1"}
    # null attrs map never matches HasLabel (attributematcher.go:83-114)
    assert _ids(df, expr_predicate('HasLabel("k")', name_col="role")) == {"c1", "c3"}


def test_neq_on_missing_reads_empty_string_like_reference_env(df):
    # the reference env's Label(k) returns "" for a missing key
    # (filterexpr/matcher.go:159-162: `v, _ := labelsMap.Get(k)`), so
    # `Attr("tool") != "calc"` evaluates "" != "calc" = true and KEEPS the
    # NULL-tool row c1 — a bare NULL comparison would silently drop it
    p = expr_predicate('Attr("tool") != "calc"', name_col="role", attr_cols={"tool": "tool"})
    ids = _ids(df, p)
    assert "c3" in ids and "c1" in ids
    # and == against "" matches ONLY missing/empty values
    p2 = expr_predicate('Attr("tool") == ""', name_col="role", attr_cols={"tool": "tool"})
    assert "c1" in _ids(df, p2)


def test_metricname_alias(df):
    assert _ids(df, expr_predicate('MetricName == "tool"', name_col="role")) == {"c3", "c4"}


@pytest.mark.parametrize(
    "bad",
    ['Name ==', 'Unknown("x")', 'Attr(Name)', '"a" @@ "b"', 'Name == "a") extra', 'Name =~ Name'],
)
def test_parse_errors(bad):
    with pytest.raises(ValueError):
        expr_predicate(bad, name_col="role")


def test_escaped_quotes():
    p = expr_predicate('Name == "say \\"hi\\""', name_col="role")
    assert 'say "hi"' in str(p._jc)


# ---------------------------------------------------------------------------
# The reference's own matcher_test.go table, ported
# (internal/processor/filterexpr/matcher_test.go)
# ---------------------------------------------------------------------------


def test_go_table_empty_expression_fails_compile():
    from opentelemetry_collector_spark.operators.filters import validate_expr

    with pytest.raises(ValueError):
        validate_expr("")


def test_go_table_nonboolean_compiles_but_fails_at_match(df):
    # NewMatcher("foo") succeeds in Go; the non-bool error is a RUNTIME one
    from opentelemetry_collector_spark.operators.filters import validate_expr

    validate_expr('"foo"')  # compile ok
    with pytest.raises(ValueError, match="boolean"):
        expr_predicate('"foo"', name_col="role")


def test_go_table_metric_name_single_quotes(df):
    # `MetricName == 'my.metric'` — expr accepts single-quoted strings
    assert _ids(df, expr_predicate("MetricName == 'user'", name_col="role")) == {"c1"}
    assert _ids(df, expr_predicate("MetricName == 'nope'", name_col="role")) == set()


def test_go_table_name_and_haslabel(df):
    # `MetricName == 'my.metric' && HasLabel("foo")`: empty-VALUED label
    # still counts as present (the Go test plants {"foo": ""})
    got = _ids(df, expr_predicate('MetricName == \'user\' && HasLabel("k")', name_col="role"))
    assert got == {"c1"}
    got = _ids(df, expr_predicate('MetricName == \'tool\' && HasLabel("k")', name_col="role"))
    assert got == {"c3"}


def test_go_table_label_value_mismatch(df):
    # `Label("foo") == "bar"` with foo="" -> no match
    got = _ids(df, expr_predicate('MetricName == \'user\' && Attr("k") == "bar"', name_col="role"))
    assert got == set()


# ---------------------------------------------------------------------------
# The extended expr subset: arithmetic, ordered compares, in, string builtins
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ndf(spark):
    rows = [
        ("c1", "alpha", "10"),
        ("c2", "beta", "2.5"),
        ("c3", "alphabet", None),
    ]
    return spark.createDataFrame(rows, "conv_id string, name string, score string")


def test_arithmetic_and_ordered_comparison(ndf):
    p = expr_predicate('Attr("score") * 2 + 1 > 6', name_col="name", attrs_col="attrs",
                       attr_cols={"score": "score"})
    assert _ids(ndf, p) == {"c1"}  # 10*2+1=21 > 6; 2.5*2+1=6 is NOT > 6; NULL drops
    p = expr_predicate('Attr("score") * 2 + 1 >= 6', name_col="name", attrs_col="attrs",
                       attr_cols={"score": "score"})
    assert _ids(ndf, p) == {"c1", "c2"}


def test_in_membership_and_negation(ndf):
    assert _ids(ndf, expr_predicate('Name in ["alpha", "beta"]', name_col="name")) == {"c1", "c2"}
    assert _ids(ndf, expr_predicate('Name not in ["alpha", "beta"]', name_col="name")) == {"c3"}
    p = expr_predicate('Attr("score") in [10, 99]', name_col="name",
                       attr_cols={"score": "score"})
    assert _ids(ndf, p) == {"c1"}  # numeric list: "10" casts and matches 10


def test_string_builtins_infix(ndf):
    assert _ids(ndf, expr_predicate('Name startsWith "alpha"', name_col="name")) == {"c1", "c3"}
    assert _ids(ndf, expr_predicate('Name endsWith "bet"', name_col="name")) == {"c3"}
    assert _ids(ndf, expr_predicate('Name contains "phab"', name_col="name")) == {"c3"}
    assert _ids(ndf, expr_predicate('Name matches "^(al|be)"', name_col="name")) == {"c1", "c2", "c3"}


def test_word_booleans_and_len(ndf):
    got = _ids(ndf, expr_predicate('not (Name == "alpha" or Name == "beta")', name_col="name"))
    assert got == {"c3"}
    assert _ids(ndf, expr_predicate("len(Name) >= 8", name_col="name")) == {"c3"}


def test_numeric_compare_on_missing_drops_row(ndf):
    # score NULL reads as "" -> cast double NULL -> comparison false (drop)
    p = expr_predicate('Attr("score") > 1', name_col="name", attr_cols={"score": "score"})
    assert _ids(ndf, p) == {"c1", "c2"}


def test_unary_minus_and_modulo(ndf):
    p = expr_predicate('Attr("score") % 3 == 1 && -Attr("score") < 0',
                       name_col="name", attr_cols={"score": "score"})
    assert _ids(ndf, p) == {"c1"}
