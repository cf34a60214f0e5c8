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
