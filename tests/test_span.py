"""Span processor name<->attributes transforms (processor/spanprocessor/span.go:82-221)."""

from __future__ import annotations

from opentelemetry_collector_spark.operators.span import from_attributes, to_attributes


def test_from_attributes_joins_when_all_present(spark):
    df = spark.createDataFrame(
        [("orig", {"svc": "api", "op": "get"}), ("keep", {"svc": "api"})],
        "name string, attrs map<string,string>",
    )
    out = from_attributes(df, keys=["svc", "op"], separator="::", name_col="name")
    got = {r.name for r in out.collect()}
    # span.go:105-156 — abort (keep original) if ANY key missing
    assert got == {"api::get", "keep"}


def test_to_attributes_placeholder_rewrite(spark):
    df = spark.createDataFrame([("GET /api/users/42/details",)], "name string")
    out = to_attributes(df, patterns=[r"/api/users/(?P<uid>\d+)/"], name_col="name").collect()[0]
    # span.go:191-205 — matched group substring replaced by {group}
    assert out.name == "GET /api/users/{uid}/details"
    assert dict(out.attrs) == {"uid": "42"}


def test_to_attributes_multiple_groups(spark):
    df = spark.createDataFrame([("GET /v2/users/7",)], "name string")
    out = to_attributes(
        df, patterns=[r"/v(?P<version>\d+)/users/(?P<uid>\d+)"], name_col="name"
    ).collect()[0]
    assert out.name == "GET /v{version}/users/{uid}"
    assert dict(out.attrs) == {"version": "2", "uid": "7"}


def test_to_attributes_sequential_rules(spark):
    df = spark.createDataFrame([("span A1 B2",)], "name string")
    out = to_attributes(
        df, patterns=[r"A(?P<a>\d)", r"B(?P<b>\d)"], name_col="name"
    ).collect()[0]
    assert out.name == "span A{a} B{b}"
    assert dict(out.attrs) == {"a": "1", "b": "2"}


def test_to_attributes_break_after_match(spark):
    df = spark.createDataFrame([("span A1 B2",)], "name string")
    out = to_attributes(
        df, patterns=[r"A(?P<a>\d)", r"B(?P<b>\d)"], name_col="name", break_after_match=True
    ).collect()[0]
    assert out.name == "span A{a} B2"
    assert dict(out.attrs) == {"a": "1"}


def test_to_attributes_no_match_passthrough(spark):
    df = spark.createDataFrame([("untouched",)], "name string")
    out = to_attributes(df, patterns=[r"X(?P<x>\d)"], name_col="name").collect()[0]
    assert out.name == "untouched"
    assert dict(out.attrs or {}) == {}


def test_to_attributes_rewrites_first_occurrence_only(spark):
    # span.go uses FindStringSubmatchIndex: only the FIRST match is
    # rewritten; a bare regexp_replace would produce "a{id}b{id}" while the
    # stored attr (first match) said id=1 — name and attrs must agree
    df = spark.createDataFrame([("a1b2",)], "name string")
    out = to_attributes(df, patterns=[r"(?P<id>\d+)"], name_col="name").collect()[0]
    assert out.name == "a{id}b2"
    assert dict(out.attrs) == {"id": "1"}


def test_to_attributes_nested_group_in_segment_extracts_correct_value(spark):
    # an unnamed capture group before the named one used to shift the
    # group index silently, storing 'a' instead of the digits
    df = spark.createDataFrame([("xa42y",)], "name string")
    out = to_attributes(df, patterns=[r"(a|b)(?P<g>\d+)"], name_col="name").collect()[0]
    assert dict(out.attrs) == {"g": "42"}
    assert out.name == "xa{g}y"


def test_to_attributes_nested_group_inside_named_body(spark):
    df = spark.createDataFrame([("id=abc123",)], "name string")
    out = to_attributes(df, patterns=[r"id=(?P<v>(abc|def)\d+)"], name_col="name").collect()[0]
    assert dict(out.attrs) == {"v": "abc123"}
    assert out.name == "id={v}"


def test_to_attributes_rejects_unsupported_shapes(spark):
    import pytest

    df = spark.createDataFrame([("x",)], "name string")
    # top-level alternation: segment wrapping would turn it into a
    # concatenation that never matches
    with pytest.raises(ValueError, match="alternation"):
        to_attributes(df, patterns=[r"(?P<a>x)|(?P<b>y)"], name_col="name")
    # quantifier applying to the named group: no single substring to rewrite
    with pytest.raises(ValueError, match="quantifier"):
        to_attributes(df, patterns=[r"(?P<g>\d+)?end"], name_col="name")
