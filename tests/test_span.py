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
