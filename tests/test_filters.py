"""Filter processor golden cases.

Modeled on the reference's table-driven tests
(processor/filterprocessor/filter_processor_test.go, configs
processor/filterprocessor/testdata/config_strict.yaml / config_regexp.yaml).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.filters import (
    REGEXP,
    STRICT,
    MatchProperties,
    filter_records,
    filterset_predicate,
    match_predicate,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, role string, text string, attrs map<string,string>"
    )


ROWS = [
    ("c1", "user", "hello", {"env": "prod"}),
    ("c1", "assistant", "tool_call: calc(1)", {"env": "dev"}),
    ("c2", "tool", "error code=500", {}),
    ("c2", "system", "boot", None),
]


def test_strict_include(spark):
    df = _df(spark, ROWS)
    out = filter_records(df, include=MatchProperties(columns={"role": ["user", "tool"]}))
    assert {r.role for r in out.collect()} == {"user", "tool"}


def test_strict_exclude(spark):
    df = _df(spark, ROWS)
    out = filter_records(df, exclude=MatchProperties(columns={"role": ["system"]}))
    assert out.count() == 3


def test_regexp_find_anywhere_semantics(spark):
    # regexpfilterset.go:64 — unanchored MatchString: a substring pattern
    # matches (the :79 "automatically anchored" comment is contradicted by
    # the code and by filter_processor_test.go:111-127's golden expectations)
    df = _df(spark, ROWS)
    out = filter_records(df, include=MatchProperties(match_type=REGEXP, columns={"text": ["error"]}))
    assert out.count() == 1  # substring match on "error code=500"
    # explicit anchors still give full-match when the caller wants it
    out2 = filter_records(
        df, include=MatchProperties(match_type=REGEXP, columns={"text": [r"^code=\d+$"]})
    )
    assert out2.count() == 0
    out3 = filter_records(
        df, include=MatchProperties(match_type=REGEXP, columns={"text": [r"^error code=\d+$"]})
    )
    assert out3.count() == 1


def test_regexp_alternation(spark):
    df = _df(spark, ROWS)
    out = filter_records(
        df, include=MatchProperties(match_type=REGEXP, columns={"text": ["hello", "boot"]})
    )
    assert out.count() == 2


def test_attribute_match_key_exists(spark):
    # attributematcher.go:96-100 — value None means key must exist
    df = _df(spark, ROWS)
    out = filter_records(df, include=MatchProperties(attributes={"env": None}))
    assert out.count() == 2


def test_attribute_match_value(spark):
    df = _df(spark, ROWS)
    out = filter_records(df, include=MatchProperties(attributes={"env": "prod"}))
    assert out.count() == 1


def test_empty_attrs_never_match_nonempty_spec(spark):
    # attributematcher.go:83-114 — empty/null map never matches a non-empty spec
    df = _df(spark, [("c", "r", "t", {}), ("c", "r", "t", None)])
    out = filter_records(df, include=MatchProperties(attributes={"k": None}))
    assert out.count() == 0


def test_include_then_exclude_protocol(spark):
    # filterspan.go:90-106 — include mismatch skips, then exclude match skips
    df = _df(spark, ROWS)
    out = filter_records(
        df,
        include=MatchProperties(columns={"role": ["user", "assistant"]}),
        exclude=MatchProperties(attributes={"env": "dev"}),
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].role == "user"


def test_empty_filterset_matches_nothing(spark):
    df = _df(spark, ROWS)
    assert df.filter(filterset_predicate(F.col("role"), [], STRICT)).count() == 0


def test_no_specs_matches_everything(spark):
    df = _df(spark, ROWS)
    assert df.filter(match_predicate(None, None)).count() == len(ROWS)


def test_unknown_match_type_raises():
    with pytest.raises(ValueError):
        filterset_predicate(F.col("x"), ["a"], "fuzzy")


def test_exclude_spec_keeps_null_column_rows(spark):
    """Three-valued-logic hole: role=NULL made the exclude predicate NULL
    (not False), and `include & ~NULL` silently DROPPED rows the exclude
    never matched — the reference keeps them (a missing/NULL value does
    not match any filterset)."""
    from opentelemetry_collector_spark.operators.filters import (
        MatchProperties,
        filter_records,
    )

    df = spark.createDataFrame(
        [("c1", None), ("c2", "assistant"), ("c3", "user")],
        "conv_id string, role string",
    )
    out = filter_records(df, exclude=MatchProperties(columns={"role": ["assistant"]}))
    assert {r.conv_id for r in out.collect()} == {"c1", "c3"}
    # regexp flavor, same hole
    out2 = filter_records(
        df, exclude=MatchProperties(columns={"role": ["^assi"]}, match_type="regexp")
    )
    assert {r.conv_id for r in out2.collect()} == {"c1", "c3"}
