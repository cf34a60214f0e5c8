"""Attributes processor golden cases with a plain-pandas oracle.

Mirrors processor/attributesprocessor/attributes_log_test.go:35-179 (table
cases through a configured processor, compare whole attribute maps) and the
action semantics of processor/processorhelper/attraction.go:87-285.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from opentelemetry_collector_spark.operators.attributes import Action, apply_actions
from opentelemetry_collector_spark.operators.filters import MatchProperties


def oracle_apply(attrs: dict[str, str] | None, actions: list[Action]) -> dict[str, str]:
    """Reference reimplementation of attraction.go:215-285 over a dict."""
    m = dict(attrs or {})
    for a in actions:
        if a.action == "delete":
            m.pop(a.key, None)
        elif a.action == "hash":
            if a.key in m:
                algo = {"sha1": hashlib.sha1, "md5": hashlib.md5, "sha256": hashlib.sha256}[a.algorithm]
                m[a.key] = algo(m[a.key].encode()).hexdigest()
        elif a.action == "extract":
            src = m.get(a.key)
            if src is not None:
                mt = re.search(a.pattern, src)
                if mt:
                    for name, val in mt.groupdict().items():
                        m[name] = val if val is not None else ""
        else:
            if a.value is not None:
                val = str(a.value) if not isinstance(a.value, bool) else str(a.value).lower()
            elif a.from_attribute in m:
                val = m[a.from_attribute]
            else:
                continue  # missing source => no-op (attraction.go:250-257)
            if a.action == "insert" and a.key in m:
                continue
            if a.action == "update" and a.key not in m:
                continue
            m[a.key] = val
    return m


CASES = [
    ("insert_literal", {"a": "1"}, [Action("b", "insert", value="x")]),
    ("insert_existing_noop", {"a": "1"}, [Action("a", "insert", value="x")]),
    ("insert_from_attribute", {"a": "1"}, [Action("b", "insert", from_attribute="a")]),
    ("insert_from_missing_noop", {"a": "1"}, [Action("b", "insert", from_attribute="zz")]),
    ("update_existing", {"a": "1"}, [Action("a", "update", value="2")]),
    ("update_absent_noop", {"a": "1"}, [Action("b", "update", value="2")]),
    ("upsert_new", {"a": "1"}, [Action("b", "upsert", value="2")]),
    ("upsert_overwrite", {"a": "1"}, [Action("a", "upsert", value="2")]),
    ("delete", {"a": "1", "b": "2"}, [Action("a", "delete")]),
    ("delete_absent_noop", {"a": "1"}, [Action("z", "delete")]),
    ("hash_sha1", {"a": "secret"}, [Action("a", "hash")]),
    ("hash_md5", {"a": "secret"}, [Action("a", "hash", algorithm="md5")]),
    ("hash_absent_noop", {"a": "1"}, [Action("z", "hash")]),
    (
        "extract_groups",
        {"name": "GET /api/v1/users/42"},
        [Action("name", "extract", pattern=r"/api/v(?P<version>\d+)/users/(?P<uid>\d+)")],
    ),
    (
        "extract_no_match_noop",
        {"name": "PING"},
        [Action("name", "extract", pattern=r"/api/v(?P<version>\d+)")],
    ),
    (
        "ordered_chain",
        {"a": "1"},
        [
            Action("b", "upsert", value="2"),
            Action("c", "insert", from_attribute="b"),
            Action("b", "delete"),
            Action("c", "hash"),
        ],
    ),
    ("empty_map_insert", {}, [Action("k", "insert", value="v")]),
    ("null_map_insert", None, [Action("k", "insert", value="v")]),
]


@pytest.mark.parametrize("name,attrs,actions", CASES, ids=[c[0] for c in CASES])
def test_action_matrix_vs_pandas_oracle(spark, name, attrs, actions):
    df = spark.createDataFrame([("r1", attrs)], "id string, attrs map<string,string>")
    got = apply_actions(df, actions).collect()[0].attrs
    assert dict(got or {}) == oracle_apply(attrs, actions)


def test_include_exclude_gating(spark):
    # attributes_log.go:66-86 — unmatched rows pass through untouched
    df = spark.createDataFrame(
        [("user", {"a": "1"}), ("tool", {"a": "1"})], "role string, attrs map<string,string>"
    )
    out = apply_actions(
        df,
        [Action("b", "upsert", value="set")],
        include=MatchProperties(columns={"role": ["user"]}),
    )
    got = {r.role: dict(r.attrs) for r in out.collect()}
    assert got["user"] == {"a": "1", "b": "set"}
    assert got["tool"] == {"a": "1"}


def test_sha1_matches_hashlib(spark):
    df = spark.createDataFrame([("x", {"k": "hello world"})], "id string, attrs map<string,string>")
    got = apply_actions(df, [Action("k", "hash")]).collect()[0].attrs["k"]
    assert got == hashlib.sha1(b"hello world").hexdigest()


def test_validation_errors():
    with pytest.raises(ValueError):
        Action("k", "insert").validate()  # neither value nor from_attribute
    with pytest.raises(ValueError):
        Action("k", "insert", value="v", from_attribute="a").validate()  # both
    with pytest.raises(ValueError):
        Action("k", "delete", value="v").validate()
    with pytest.raises(ValueError):
        Action("k", "extract").validate()  # no pattern
    with pytest.raises(ValueError):
        Action("k", "extract", pattern=r"(\d+)").validate()  # unnamed group
    with pytest.raises(ValueError):
        Action("k", "extract", pattern=r"(?P<a>\d)(\d)").validate()  # mixed
    with pytest.raises(ValueError):
        Action("k", "frobnicate").validate()


def test_bool_and_numeric_literals_canonicalized(spark):
    df = spark.createDataFrame([("x", {})], "id string, attrs map<string,string>")
    out = apply_actions(
        df,
        [
            Action("b", "upsert", value=True),
            Action("i", "upsert", value=42),
            Action("f", "upsert", value=1.5),
        ],
    ).collect()[0].attrs
    assert dict(out) == {"b": "true", "i": "42", "f": "1.5"}


def test_hash_action_rejects_unknown_algorithm():
    import pytest

    from opentelemetry_collector_spark.operators.attributes import Action

    with pytest.raises(ValueError, match="algorithm"):
        Action(key="k", action="hash", algorithm="sha512").validate()


def test_attr_cardinality_report(spark):
    from pyspark.sql import functions as F
    from opentelemetry_collector_spark.operators.attributes import attr_cardinality

    rows = [
        ({"env": "prod", "req_id": "r1"},),
        ({"env": "prod", "req_id": "r2"},),
        ({"env": "dev", "req_id": "r3"},),
        ({"env": "prod"},),
        ({"env": None},),                      # NULL value = absent attr
    ]
    df = spark.createDataFrame(rows, "attrs map<string,string>")
    got = {r["attr_key"]: (r["n_rows"], r["n_distinct"], r["top_value"],
                           r["top_count"], r["at_risk"])
           for r in attr_cardinality(df, risk_pm=900).collect()}
    # env: 4 carrying rows (NULL dropped), 2 distinct, prod dominates
    assert got["env"] == (4, 2, "prod", 3, False)
    # req_id: unique per row -> cardinality bomb at 900 per-mille
    assert got["req_id"] == (3, 3, "r1", 1, True)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="risk_pm"):
        attr_cardinality(df, risk_pm=0)


def test_attr_cardinality_top_tie_breaks_to_lesser_value(spark):
    from opentelemetry_collector_spark.operators.attributes import attr_cardinality

    rows = [({"k": "b"},), ({"k": "a"},), ({"k": "a"},), ({"k": "b"},)]
    df = spark.createDataFrame(rows, "attrs map<string,string>")
    r = attr_cardinality(df).collect()[0]
    assert (r["top_value"], r["top_count"]) == ("a", 2)


def test_attr_cardinality_partial_agg_plan(spark):
    """The corpus-sized shuffle must carry (key, value) partials — map-side
    collapse before the exchange; the key rollup is the second aggregate."""
    from opentelemetry_collector_spark.operators.attributes import attr_cardinality

    df = spark.createDataFrame([({"k": "v"},)], "attrs map<string,string>")
    plan = (attr_cardinality(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") == 2
