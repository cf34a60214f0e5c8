"""Golden-parity tests ported from the reference's own test tables.

Each case cites the Go test it reproduces; inputs and expected outputs are
copied VALUES (public test vectors), evaluated through our Spark operators:

- SHA-1 hash digests per value type
  (processor/attributesprocessor/attributes_log_test.go:309-375 TestLogAttributes_Hash)
- attributes-processor include/exclude gating tables
  (attributes_log_test.go:121-306 TestAttributes_FilterLogs*)
- filter-processor metric-name include/exclude tables
  (processor/filterprocessor/filter_processor_test.go:50-163 standardTests)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.hashing import sha1_typed
from opentelemetry_collector_spark.operators.attributes import Action, apply_actions
from opentelemetry_collector_spark.operators.filters import (
    REGEXP,
    STRICT,
    MatchProperties,
    filter_records,
)


# ---------------------------------------------------------------------------
# TestLogAttributes_Hash — exact digests from the Go table
# ---------------------------------------------------------------------------


def test_hash_golden_digests(spark):
    df = spark.createDataFrame(
        [("john.doe@example.com", 10, 99.1, True)],
        "email string, uid long, balance double, authed boolean",
    )
    row = df.select(
        sha1_typed(F.col("email"), "string").alias("hs"),
        sha1_typed(F.col("uid"), "int").alias("hi"),
        sha1_typed(F.col("balance"), "double").alias("hd"),
        sha1_typed(F.col("authed"), "bool").alias("hb"),
    ).collect()[0]
    # attributes_log_test.go:311-351 expected values (hasher.go byte layouts)
    assert row.hs == "73ec53c4ba1747d485ae2a0d7bfafa6cda80a5a9"
    assert row.hi == "71aa908aff1548c8c6cdecf63545261584738a25"
    assert row.hd == "76429edab4855b03073f9429fd5d10313c28655e"
    assert row.hb == "bf8b4530d8d246dd74ac53a13471bba17941dff7"


# ---------------------------------------------------------------------------
# TestAttributes_FilterLogs* — include/exclude gating tables
# The Go cases carry (log name, input attrs) -> expected attrs; the action is
# always {key: attribute1, action: INSERT, value: 123}.
# ---------------------------------------------------------------------------

_INSERT_123 = [Action("attribute1", "insert", value=123)]


def _run_gating(spark, cases, include, exclude):
    rows = [(name, attrs) for name, attrs, _ in cases]
    df = spark.createDataFrame(rows, "name string, attrs map<string,string>")
    out = apply_actions(df, _INSERT_123, include=include, exclude=exclude)
    got = {r.name: dict(r.attrs or {}) for r in out.collect()}
    for name, _, expected in cases:
        assert got[name] == expected, f"case {name!r}: {got[name]} != {expected}"


def test_filter_logs_regex_include_attr_exclude(spark):
    """attributes_log_test.go:121-179 TestAttributes_FilterLogs:
    include = log name =~ ^[^i].*   exclude = attr NoModification == true."""
    cases = [
        ("apply processor", {}, {"attribute1": "123"}),
        (
            "different value for exclude property",
            {"NoModification": "false"},
            {"attribute1": "123", "NoModification": "false"},
        ),
        ("incorrect name for include property", {}, {}),
        ("attribute match for exclude property", {"NoModification": "true"}, {"NoModification": "true"}),
    ]
    _run_gating(
        spark,
        cases,
        include=MatchProperties(match_type=REGEXP, columns={"name": [r"^[^i].*"]}),
        exclude=MatchProperties(match_type=STRICT, attributes={"NoModification": True}),
    )


def test_filter_logs_by_name_strict(spark):
    """attributes_log_test.go:181-243 TestAttributes_FilterLogsByNameStrict:
    include = name in {apply, dont_apply}, exclude = name in {dont_apply}."""
    cases = [
        ("apply", {}, {"attribute1": "123"}),
        ("incorrect_log_name", {}, {}),
        ("dont_apply", {}, {}),
        ("incorrect_log_name_with_attr", {"NoModification": "true"}, {"NoModification": "true"}),
    ]
    _run_gating(
        spark,
        cases,
        include=MatchProperties(match_type=STRICT, columns={"name": ["apply", "dont_apply"]}),
        exclude=MatchProperties(match_type=STRICT, columns={"name": ["dont_apply"]}),
    )
    # the second "apply" row of the Go table (same name, with an attr)
    _run_gating(
        spark,
        [("apply", {"NoModification": "false"}, {"attribute1": "123", "NoModification": "false"})],
        include=MatchProperties(match_type=STRICT, columns={"name": ["apply", "dont_apply"]}),
        exclude=MatchProperties(match_type=STRICT, columns={"name": ["dont_apply"]}),
    )


def test_filter_logs_by_name_regexp(spark):
    """attributes_log_test.go:244-306 TestAttributes_FilterLogsByNameRegexp:
    include = name =~ ^apply.*, exclude = name =~ .*dont_apply$."""
    cases = [
        ("apply_to_log_with_no_attrs", {}, {"attribute1": "123"}),
        (
            "apply_to_log_with_attr",
            {"NoModification": "false"},
            {"attribute1": "123", "NoModification": "false"},
        ),
        ("incorrect_log_name", {}, {}),
        ("apply_dont_apply", {}, {}),
        ("incorrect_log_name_with_attr", {"NoModification": "true"}, {"NoModification": "true"}),
    ]
    _run_gating(
        spark,
        cases,
        include=MatchProperties(match_type=REGEXP, columns={"name": [r"^apply.*"]}),
        exclude=MatchProperties(match_type=REGEXP, columns={"name": [r".*dont_apply$"]}),
    )


# ---------------------------------------------------------------------------
# filter_processor_test.go standardTests — metric-name filtersets
# ---------------------------------------------------------------------------

VALID_FILTERS = [
    "prefix/.*",
    "prefix_.*",
    ".*/suffix",
    ".*_suffix",
    ".*/contains/.*",
    ".*_contains_.*",
    "full/name/match",
    "full_name_match",
]

IN_METRIC_NAMES = [
    "full_name_match",
    "not_exact_string_match",
    "prefix/test/match",
    "prefix_test_match",
    "prefixprefix/test/match",
    "test/match/suffix",
    "test_match_suffix",
    "test/match/suffixsuffix",
    "test/contains/match",
    "test_contains_match",
    "random",
    "full/name/match",
    "full_name_match",  # repeats preserved
    "not_exact_string_match",
]


def _metric_df(spark):
    return spark.createDataFrame([(i, n) for i, n in enumerate(IN_METRIC_NAMES)], "i int, metric string")


def _out_names(df):
    return [r.metric for r in df.orderBy("i").collect()]


def test_filterprocessor_include_regexp(spark):
    out = filter_records(
        _metric_df(spark),
        include=MatchProperties(match_type=REGEXP, columns={"metric": VALID_FILTERS}),
    )
    assert _out_names(out) == [
        "full_name_match",
        "prefix/test/match",
        "prefix_test_match",
        "prefixprefix/test/match",
        "test/match/suffix",
        "test_match_suffix",
        "test/match/suffixsuffix",
        "test/contains/match",
        "test_contains_match",
        "full/name/match",
        "full_name_match",
    ]


def test_filterprocessor_exclude_regexp(spark):
    out = filter_records(
        _metric_df(spark),
        exclude=MatchProperties(match_type=REGEXP, columns={"metric": VALID_FILTERS}),
    )
    assert _out_names(out) == ["not_exact_string_match", "random", "not_exact_string_match"]


def test_filterprocessor_include_and_exclude(spark):
    out = filter_records(
        _metric_df(spark),
        include=MatchProperties(match_type=REGEXP, columns={"metric": VALID_FILTERS}),
        exclude=MatchProperties(
            match_type=STRICT, columns={"metric": ["prefix_test_match", "test_contains_match"]}
        ),
    )
    assert _out_names(out) == [
        "full_name_match",
        "prefix/test/match",
        "prefixprefix/test/match",
        "test/match/suffix",
        "test_match_suffix",
        "test/match/suffixsuffix",
        "test/contains/match",
        "full/name/match",
        "full_name_match",
    ]


# ---------------------------------------------------------------------------
# span_test.go — to_attributes / from_attributes golden tables
# ---------------------------------------------------------------------------

from opentelemetry_collector_spark.operators.span import from_attributes, to_attributes


def _span_df(spark, name, attrs):
    return spark.createDataFrame([(name, attrs)], "name string, attrs map<string,string>")


@pytest.mark.parametrize(
    "rules, brk, in_name, out_name, out_attrs",
    [
        # span_test.go:333-401 TestSpanProcessor_ToAttributes
        (
            [r"^\/api\/v1\/document\/(?P<documentId>.*)\/update\/1$"],
            False,
            "/api/v1/document/321083210/update/1",
            "/api/v1/document/{documentId}/update/1",
            {"documentId": "321083210"},
        ),
        (
            [r"^\/api\/(?P<version>.*)\/document\/(?P<documentId>.*)\/update\/2$"],
            False,
            "/api/v1/document/321083210/update/2",
            "/api/{version}/document/{documentId}/update/2",
            {"documentId": "321083210", "version": "v1"},
        ),
        (
            [
                r"^\/api\/.*\/document\/(?P<documentId>.*)\/update\/3$",
                r"^\/api\/(?P<version>.*)\/document\/.*\/update\/3$",
            ],
            False,
            "/api/v1/document/321083210/update/3",
            "/api/{version}/document/{documentId}/update/3",
            {"documentId": "321083210", "version": "v1"},
        ),
        (
            [
                r"^\/api\/v1\/document\/(?P<documentId>.*)\/update\/4$",
                r"^\/api\/(?P<version>.*)\/document\/(?P<documentId>.*)\/update\/4$",
            ],
            True,  # break_after_match: second rule must not fire
            "/api/v1/document/321083210/update/4",
            "/api/v1/document/{documentId}/update/4",
            {"documentId": "321083210"},
        ),
        (["rule"], False, "", "", {}),
    ],
)
def test_span_to_attributes_golden(spark, rules, brk, in_name, out_name, out_attrs):
    df = _span_df(spark, in_name, {})
    got = to_attributes(df, patterns=rules, name_col="name", break_after_match=brk).collect()[0]
    assert got.name == out_name
    assert dict(got.attrs or {}) == out_attrs


@pytest.mark.parametrize(
    "in_name, attrs, out_name",
    [
        # span_test.go:144-211 TestSpanProcessor_Values (canonical stringify)
        ("string-type", {"key1": "bob"}, "bob"),
        ("int-type", {"key1": "123"}, "123"),
        ("double-type", {"key1": "234.129312"}, "234.129312"),
        ("bool-type", {"key1": "true"}, "true"),
        ("empty-attributes", {}, "empty-attributes"),
    ],
)
def test_span_from_attributes_values_golden(spark, in_name, attrs, out_name):
    df = _span_df(spark, in_name, attrs)
    got = from_attributes(df, keys=["key1"], name_col="name").collect()[0]
    assert got.name == out_name


def test_span_from_attributes_missing_keys_golden(spark):
    """span_test.go:245-307 TestSpanProcessor_MissingKeys: ANY missing key
    aborts the rename; all present -> keys joined with '::'."""
    full = {"key1": "bob", "key2": "123", "key3": "234.129312", "key4": "true"}
    cases = [
        ("first-keys-missing", {k: v for k, v in full.items() if k != "key1"}, "first-keys-missing"),
        ("middle-key-missing", {k: v for k, v in full.items() if k != "key3"}, "middle-key-missing"),
        ("last-key-missing", {k: v for k, v in full.items() if k != "key4"}, "last-key-missing"),
        ("all-keys-exists", full, "bob::123::234.129312::true"),
    ]
    for in_name, attrs, out_name in cases:
        df = _span_df(spark, in_name, attrs)
        got = from_attributes(
            df, keys=["key1", "key2", "key3", "key4"], separator="::", name_col="name"
        ).collect()[0]
        assert got.name == out_name, in_name


# splitlogs_test.go — batch split golden sequences


def _split_names(spark, records, split_size):
    """records: list of (resource, name) in pdata order. Returns the list of
    per-batch name sequences produced by split_batches."""
    from opentelemetry_collector_spark.operators.batch import split_batches

    rows = [(res, i, name) for i, (res, name) in enumerate(records)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, name string")
    out = split_batches(df, split_size).collect()
    batches = {}
    for r in sorted(out, key=lambda r: (r.batch_id, r.conv_id, r.turn_idx)):
        batches.setdefault(r.batch_id, []).append(r.name)
    return [batches[b] for b in sorted(batches)]


def test_splitlogs_same_resource_golden(spark):
    """splitlogs_test.go:36-77 TestSplitLogs: 20 records one resource,
    split=5 -> four batches of exactly [test-log-int-0-(5k)..(5k+4)]."""
    recs = [("res0", f"test-log-int-0-{i}") for i in range(20)]
    got = _split_names(spark, recs, 5)
    assert got == [[f"test-log-int-0-{5 * b + j}" for j in range(5)] for b in range(4)]


def test_splitlogs_multiple_resource_golden(spark):
    """splitlogs_test.go:79-101: two resources x 20 records, split=5 ->
    first batch is resource 0's records 0-4 only."""
    recs = [("res0", f"test-log-int-0-{i}") for i in range(20)] + [
        ("res1", f"test-log-int-1-{i}") for i in range(20)
    ]
    got = _split_names(spark, recs, 5)
    assert got[0] == [f"test-log-int-0-{i}" for i in range(5)]
    assert len(got) == 8 and all(len(b) == 5 for b in got)


def test_splitlogs_split_greater_than_resource_golden(spark):
    """splitlogs_test.go:103-121 split_size_greater_than_log_size: split=25
    over 2x20 -> first batch = all of resource 0 plus resource 1's first 5
    (a ResourceLogs straddles the cut), remainder 15."""
    recs = [("res0", f"test-log-int-0-{i}") for i in range(20)] + [
        ("res1", f"test-log-int-1-{i}") for i in range(20)
    ]
    got = _split_names(spark, recs, 25)
    assert got[0] == [f"test-log-int-0-{i}" for i in range(20)] + [
        f"test-log-int-1-{i}" for i in range(5)
    ]
    assert got[1] == [f"test-log-int-1-{i}" for i in range(5, 20)]


def test_splitlogs_noop_when_fits(spark):
    """splitlogs_test.go:26-34 TestSplitLogs_noop: split >= total leaves one
    batch containing everything."""
    recs = [("res0", f"n{i}") for i in range(20)]
    got = _split_names(spark, recs, 40)
    assert got == [[f"n{i}" for i in range(20)]]


# splittraces_test.go — the span-granularity form of the same stable-order
# cut machinery (splittraces.go:22-70 walks ResourceSpans/ILS/Spans exactly
# like splitLogs walks its log nesting; the counting unit is SPANS). On the
# flattened span frame (zipkin.spans_from_transcripts' shape: one row per
# span, resource == service) split_batches IS splitTraces — these goldens pin
# the Go test sequences over span-frame column names.


def _split_span_names(spark, spans, split_size):
    """spans: list of (service, name) in pdata order -> per-batch name lists."""
    from opentelemetry_collector_spark.operators.batch import split_batches

    rows = [(svc, i, name) for i, (svc, name) in enumerate(spans)]
    df = spark.createDataFrame(rows, "service_name string, span_order int, name string")
    out = split_batches(df, split_size, group_col="service_name", order_col="span_order")
    batches = {}
    for r in sorted(out.collect(), key=lambda r: (r.batch_id, r.service_name, r.span_order)):
        batches.setdefault(r.batch_id, []).append(r.name)
    return [batches[b] for b in sorted(batches)]


def test_splittraces_same_resource_golden(spark):
    """splittraces_test.go:36-77 TestSplitTraces: 20 spans one resource,
    split=5 — the four successive splitTraces calls yield exactly
    test-span-0-(5k)..(5k+4); batch_id k is call k's copy-out."""
    spans = [("svc0", f"test-span-0-{i}") for i in range(20)]
    got = _split_span_names(spark, spans, 5)
    assert got == [[f"test-span-0-{5 * b + j}" for j in range(5)] for b in range(4)]


def test_splittraces_multiple_resource_golden(spark):
    """splittraces_test.go:79-99 MultipleResourceSpans: 2 resources x 20,
    split=5 -> first batch is resource 0's spans 0-4 only."""
    spans = [("svc0", f"test-span-0-{i}") for i in range(20)] + [
        ("svc1", f"test-span-1-{i}") for i in range(20)
    ]
    got = _split_span_names(spark, spans, 5)
    assert got[0] == [f"test-span-0-{i}" for i in range(5)]
    assert len(got) == 8 and all(len(b) == 5 for b in got)


def test_splittraces_split_greater_than_span_size_golden(spark):
    """splittraces_test.go:101-125 SplitSizeGreaterThanSpanSize: split=25
    over 2x20 -> first batch = all of resource 0 plus resource 1's spans 0-4
    (a ResourceSpans straddles the cut), remainder 15."""
    spans = [("svc0", f"test-span-0-{i}") for i in range(20)] + [
        ("svc1", f"test-span-1-{i}") for i in range(20)
    ]
    got = _split_span_names(spark, spans, 25)
    assert got[0] == [f"test-span-0-{i}" for i in range(20)] + [
        f"test-span-1-{i}" for i in range(5)
    ]
    assert got[1] == [f"test-span-1-{i}" for i in range(5, 20)]


def test_splittraces_noop_when_fits(spark):
    """splittraces_test.go:27-34 TestSplitTraces_noop: split >= SpanCount
    leaves one batch containing every span."""
    spans = [("svc0", f"s{i}") for i in range(20)]
    got = _split_span_names(spark, spans, 40)
    assert got == [[f"s{i}" for i in range(20)]]


# attraction_test.go — attribute-action engine golden tables
# (processor/processorhelper/attraction_test.go:49-739; values canonically
# stringified per filtermatcher/attributematcher.go:116-129)


def _attr_case(spark, attrs, actions):
    from opentelemetry_collector_spark.operators.attributes import apply_actions

    df = spark.createDataFrame([("r", attrs)], "id string, attrs map<string,string>")
    return dict(apply_actions(df, actions).collect()[0].attrs or {})


def test_attraction_insert_value_golden(spark):
    """attraction_test.go:49-95 TestAttributes_InsertValue."""
    from opentelemetry_collector_spark.operators.attributes import Action

    acts = [Action("attribute1", "insert", value=123)]
    assert _attr_case(spark, {}, acts) == {"attribute1": "123"}
    assert _attr_case(spark, {"anotherkey": "bob"}, acts) == {
        "anotherkey": "bob",
        "attribute1": "123",
    }
    assert _attr_case(spark, {"attribute1": "bob"}, acts) == {"attribute1": "bob"}


def test_attraction_insert_from_attribute_golden(spark):
    """attraction_test.go:97-157 TestAttributes_InsertFromAttribute."""
    from opentelemetry_collector_spark.operators.attributes import Action

    acts = [Action("string key", "insert", from_attribute="anotherkey")]
    assert _attr_case(spark, {}, acts) == {}
    assert _attr_case(spark, {"bob": "1"}, acts) == {"bob": "1"}
    assert _attr_case(spark, {"anotherkey": "8892342"}, acts) == {
        "anotherkey": "8892342",
        "string key": "8892342",
    }
    assert _attr_case(spark, {"anotherkey": "8892342", "string key": "here"}, acts) == {
        "anotherkey": "8892342",
        "string key": "here",
    }


def test_attraction_update_golden(spark):
    """attraction_test.go:155-258 TestAttributes_UpdateValue / UpdateFromAttribute."""
    from opentelemetry_collector_spark.operators.attributes import Action

    upd = [Action("db.secret", "update", value="redacted")]
    assert _attr_case(spark, {}, upd) == {}
    assert _attr_case(spark, {"boo": "foo"}, upd) == {"boo": "foo"}
    assert _attr_case(spark, {"db.secret": "password1234"}, upd) == {"db.secret": "redacted"}

    upd_from = [Action("boo", "update", from_attribute="foo")]
    assert _attr_case(spark, {}, upd_from) == {}
    assert _attr_case(spark, {"boo": "bob"}, upd_from) == {"boo": "bob"}
    assert _attr_case(spark, {"foo": "over there"}, upd_from) == {"foo": "over there"}
    assert _attr_case(spark, {"foo": "there is a party over here", "boo": "not here"}, upd_from) == {
        "foo": "there is a party over here",
        "boo": "there is a party over here",
    }


def test_attraction_upsert_value_golden(spark):
    """attraction_test.go:259-307 TestAttributes_UpsertValue."""
    from opentelemetry_collector_spark.operators.attributes import Action

    acts = [Action("region", "upsert", value="planet-earth")]
    assert _attr_case(spark, {}, acts) == {"region": "planet-earth"}
    assert _attr_case(spark, {"mission": "to mars"}, acts) == {
        "mission": "to mars",
        "region": "planet-earth",
    }
    assert _attr_case(spark, {"mission": "to mars", "region": "solar system"}, acts) == {
        "mission": "to mars",
        "region": "planet-earth",
    }


def test_attraction_extract_golden(spark):
    """attraction_test.go:309-427 TestAttributes_Extract — the exact anchored
    pattern with underscore group names (Java rejects those; the engine
    strips names and addresses groups positionally)."""
    from opentelemetry_collector_spark.operators.attributes import Action

    pat = r"^\/api\/v1\/document\/(?P<new_user_key>.*)\/update\/(?P<version>.*)$"
    acts = [Action("user_key", "extract", pattern=pat)]
    assert _attr_case(spark, {}, acts) == {}
    assert _attr_case(spark, {"boo": "ghosts are scary"}, acts) == {"boo": "ghosts are scary"}
    no_match = {"user_key": "does not match", "boo": "ghosts are scary"}
    assert _attr_case(spark, no_match, acts) == no_match
    partial = {"user_key": "/api/v1/document/12345678/update", "boo": "ghosts are scary"}
    assert _attr_case(spark, partial, acts) == partial
    assert _attr_case(
        spark,
        {"user_key": "/api/v1/document/12345678/update/v1", "foo": "casper the friendly ghost"},
        acts,
    ) == {
        "user_key": "/api/v1/document/12345678/update/v1",
        "new_user_key": "12345678",
        "version": "v1",
        "foo": "casper the friendly ghost",
    }
    assert _attr_case(
        spark,
        {
            "user_key": "/api/v1/document/12345678/update/v1",
            "new_user_key": "2321",
            "version": "na",
            "foo": "casper the friendly ghost",
        },
        acts,
    ) == {
        "user_key": "/api/v1/document/12345678/update/v1",
        "new_user_key": "12345678",
        "version": "v1",
        "foo": "casper the friendly ghost",
    }


def test_attraction_from_attribute_self_no_change_golden(spark):
    """attraction_test.go:632-656 TestAttributes_FromAttributeNoChange:
    insert/update/upsert from the key itself leave it untouched."""
    from opentelemetry_collector_spark.operators.attributes import Action

    acts = [
        Action("boo", "insert", from_attribute="boo"),
        Action("boo", "update", from_attribute="boo"),
        Action("boo", "upsert", from_attribute="boo"),
    ]
    assert _attr_case(spark, {"boo": "ghosts are scary"}, acts) == {"boo": "ghosts are scary"}


def test_attraction_ordering_golden(spark):
    """attraction_test.go:658-739 TestAttributes_Ordering: actions apply
    strictly in sequence — insert, upsert-from, then delete of the source."""
    from opentelemetry_collector_spark.operators.attributes import Action

    acts = [
        Action("operation", "insert", value="default"),
        Action("svc.operation", "upsert", from_attribute="operation"),
        Action("operation", "delete"),
    ]
    foo = {"foo": "casper the friendly ghost"}
    assert _attr_case(spark, foo, acts) == {**foo, "svc.operation": "default"}
    assert _attr_case(spark, {**foo, "operation": "arithmetic"}, acts) == {
        **foo,
        "svc.operation": "arithmetic",
    }
    assert _attr_case(spark, {**foo, "svc.operation": "some value"}, acts) == {
        **foo,
        "svc.operation": "default",
    }
    assert _attr_case(spark, {**foo, "operation": "arithmetic", "svc.operation": "add"}, acts) == {
        **foo,
        "svc.operation": "arithmetic",
    }
