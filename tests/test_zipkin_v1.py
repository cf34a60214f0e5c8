"""Zipkin v1 JSON parser goldens, ported from the reference's own tables:

- status mapper precedence: json_test.go:224-512 (TestZipkinAnnotationsToOCStatus)
- span kind translation:    json_test.go:704-772 (TestSpanKindTranslation)
- local component fallback: json_test.go:148-168 + testdata/zipkin_v1_local_component.json
- absent timestamp flag:    json_test.go:515-556 (TestSpanWithoutTimestampGetsTag)
- invalid ids:              json_test.go:54-146, 774-797
- http -> OC code map:      grpc_http_mapper.go:38-65
"""

from __future__ import annotations

import json

import pytest

from opentelemetry_collector_spark.sources.zipkin_v1 import parse_zipkin_v1_json

TID = "00000000000000010000000000000002"
SID = "0000000000000001"


def _parse_one(spark, span: dict):
    df = spark.createDataFrame([(json.dumps(span),)], "value string")
    return parse_zipkin_v1_json(df).collect()[0]


def _span(**kw) -> dict:
    base = {"traceId": TID, "id": SID, "timestamp": 1}
    base.update(kw)
    return base


# --- status mapper precedence (OC status collapsed to pdata UNSET/ERROR) ---
# (name, binaryAnnotations, want_code, want_msg, want_attr_keys)
STATUS_CASES = [
    ("only status.code", [{"key": "status.code", "value": "13"}], 2, "", []),
    ("only status.message", [{"key": "status.message", "value": "Forbidden"}], 0, "", []),
    (
        "code and message",
        [{"key": "status.code", "value": "13"}, {"key": "status.message", "value": "Forbidden"}],
        2, "Forbidden", [],
    ),
    (
        "http status kept in attrs",
        [{"key": "http.status_code", "value": "404"}, {"key": "http.status_message", "value": "NotFound"}],
        2, "NotFound", ["http.status_code", "http.status_message"],
    ),
    (
        "http 200 is OK -> UNSET",
        [{"key": "http.status_code", "value": "200"}],
        0, "", ["http.status_code"],
    ),
    (
        "oc beats http",
        [
            {"key": "http.status_code", "value": "404"},
            {"key": "http.status_message", "value": "NotFound"},
            {"key": "status.code", "value": "13"},
            {"key": "status.message", "value": "Forbidden"},
        ],
        2, "Forbidden", ["http.status_code", "http.status_message"],
    ),
    (
        "http with only oc message falls to http",
        [
            {"key": "http.status_code", "value": "404"},
            {"key": "http.status_message", "value": "NotFound"},
            {"key": "status.message", "value": "Forbidden"},
        ],
        2, "NotFound", ["http.status_code", "http.status_message"],
    ),
    (
        "census tags",
        [{"key": "census.status_code", "value": "10"}, {"key": "census.status_description", "value": "RPCError"}],
        2, "RPCError", [],
    ),
    (
        "census beats everything",
        [
            {"key": "census.status_code", "value": "10"},
            {"key": "census.status_description", "value": "RPCError"},
            {"key": "http.status_code", "value": "404"},
            {"key": "http.status_message", "value": "NotFound"},
            {"key": "status.message", "value": "Forbidden"},
            {"key": "status.code", "value": "7"},
        ],
        2, "RPCError", ["http.status_code", "http.status_message"],
    ),
    # error tag: canonical name consumed; status.code 0 -> UNSET
    ("error canonical", [{"key": "error", "value": "INTERNAL"}], 2, "", []),
    ("error OK is UNSET", [{"key": "error", "value": "OK"}], 0, "", []),
    ("error empty consumed noop", [{"key": "error", "value": ""}], 0, "", []),
    ("error junk kept, UNKNOWN", [{"key": "error", "value": "true"}], 2, "", ["error"]),
    (
        "error junk loses to http",
        [{"key": "error", "value": "true"}, {"key": "http.status_code", "value": "200"}],
        0, "", ["error", "http.status_code"],
    ),
    ("oc code 0 is UNSET", [{"key": "status.code", "value": "0"}], 0, "", []),
]


@pytest.mark.parametrize(
    "name,tags,code,msg,attr_keys", STATUS_CASES, ids=[c[0] for c in STATUS_CASES]
)
def test_status_mapper(spark, name, tags, code, msg, attr_keys):
    row = _parse_one(spark, _span(binaryAnnotations=tags))
    assert row["status_code"] == code
    assert row["status_message"] == msg
    assert sorted(row["attrs"].keys()) == sorted(attr_keys)


# --- kind translation (json_test.go:704-772: only the FIRST kind matters) ---
@pytest.mark.parametrize(
    "v1kind,want",
    [("cs", 3), ("cr", 3), ("ss", 2), ("sr", 2), ("ms", 4), ("mr", 5)],
)
def test_kind_translation(spark, v1kind, want):
    row = _parse_one(
        spark,
        _span(annotations=[{"timestamp": 1, "value": v1kind}, {"timestamp": 2, "value": "cr"}]),
    )
    assert row["kind"] == want
    assert "span.kind" not in row["attrs"]  # consumed by the OC round


def test_local_component_fallback(spark):
    # testdata/zipkin_v1_local_component.json — two spans
    no_ep = _span(binaryAnnotations=[{"key": "lc", "value": "myLocalComponent"}])
    with_ep = _span(
        binaryAnnotations=[
            {
                "key": "lc",
                "value": "myLocalComponent",
                "endpoint": {"serviceName": "myServiceName", "ipv4": "172.31.0.7", "port": 0},
            }
        ]
    )
    r1 = _parse_one(spark, no_ep)
    assert r1["service_name"] == "myLocalComponent"
    assert r1["attrs"] == {"component": "myLocalComponent"}  # lc renamed, kept
    r2 = _parse_one(spark, with_ep)
    assert r2["service_name"] == "myServiceName"
    # binary-annotation endpoints provide ONLY the service fallback, no attrs
    assert r2["attrs"] == {"component": "myLocalComponent"}


def test_service_from_kind_annotation_endpoint(spark):
    row = _parse_one(
        spark,
        _span(
            annotations=[
                {"timestamp": 5, "value": "other", "endpoint": {"serviceName": "ignored"}},
                {"timestamp": 7, "value": "sr", "endpoint": {"serviceName": "svc", "ipv4": "1.2.3.4", "port": 80}},
            ]
        ),
    )
    assert row["service_name"] == "svc"
    assert row["kind"] == 2
    # annotation-selected endpoint contributes node attrs
    assert row["attrs"] == {"ipv4": "1.2.3.4", "port": "80"}


def test_timestamp_fallback_to_annotations(spark):
    span = _span(
        annotations=[
            {"timestamp": 1_000_000, "value": "a"},
            {"timestamp": 3_000_000, "value": "b"},
        ]
    )
    del span["timestamp"]
    row = _parse_one(spark, span)
    assert row["ts"].timestamp() == 1.0
    assert row["duration_us"] == 2_000_000


def test_absent_timestamp_gets_flag_attr(spark):
    span = {"traceId": TID, "id": SID, "timestamp": 0}
    row = _parse_one(spark, span)
    assert row["ts"] is None
    assert row["attrs"] == {"otel.zipkin.absentField.startTime": "true"}


def test_explicit_timestamp_and_duration(spark):
    row = _parse_one(spark, _span(timestamp=1544805927453923, duration=3740))
    assert row["duration_us"] == 3740
    assert row["ts"] is not None


@pytest.mark.parametrize(
    "tid,ok",
    [
        ("0000000000000001", True),   # 16-hex, padded
        (TID, True),
        ("0000000000000000", False),  # zero
        ("00000000000000000000000000000000", False),
        ("123", False),               # wrong length
        ("zzzzzzzzzzzzzzzz", False),  # not hex
    ],
)
def test_trace_id_validation(spark, tid, ok):
    row = _parse_one(spark, {"traceId": tid, "id": SID, "timestamp": 1})
    if ok:
        assert row["trace_id"] == tid.lower().zfill(32)
    else:
        assert row["trace_id"] is None


def test_span_id_validation_and_duplicate_keys(spark):
    row = _parse_one(
        spark,
        _span(
            id="0000000000000000",  # zero -> refused
            binaryAnnotations=[{"key": "k", "value": "v1"}, {"key": "k", "value": "v2"}],
        ),
    )
    assert row["span_id"] is None
    assert row["attrs"] == {"k": "v2"}  # Go map overwrite: last wins


def test_malformed_line_refused(spark):
    df = spark.createDataFrame([("not json",), ("[1,2,3]",)], "value string")
    rows = parse_zipkin_v1_json(df).collect()
    assert all(r["trace_id"] is None and r["span_id"] is None for r in rows)
