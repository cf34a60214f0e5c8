"""OTLP-JSON traces envelope codec (sources/otlp_trace.py).

Pins the jsonpb wire shape the reference produces for traces
(model/otlp/json_marshaler.go with jsonpb.Marshaler{} defaults +
model/internal/data/traceid.go hex ids + the pdata SetCode deprecated-code
shim, model/pdata/traces.go:143-153), then the full frame roundtrip and
the per-row junk paths.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.otlp_trace import (
    parse_otlp_traces_json,
    to_otlp_traces_json,
)
from opentelemetry_collector_spark.sources.zipkin import spans_from_transcripts

FRAME_COLS = (
    "trace_id string, span_id string, parent_span_id string, name string, "
    "kind int, status_code int, status_message string, service_name string, "
    "ts timestamp, duration_us bigint, attrs map<string,string>"
)

T0 = dt.datetime(2024, 1, 1, 9, 0, 0, 123456)
T0_NANOS = 1_704_099_600_123_456_000


def _frame(spark, rows):
    return spark.createDataFrame(rows, FRAME_COLS)


def test_wire_shape_golden(spark):
    rows = [
        (
            "f1" * 16, "ab" * 8, None, "root", 3, 0, "", "user",
            T0, 2000, {"turn.idx": "0", "tool": "calc"},
        )
    ]
    out = to_otlp_traces_json(_frame(spark, rows)).collect()
    assert len(out) == 1
    env = json.loads(out[0]["value"])
    assert list(env) == ["resourceSpans"]
    rs = env["resourceSpans"][0]
    assert rs["resource"]["attributes"] == [
        {"key": "service.name", "value": {"stringValue": "user"}}
    ]
    ils = rs["instrumentationLibrarySpans"][0]
    assert "name" in ils["instrumentationLibrary"]
    span = ils["spans"][0]
    # ids always on the wire; the empty parent renders as "" (root span)
    assert span["traceId"] == "f1" * 16 and span["parentSpanId"] == ""
    # fixed64 nanos as STRINGS (jsonpb int64-as-string)
    assert span["startTimeUnixNano"] == str(T0_NANOS)
    assert span["endTimeUnixNano"] == str(T0_NANOS + 2_000_000)
    # enum NAME, not int
    assert span["kind"] == "SPAN_KIND_CLIENT"
    # typed attrs: turn.idx intValue (string-rendered), tool stringValue
    assert span["attributes"] == [
        {"key": "turn.idx", "value": {"intValue": "0"}},
        {"key": "tool", "value": {"stringValue": "calc"}},
    ]
    # non-nullable Status message: present-but-empty when unset
    assert span["status"] == {}


def test_error_status_carries_deprecated_code_shim(spark):
    rows = [
        (
            "f1" * 16, "ab" * 8, "cd" * 8, "err", 2, 2, "error code=7",
            "assistant", T0, 1000, {"turn.idx": "3"},
        )
    ]
    env = json.loads(to_otlp_traces_json(_frame(spark, rows)).collect()[0]["value"])
    span = env["resourceSpans"][0]["instrumentationLibrarySpans"][0]["spans"][0]
    assert span["status"] == {
        "deprecatedCode": "DEPRECATED_STATUS_CODE_UNKNOWN_ERROR",
        "message": "error code=7",
        "code": "STATUS_CODE_ERROR",
    }
    assert span["parentSpanId"] == "cd" * 8


def test_unspecified_kind_omitted_and_parsed_back_to_zero(spark):
    rows = [("f1" * 16, "ab" * 8, None, "x", 0, 0, "", "svc", T0, 0, {"turn.idx": "0"})]
    wire = to_otlp_traces_json(_frame(spark, rows))
    span = json.loads(wire.collect()[0]["value"])["resourceSpans"][0][
        "instrumentationLibrarySpans"
    ][0]["spans"][0]
    assert "kind" not in span
    back = parse_otlp_traces_json(wire).collect()[0]
    assert back["kind"] == 0 and back["parent_span_id"] is None


def test_one_envelope_per_trace_one_resource_per_service(spark):
    rows = [
        ("t1" * 16, "aa" * 8, None, "a", 3, 0, "", "user", T0, 10, {"turn.idx": "0"}),
        ("t1" * 16, "bb" * 8, "aa" * 8, "b", 2, 0, "", "assistant",
         T0 + dt.timedelta(seconds=1), 10, {"turn.idx": "1"}),
        ("t1" * 16, "cc" * 8, "bb" * 8, "c", 2, 0, "", "assistant",
         T0 + dt.timedelta(seconds=2), 10, {"turn.idx": "2"}),
        ("t2" * 16, "dd" * 8, None, "d", 3, 0, "", "user", T0, 10, {"turn.idx": "0"}),
    ]
    out = to_otlp_traces_json(_frame(spark, rows)).collect()
    assert len(out) == 2  # one envelope per trace
    envs = sorted(
        (json.loads(r["value"]) for r in out),
        key=lambda e: e["resourceSpans"][0]["instrumentationLibrarySpans"][0]["spans"][0][
            "traceId"
        ],
    )
    t1 = envs[0]["resourceSpans"]
    # resourceSpans sorted by service; spans sorted by start time
    assert [
        rs["resource"]["attributes"][0]["value"]["stringValue"] for rs in t1
    ] == ["assistant", "user"]
    names = [
        s["name"] for s in t1[0]["instrumentationLibrarySpans"][0]["spans"]
    ]
    assert names == ["b", "c"]


def test_roundtrip_equals_frame(spark, small):
    frame = spans_from_transcripts(small)
    back = parse_otlp_traces_json(to_otlp_traces_json(frame))
    cols = [
        "trace_id", "span_id", "parent_span_id", "name", "kind",
        "status_code", "status_message", "service_name", "ts", "duration_us",
    ]
    a = {tuple(r) for r in frame.select(*cols).collect()}
    b = {tuple(r) for r in back.select(*cols).collect()}
    assert a == b
    # attrs survive with first-occurrence semantics (string-rendered ints)
    fa = {r["span_id"]: r["attrs"] for r in frame.collect()}
    ba = {r["span_id"]: r["attrs"] for r in back.collect()}
    assert fa == ba


def test_junk_degrades_per_row(spark):
    bad = spark.createDataFrame(
        [
            ("not json at all",),
            ('{"resourceSpans":[{"instrumentationLibrarySpans":[{"spans":['
             '{"traceId":"t","spanId":"s","startTimeUnixNano":"junk",'
             '"endTimeUnixNano":"junk2","kind":"SPAN_KIND_BOGUS",'
             '"attributes":[{"key":null,"value":{"stringValue":"x"}},'
             '{"key":"k","value":{"stringValue":"a"}},'
             '{"key":"k","value":{"stringValue":"b"}}]}]}]}]}',),
        ],
        "value string",
    )
    rows = parse_otlp_traces_json(bad).collect()
    # unparseable envelope -> no spans; junk fields -> NULL/0 on that row
    assert len(rows) == 1
    r = rows[0]
    assert r["ts"] is None and r["duration_us"] is None and r["kind"] == 0
    assert r["service_name"] is None
    # duplicate keys keep the FIRST occurrence; null keys dropped
    assert r["attrs"] == {"k": "a"}


def test_resource_without_service_name_parses_null_not_crash(spark):
    # regression: element_at(hits, 1) threw INVALID_ARRAY_INDEX under ANSI
    # when resource attributes exist but carry no service.name
    wire = spark.createDataFrame(
        [
            ('{"resourceSpans":[{"resource":{"attributes":['
             '{"key":"host.name","value":{"stringValue":"h1"}}]},'
             '"instrumentationLibrarySpans":[{"spans":['
             '{"traceId":"t1","spanId":"s1","startTimeUnixNano":"1000",'
             '"endTimeUnixNano":"2000"}]}]}]}',),
        ],
        "value string",
    )
    rows = parse_otlp_traces_json(wire).collect()
    assert len(rows) == 1 and rows[0]["service_name"] is None


def test_far_future_ts_degrades_per_row_not_per_job(spark):
    # regression: unix_micros(ts) * 1000 overflowed bigint under ANSI for
    # timestamps past the 2262 int64-nano limit, aborting the whole marshal
    rows = [
        ("f1" * 16, "aa" * 8, None, "ok", 3, 0, "", "user", T0, 10, {"turn.idx": "0"}),
        ("f2" * 16, "bb" * 8, None, "far", 3, 0, "", "user",
         dt.datetime(2300, 1, 1), 10, {"turn.idx": "0"}),
    ]
    out = {
        json.loads(r["value"])["resourceSpans"][0]["instrumentationLibrarySpans"][0][
            "spans"
        ][0]["name"]: json.loads(r["value"])["resourceSpans"][0][
            "instrumentationLibrarySpans"
        ][0]["spans"][0]
        for r in to_otlp_traces_json(_frame(spark, rows)).collect()
    }
    assert out["ok"]["startTimeUnixNano"] == str(T0_NANOS)
    assert "startTimeUnixNano" not in out["far"]  # degraded field, kept row


def test_epoch_zero_and_null_ts_stay_distinguishable_on_roundtrip(spark):
    epoch = dt.datetime(1970, 1, 1)
    rows = [
        ("f1" * 16, "aa" * 8, None, "zero", 3, 0, "", "user", epoch, 0, {"turn.idx": "0"}),
        ("f2" * 16, "bb" * 8, None, "none", 3, 0, "", "user", None, None, {"turn.idx": "0"}),
    ]
    back = {
        r["name"]: r
        for r in parse_otlp_traces_json(to_otlp_traces_json(_frame(spark, rows))).collect()
    }
    # epoch-0 ships as "0" (logs-envelope parity) and reads back as epoch-0;
    # NULL ts stays omitted and reads back NULL
    assert back["zero"]["ts"] == epoch and back["zero"]["duration_us"] == 0
    assert back["none"]["ts"] is None and back["none"]["duration_us"] is None


def test_marshal_is_pure_jvm(spark, tiny):
    plan = (
        to_otlp_traces_json(spans_from_transcripts(tiny))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 2  # (trace, service) + trace
