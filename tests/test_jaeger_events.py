"""Span events <-> Jaeger logs (the span-log member of the Jaeger wire).

Reference: ``translator/trace/jaeger/traces_to_jaegerproto.go:333-357``
(spanEventsToJaegerProtoLogs — one log per event, a "message" field carries
the non-empty name FIRST, then the attr fields; dropped count does not
travel) and ``jaegerproto_to_traces.go:310-334`` (jLogsToSpanEvents — the
"message" field becomes the name and is deleted from the attrs; dropped
reads back 0).
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.jaeger import parse_jaeger_json, to_jaeger_json
from opentelemetry_collector_spark.sources.zipkin import (
    spans_from_transcripts,
    with_transcript_events,
)

TS = dt.datetime(2024, 1, 2, 3, 4, 5)
US = 1704164645000000

SPAN_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, name string, kind int,"
    " status_code int, status_message string, service_name string, ts timestamp,"
    " duration_us long, attrs map<string,string>,"
    " events array<struct<ts timestamp, name string, attrs map<string,string>, dropped long>>"
)


def _roundtrip(spark, events):
    df = spark.createDataFrame(
        [("aa" * 16, "bb" * 8, None, "n", 2, 0, "", "svc", TS, 10, {}, events)],
        SPAN_SCHEMA,
    )
    wire = to_jaeger_json(df, with_events=True)
    back = parse_jaeger_json(wire, with_events=True)
    return wire.collect()[0]["value"], back.collect()[0]["events"]


def test_message_field_carries_name_first(spark):
    # non-empty name -> "message" field FIRST, attr fields after
    # (traces_to_jaegerproto.go:345-352 inserts message before the attr walk)
    wire, back = _roundtrip(spark, [(TS, "tool.invoke", {"tool": "search"}, 0)])
    log = json.loads(wire)["logs"][0]
    assert log["timestamp"] == US
    assert log["fields"][0] == {"key": "message", "type": "string", "value": "tool.invoke"}
    assert {f["key"] for f in log["fields"][1:]} == {"tool"}
    assert back == [(TS, "tool.invoke", {"tool": "search"}, 0)]


def test_empty_name_emits_no_message_field(spark):
    # empty name -> no message field at all; parse reads the name back as ""
    # (the Get("message") miss leaves event.Name zero-valued)
    wire, back = _roundtrip(spark, [(TS, "", {"k": "v"}, 0)])
    fields = json.loads(wire)["logs"][0]["fields"]
    assert [f["key"] for f in fields] == ["k"]
    assert back == [(TS, "", {"k": "v"}, 0)]


def test_dropped_count_is_lossy_on_this_wire(spark):
    # unlike zipkin's name|{json}|dropped format, Jaeger logs have no slot
    # for the dropped count — it reads back 0 (Go has the identical loss)
    wire, back = _roundtrip(spark, [(TS, "ev", {}, 7)])
    assert "7" not in json.dumps(json.loads(wire)["logs"][0]["fields"])
    assert back[0]["dropped"] == 0


def test_empty_events_omit_logs_member(spark):
    # events.Len()==0 -> no logs member (traces_to_jaegerproto.go:333-336);
    # a missing member parses back to an empty events array
    wire, back = _roundtrip(spark, [])
    assert "logs" not in json.loads(wire)
    assert back == []


def test_flagless_wire_and_parse_unchanged(spark):
    df = spark.createDataFrame(
        [("aa" * 16, "bb" * 8, None, "n", 2, 0, "", "svc", TS, 10, {}, [(TS, "ev", {}, 0)])],
        SPAN_SCHEMA,
    )
    wire = to_jaeger_json(df)  # no flag -> no logs member even with events present
    assert "logs" not in json.loads(wire.collect()[0]["value"])
    assert "events" not in parse_jaeger_json(wire).columns


def test_transcript_events_roundtrip_set_equality(spark, tiny):
    spans = with_transcript_events(spans_from_transcripts(tiny))
    back = parse_jaeger_json(to_jaeger_json(spans, with_events=True), with_events=True)
    want = {
        (r["span_id"], e["ts"], e["name"], tuple(sorted(e["attrs"].items())), 0)
        for r in spans.select("span_id", "events").collect()
        for e in r["events"]
    }
    got = {
        (r["span_id"], e["ts"], e["name"], tuple(sorted(e["attrs"].items())), e["dropped"])
        for r in back.select("span_id", "events").collect()
        for e in r["events"]
    }
    assert got == want and len(got) > 0
