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


# --- span links <-> Jaeger references -------------------------------------
# makeJaegerProtoReferences (traces_to_jaegerproto.go:274-332): parent rides
# FIRST as CHILD_OF, each link as FOLLOWS_FROM carrying ONLY ids.
# jReferencesToSpanLinks (jaegerproto_to_traces.go:336-359): every ref except
# (spanID==parent AND CHILD_OF) becomes a link.

LINK_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, name string, kind int,"
    " status_code int, status_message string, service_name string, ts timestamp,"
    " duration_us long, attrs map<string,string>,"
    " links array<struct<trace_id string, span_id string, trace_state string,"
    " attrs map<string,string>, dropped long>>"
)

TR, PAR, L1 = "aa" * 16, "cc" * 8, "dd" * 8


def _link_roundtrip(spark, parent, links):
    df = spark.createDataFrame(
        [(TR, "bb" * 8, parent, "n", 2, 0, "", "svc", TS, 10, {}, links)],
        LINK_SCHEMA,
    )
    wire = to_jaeger_json(df, with_links=True)
    back = parse_jaeger_json(wire, with_links=True).collect()[0]
    return json.loads(wire.collect()[0]["value"]), back


def test_parent_rides_first_as_child_of_then_links_follow(spark):
    wire, back = _link_roundtrip(
        spark, PAR, [(TR, L1, "st=1", {"rel": "retry"}, 5)]
    )
    assert wire["references"] == [
        {"refType": "CHILD_OF", "traceID": TR, "spanID": PAR},
        {"refType": "FOLLOWS_FROM", "traceID": TR, "spanID": L1},
    ]
    assert back["parent_span_id"] == PAR
    # only ids travel: trace_state/attrs/dropped are lossy on this wire
    assert back["links"] == [(TR, L1, "", {}, 0)]


def test_follows_from_at_parent_is_kept_as_link(spark):
    # the skip requires BOTH spanID==parent AND CHILD_OF — a FOLLOWS_FROM
    # ref aimed at the parent survives as a link (jaegerproto_to_traces.go:
    # 343-347's two-condition continue)
    wire, back = _link_roundtrip(spark, PAR, [(TR, PAR, "", {}, 0)])
    assert [r["refType"] for r in wire["references"]] == ["CHILD_OF", "FOLLOWS_FROM"]
    assert back["parent_span_id"] == PAR
    assert back["links"] == [(TR, PAR, "", {}, 0)]


def test_extra_child_of_to_different_span_becomes_link(spark):
    # hand-built wire: two CHILD_OF refs — the first is the parent, the
    # second (different span) is NOT skipped and reads back as a link
    span = {
        "traceID": TR, "spanID": "bb" * 8, "operationName": "n",
        "references": [
            {"refType": "CHILD_OF", "traceID": TR, "spanID": PAR},
            {"refType": "CHILD_OF", "traceID": TR, "spanID": L1},
        ],
        "startTime": US, "duration": 10,
        "tags": [], "process": {"serviceName": "svc"},
    }
    df = spark.createDataFrame([(json.dumps(span),)], "value string")
    back = parse_jaeger_json(df, with_links=True).collect()[0]
    assert back["parent_span_id"] == PAR
    assert back["links"] == [(TR, L1, "", {}, 0)]


def test_no_parent_no_links_omits_references_member(spark):
    wire, back = _link_roundtrip(spark, None, [])
    assert "references" not in wire
    assert back["parent_span_id"] is None and back["links"] == []


def test_links_without_parent_ship_alone(spark):
    wire, back = _link_roundtrip(spark, None, [(TR, L1, "", {}, 0)])
    assert wire["references"] == [
        {"refType": "FOLLOWS_FROM", "traceID": TR, "spanID": L1}
    ]
    assert back["parent_span_id"] is None
    assert back["links"] == [(TR, L1, "", {}, 0)]


def test_transcript_links_roundtrip_set_equality(spark, tiny):
    from opentelemetry_collector_spark.sources.zipkin import with_transcript_links

    spans = with_transcript_links(spans_from_transcripts(tiny))
    back = parse_jaeger_json(to_jaeger_json(spans, with_links=True), with_links=True)
    # ids survive; trace_state/attrs/dropped read back zero-valued
    want = {
        (r["span_id"], lk["trace_id"], lk["span_id"], "", (), 0)
        for r in spans.select("span_id", "links").collect()
        for lk in r["links"]
    }
    got = {
        (r["span_id"], lk["trace_id"], lk["span_id"], lk["trace_state"],
         tuple(sorted(lk["attrs"].items())), lk["dropped"])
        for r in back.select("span_id", "links").collect()
        for lk in r["links"]
    }
    assert got == want and len(got) > 0
