"""Zipkin v2 JSON codec golden tests.

Ports the semantic table of translator/trace/zipkinv2/to_translator_test.go
(kind mapping, errorTag status override, endpoint-less spans) onto the
flattened span frame, plus marshal-direction parity with
from_translator.go:140-166 (status.code always written as the enum name,
internal kind becomes the span.kind tag) and the full roundtrip.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.zipkin import (
    RESOURCE_NO_SERVICE_NAME,
    SPAN_FRAME_COLS,
    parse_zipkin_json,
    spans_from_transcripts,
    to_zipkin_json,
)


def _lines(spark, *objs):
    return spark.createDataFrame([(json.dumps(o),) for o in objs], "value string")


BASE = {
    "traceId": "f1f2f3f4f5f6f7f8f9fafbfcfdfeff80",
    "id": "afaeadacabaaa9a8",
    "name": "minimaldata",
    "timestamp": 1_596_911_098_294_000,
    "duration": 1_000,
}


# --- parse direction (to_translator.go semantics) --------------------------


@pytest.mark.parametrize(
    "zkind,tags,want",
    [
        ("CLIENT", {}, 3),
        ("SERVER", {}, 2),
        ("PRODUCER", {}, 4),
        ("CONSUMER", {}, 5),
        (None, {"span.kind": "internal"}, 1),  # zipkinKindToSpanKind tag path
        (None, {"span.kind": "client"}, 0),  # only "internal" is recognized
        (None, {}, 0),
    ],
)
def test_kind_mapping(spark, zkind, tags, want):
    obj = dict(BASE, tags=tags)
    if zkind:
        obj["kind"] = zkind
    row = parse_zipkin_json(_lines(spark, obj)).collect()[0]
    assert row.kind == want
    # the consumed span.kind tag never becomes an attribute
    assert "span.kind" not in (row.attrs or {})


def test_status_tags_consumed_and_error_override(spark):
    # populateSpanStatus: code from status.code, message only with code tag,
    # error=true forces ERROR; all three consumed (to_translator.go:166-183)
    ok = dict(BASE, tags={"status.code": "STATUS_CODE_OK", "status.message": "fine"})
    err_tag = dict(BASE, tags={"error": "true"})  # errorTag golden case
    both = dict(BASE, tags={"status.code": "STATUS_CODE_OK", "error": "true"})
    msg_no_code = dict(BASE, tags={"status.message": "orphan"})
    rows = parse_zipkin_json(_lines(spark, ok, err_tag, both, msg_no_code)).collect()
    assert (rows[0].status_code, rows[0].status_message) == (1, "fine")
    assert (rows[1].status_code, rows[1].status_message) == (2, "")
    assert rows[2].status_code == 2  # error tag wins
    assert (rows[3].status_code, rows[3].status_message) == (0, "")
    for r in rows[:3]:
        assert not {"status.code", "status.message", "error"} & set(r.attrs or {})
    # message without a code tag is NOT consumed into status...
    assert rows[3].status_message == ""


def test_self_parent_dropped_and_service_default(spark):
    selfp = dict(BASE, parentId=BASE["id"])
    realp = dict(BASE, parentId="0102030405060708")
    rows = parse_zipkin_json(_lines(spark, selfp, realp)).collect()
    assert rows[0].parent_span_id is None  # to_translator.go:140-143
    assert rows[1].parent_span_id == "0102030405060708"
    assert rows[0].service_name == RESOURCE_NO_SERVICE_NAME  # :378-382
    named = dict(BASE, localEndpoint={"serviceName": "api"})
    assert parse_zipkin_json(_lines(spark, named)).collect()[0].service_name == "api"


def test_tag_promotion_excludes_non_span_keys(spark):
    obj = dict(
        BASE,
        tags={
            "http.method": "GET",
            "service.name": "res-scope",  # nonSpanAttributes (:97-109)
            "otlp.service.name.source": "faas.name",
            "turn.idx": "3",
        },
    )
    row = parse_zipkin_json(_lines(spark, obj)).collect()[0]
    assert row.attrs == {"http.method": "GET", "turn.idx": "3"}


def test_malformed_line_refused_as_nulls(spark):
    df = spark.createDataFrame([("{not json",)], "value string")
    row = parse_zipkin_json(df).collect()[0]
    assert row.trace_id is None and row.span_id is None


# --- marshal direction (from_translator.go semantics) ----------------------


def test_marshal_status_and_internal_kind_tags(spark, tiny):
    frame = spans_from_transcripts(tiny)
    wire = to_zipkin_json(frame).collect()
    objs = [json.loads(r.value) for r in wire]
    for o in objs:
        # status.code always written as the enum NAME (from_translator.go:161)
        assert o["tags"]["status.code"] in (
            "STATUS_CODE_UNSET",
            "STATUS_CODE_OK",
            "STATUS_CODE_ERROR",
        )
        if o["tags"]["status.code"] == "STATUS_CODE_ERROR":
            assert o["tags"]["status.message"].startswith("error code=")
        else:
            assert "status.message" not in o["tags"]  # omit-empty
        if "kind" in o:
            assert o["kind"] in ("CLIENT", "SERVER", "PRODUCER", "CONSUMER")
            assert "span.kind" not in o["tags"]
        else:
            # internal spans: no zipkin kind, span.kind tag instead (:149-152)
            assert o["tags"]["span.kind"] == "internal"


def test_roundtrip_identity(spark, small):
    frame = spans_from_transcripts(small).cache()
    back = parse_zipkin_json(to_zipkin_json(frame))
    a = {tuple(r) for r in frame.select(*SPAN_FRAME_COLS).drop("attrs").collect()}
    b = {tuple(r) for r in back.select(*SPAN_FRAME_COLS).drop("attrs").collect()}
    assert a == b
    # attrs maps survive (turn.idx always, tool when present)
    got = back.select(
        F.element_at("attrs", "turn.idx").cast("int").alias("ti"),
        F.element_at("attrs", "tool").alias("tool"),
    ).collect()
    want = frame.select(
        F.element_at("attrs", "turn.idx").cast("int").alias("ti"),
        F.element_at("attrs", "tool").alias("tool"),
    ).collect()
    key = lambda t: (t[0], t[1] or "")  # noqa: E731
    assert sorted(map(tuple, got), key=key) == sorted(map(tuple, want), key=key)
    frame.unpersist()


def test_span_frame_is_pure_projection(spark, tiny):
    # no shuffle in the derivation: parent ids recomputed, not window-joined
    plan = spans_from_transcripts(tiny)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
