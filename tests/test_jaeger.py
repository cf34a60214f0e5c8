"""Jaeger JSON codec golden tests.

Ports the status/kind/reference semantics of
translator/trace/jaeger/jaegerproto_to_traces.go (setInternalSpanStatus
:220-263, jSpanKindToInternal :294-309, parent-from-CHILD_OF :175-178) and
the marshal-side tag emission of traces_to_jaegerproto.go:195-252, plus the
full roundtrip and the Kafka unmarshaler registry dispatch.
"""

from __future__ import annotations

import json

import pytest

from opentelemetry_collector_spark.sources.jaeger import (
    parse_jaeger_json,
    to_jaeger_json,
)
from opentelemetry_collector_spark.sources.zipkin import (
    RESOURCE_NO_SERVICE_NAME,
    SPAN_FRAME_COLS,
    spans_from_transcripts,
)


def _lines(spark, *objs):
    return spark.createDataFrame([(json.dumps(o),) for o in objs], "value string")


def _tags(**kv):
    out = []
    for k, v in kv.items():
        k = k.replace("__", ".")
        typ = "bool" if v in ("true", "false") else "string"
        out.append({"key": k, "type": typ, "value": v})
    return out


BASE = {
    "traceID": "f1f2f3f4f5f6f7f8f9fafbfcfdfeff80",
    "spanID": "afaeadacabaaa9a8",
    "operationName": "op",
    "startTime": 1_596_911_098_294_000,
    "duration": 1_000,
    "process": {"serviceName": "svc"},
}


# --- status precedence table (setInternalSpanStatus :220-263) --------------


@pytest.mark.parametrize(
    "tags,want_code,want_msg,surviving",
    [
        # parsed status.code wins, message consumed with the code tag
        (_tags(status__code="2", status__message="boom"), 2, "boom", set()),
        # error=true alone -> ERROR, tag consumed
        (_tags(error="true"), 2, "", set()),
        # error=false stays an ATTRIBUTE (Delete is inside the BoolVal branch)
        (_tags(error="false"), 0, "", {"error"}),
        # error + parsed code: code wins
        (_tags(error="true", status__code="1"), 1, "", set()),
        # unparseable code tag: kept as attr, message still consumed,
        # http fallback BLOCKED (http tags untouched)
        (
            _tags(status__code="NaN", status__message="m", http__status_code="500"),
            0,
            "m",
            {"status.code", "http.status_code"},
        ),
        # http fallback: 2xx -> UNSET, tag kept
        (_tags(http__status_code="200"), 0, "", {"http.status_code"}),
        # http fallback: 5xx -> ERROR, message read but http tags kept
        (
            _tags(http__status_code="500", http__status_message="oops"),
            2,
            "oops",
            {"http.status_code", "http.status_message"},
        ),
        # error=true + http 2xx: "do not override with Unset" -> stays ERROR
        (_tags(error="true", http__status_code="200"), 2, "", {"http.status_code"}),
    ],
)
def test_status_precedence(spark, tags, want_code, want_msg, surviving):
    row = parse_jaeger_json(_lines(spark, dict(BASE, tags=tags))).collect()[0]
    assert (row.status_code, row.status_message) == (want_code, want_msg)
    assert set(row.attrs or {}) == surviving


@pytest.mark.parametrize(
    "kind_tag,want",
    [("client", 3), ("server", 2), ("producer", 4), ("consumer", 5), ("internal", 1), ("weird", 0)],
)
def test_kind_tag_consumed(spark, kind_tag, want):
    obj = dict(BASE, tags=_tags(span__kind=kind_tag))
    row = parse_jaeger_json(_lines(spark, obj)).collect()[0]
    assert row.kind == want
    assert "span.kind" not in (row.attrs or {})  # consumed even when unknown


def test_parent_from_child_of_reference(spark):
    child = dict(
        BASE,
        references=[
            {"refType": "FOLLOWS_FROM", "traceID": BASE["traceID"], "spanID": "1111111111111111"},
            {"refType": "CHILD_OF", "traceID": BASE["traceID"], "spanID": "0102030405060708"},
        ],
    )
    orphan = dict(BASE)
    rows = parse_jaeger_json(_lines(spark, child, orphan)).collect()
    assert rows[0].parent_span_id == "0102030405060708"
    assert rows[1].parent_span_id is None


def test_service_name_default_and_malformed(spark):
    noproc = {k: v for k, v in BASE.items() if k != "process"}
    rows = parse_jaeger_json(_lines(spark, noproc, dict(BASE))).collect()
    assert rows[0].service_name == RESOURCE_NO_SERVICE_NAME
    assert rows[1].service_name == "svc"
    bad = spark.createDataFrame([("nope{",)], "value string")
    assert parse_jaeger_json(bad).collect()[0].trace_id is None


# --- marshal direction (traces_to_jaegerproto.go:195-252) ------------------


def test_marshal_tag_emission(spark, tiny):
    wire = to_jaeger_json(spans_from_transcripts(tiny)).collect()
    for r in wire:
        o = json.loads(r.value)
        keys = [t["key"] for t in o["tags"]]
        # status.code always present as int64; error only alongside ERROR
        code = next(t for t in o["tags"] if t["key"] == "status.code")
        assert code["type"] == "int64"
        if code["value"] == "2":
            assert "error" in keys and "status.message" in keys
        else:
            assert "error" not in keys and "status.message" not in keys
        # span.kind tag written for every non-unspecified kind, lowercase
        kind = next(t for t in o["tags"] if t["key"] == "span.kind")
        assert kind["value"] in ("client", "server", "producer", "consumer", "internal")
        # attributes lead the tag list (emission order :231-252)
        assert keys.index("turn.idx") < keys.index("span.kind") < keys.index("status.code")


def test_roundtrip_identity(spark, small):
    frame = spans_from_transcripts(small).cache()
    back = parse_jaeger_json(to_jaeger_json(frame))
    cols = [c for c in SPAN_FRAME_COLS if c != "attrs"]
    a = {tuple(r) for r in frame.select(*cols).collect()}
    b = {tuple(r) for r in back.select(*cols).collect()}
    assert a == b
    frame.unpersist()


def test_unmarshaler_registry_has_trace_encodings(spark, tiny):
    from opentelemetry_collector_spark.sources.codecs import unmarshal
    from opentelemetry_collector_spark.sources.zipkin import to_zipkin_json

    frame = spans_from_transcripts(tiny)
    via_j = unmarshal(to_jaeger_json(frame), "jaeger_json")
    via_z = unmarshal(to_zipkin_json(frame), "zipkin_json")
    assert via_j.columns == via_z.columns == SPAN_FRAME_COLS
    assert via_j.count() == via_z.count() == frame.count()
