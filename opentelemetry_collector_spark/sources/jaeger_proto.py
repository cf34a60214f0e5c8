"""Jaeger protobuf span codec — the ``jaeger_proto`` Kafka encoding.

The reference's Kafka receiver registers ``jaeger_proto`` as one span per
message (``receiver/kafkareceiver/jaeger_unmarshaler.go:27-43``:
``jaegerproto.Span.Unmarshal`` then ``jaegerSpanToTraces``). This module
walks the public jaeger ``model.proto`` wire with the same from-scratch
proto3 byte kernel as ``sources/otlp_proto.py`` and then hands the decoded
span to the EXISTING Jaeger translator (``sources/jaeger.py
parse_jaeger_json``) — mirroring the Go composition, where jaeger_proto and
jaeger_json share ``jaegerSpanToTraces``. The subtle status/kind/parent
semantics therefore live in exactly one place.

jaeger model.proto field numbers (public jaegertracing/jaeger model/proto):

    Span: trace_id=1 bytes(16), span_id=2 bytes(8), operation_name=3,
          references=4 rep SpanRef, flags=5, start_time=6 Timestamp,
          duration=7 Duration, tags=8 rep KeyValue, logs=9 rep Log,
          process=10 Process, process_id=11
    SpanRef: trace_id=1, span_id=2, ref_type=3 enum (CHILD_OF=0,
             FOLLOWS_FROM=1)
    KeyValue: key=1, v_type=2 enum (STRING=0 BOOL=1 INT64=2 FLOAT64=3
              BINARY=4), v_str=3, v_bool=4, v_int64=5, v_float64=6 double,
              v_binary=7
    Log: timestamp=1 Timestamp, fields=2 rep KeyValue
    Process: service_name=1, tags=2
    google.protobuf.Timestamp/Duration: seconds=1 varint, nanos=2 varint

Micros contract: the span frame carries micros (``startTime``/``duration``
in the UI-JSON dialect); Timestamp/Duration carry (seconds, nanos) — the
codec converts losslessly for micro-precision values.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.otlp_proto import (
    _fields,
    _ld,
    _Malformed,
    _vi,
)

_REF_TYPES = {0: "CHILD_OF", 1: "FOLLOWS_FROM"}
_VT_NAMES = {0: "string", 1: "bool", 2: "int64", 3: "float64", 4: "binary"}


# ---------------------------------------------------------------------------
# encode (span frame -> one jaeger proto Span per row)
# ---------------------------------------------------------------------------


def _ts_msg(micros) -> bytes:
    """google.protobuf.Timestamp/Duration payload from unix micros. A null
    span ts arrives here as pandas NaN inside the mapInPandas batch (the
    span frame's ts is nullable) — emit the epoch/zero message instead of
    letting int(NaN) crash the encode task (ADVICE r3)."""
    if micros is None or micros != micros:
        return b""
    seconds, rem = divmod(int(micros), 1_000_000)
    out = b""
    if seconds:
        out += _vi(1, seconds)
    if rem:
        out += _vi(2, rem * 1000)
    return out


def _kv_str(key: str, val: str) -> bytes:
    return _ld(1, key.encode()) + _ld(3, val.encode())  # v_type STRING=0 omitted


def _kv_bool(key: str, val: bool) -> bytes:
    out = _ld(1, key.encode()) + _vi(2, 1)  # BOOL
    if val:
        out += _vi(4, 1)
    return out


def _kv_int(key: str, val: int) -> bytes:
    out = _ld(1, key.encode()) + _vi(2, 2)  # INT64
    if val:
        out += _vi(5, val)
    return out


def _ref_msg(trace_hex: str, span_hex: str, ref_type: int) -> bytes:
    out = _ld(1, bytes.fromhex(trace_hex)) + _ld(2, bytes.fromhex(span_hex))
    if ref_type:
        out += _vi(3, ref_type)
    return out


def encode_jaeger_span(row: dict, with_events: bool, with_links: bool) -> bytes:
    """One jaeger proto Span. Tag emission order mirrors
    traces_to_jaegerproto.go:195-252 (attrs, span.kind, status.code,
    error, status.message) — the same order to_jaeger_json emits."""
    from opentelemetry_collector_spark.sources.jaeger import KIND_TO_JAEGER

    out = _ld(1, bytes.fromhex(row["trace_id"])) + _ld(2, bytes.fromhex(row["span_id"]))
    if row["name"] is not None:
        out += _ld(3, row["name"].encode())
    if row["parent_span_id"] is not None:
        out += _ld(4, _ref_msg(row["trace_id"], row["parent_span_id"], 0))
    if with_links:
        for link in row.get("links") or []:
            out += _ld(4, _ref_msg(link["trace_id"], link["span_id"], 1))
    out += _ld(6, _ts_msg(row["start_us"]))
    out += _ld(7, _ts_msg(row["duration_us"] or 0))
    tags = [_kv_str(k, v) for k, v in (row["attrs"] or {}).items()]
    kind_name = KIND_TO_JAEGER.get(row["kind"])
    if kind_name:
        tags.append(_kv_str("span.kind", kind_name))
    tags.append(_kv_int("status.code", int(row["status_code"] or 0)))
    if row["status_code"] == 2:
        tags.append(_kv_bool("error", True))
    if row["status_message"]:
        tags.append(_kv_str("status.message", row["status_message"]))
    out += b"".join(_ld(8, t) for t in tags)
    if with_events:
        for ev in row.get("events") or []:
            fields = b""
            if ev["name"]:
                fields += _ld(2, _kv_str("message", ev["name"]))
            for k, v in (ev["attrs"] or {}).items():
                fields += _ld(2, _kv_str(k, v))
            out += _ld(9, _ld(1, _ts_msg(ev["ts_us"])) + fields)
    out += _ld(10, _ld(1, (row["service_name"] or "").encode()))
    return out


def to_jaeger_proto(
    df: DataFrame,
    out_col: str = "value",
    with_events: bool = False,
    with_links: bool = False,
) -> DataFrame:
    """Span frame -> binary jaeger proto Span per row (the Kafka message
    payload; one span per message like the Go marshaler)."""
    cols = [
        "trace_id", "span_id", "parent_span_id", "name", "kind",
        "status_code", "status_message", "service_name",
        F.unix_micros(F.col("ts")).alias("start_us"), "duration_us", "attrs",
    ]
    if with_events:
        cols.append(
            F.transform(
                F.col("events"),
                lambda e: F.struct(
                    F.unix_micros(e["ts"]).alias("ts_us"),
                    e["name"].alias("name"),
                    e["attrs"].alias("attrs"),
                ),
            ).alias("events")
        )
    if with_links:
        cols.append("links")
    src = df.select(*cols)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [
                encode_jaeger_span(row, with_events, with_links)
                for row in pdf.to_dict("records")
            ]
            yield pd.DataFrame({out_col: vals})

    return src.mapInPandas(_gen, f"{out_col} binary")


# ---------------------------------------------------------------------------
# decode (proto Span -> UI-JSON dialect -> shared translator)
# ---------------------------------------------------------------------------


def _dec_ts(buf: bytes, span: tuple[int, int]) -> int:
    seconds = nanos = 0
    for fno, wt, val in _fields(buf, *span):
        if fno == 1 and wt == 0:
            seconds = val - (1 << 64) if val >= 1 << 63 else val
        elif fno == 2 and wt == 0:
            nanos = val
    return seconds * 1_000_000 + nanos // 1000


def _dec_kv(buf: bytes, span: tuple[int, int]) -> dict:
    key, vtype = "", 0
    v_str, v_bool, v_int, v_float, v_bin = "", False, 0, 0.0, b""
    for fno, wt, val in _fields(buf, *span):
        if fno == 1 and wt == 2:
            key = buf[val[0] : val[1]].decode("utf-8", errors="replace")
        elif fno == 2 and wt == 0:
            vtype = val
        elif fno == 3 and wt == 2:
            v_str = buf[val[0] : val[1]].decode("utf-8", errors="replace")
        elif fno == 4 and wt == 0:
            v_bool = bool(val)
        elif fno == 5 and wt == 0:
            v_int = val - (1 << 64) if val >= 1 << 63 else val
        elif fno == 6 and wt == 1:
            import struct as _s

            v_float = _s.unpack("<d", int(val).to_bytes(8, "little"))[0]
        elif fno == 7 and wt == 2:
            v_bin = buf[val[0] : val[1]]
    value = {
        0: v_str,
        1: "true" if v_bool else "false",
        2: str(v_int),
        3: repr(v_float),
        4: v_bin.hex(),
    }.get(vtype, v_str)
    return {"key": key, "type": _VT_NAMES.get(vtype, "string"), "value": value}


def decode_jaeger_span(buf: bytes) -> dict:
    """proto Span -> the Jaeger UI-JSON dialect dict parse_jaeger_json
    understands (startTime/duration in micros, typed tag list)."""
    span = {
        "traceID": "", "spanID": "", "operationName": None, "references": [],
        "startTime": 0, "duration": 0, "tags": [], "process": {"serviceName": ""},
        "logs": [],
    }
    for fno, wt, val in _fields(buf, 0, len(buf)):
        if fno == 1 and wt == 2:
            span["traceID"] = buf[val[0] : val[1]].hex()
        elif fno == 2 and wt == 2:
            span["spanID"] = buf[val[0] : val[1]].hex()
        elif fno == 3 and wt == 2:
            span["operationName"] = buf[val[0] : val[1]].decode("utf-8", errors="replace")
        elif fno == 4 and wt == 2:
            ref = {"refType": "CHILD_OF", "traceID": "", "spanID": ""}
            for f2, w2, v2 in _fields(buf, *val):
                if f2 == 1 and w2 == 2:
                    ref["traceID"] = buf[v2[0] : v2[1]].hex()
                elif f2 == 2 and w2 == 2:
                    ref["spanID"] = buf[v2[0] : v2[1]].hex()
                elif f2 == 3 and w2 == 0:
                    ref["refType"] = _REF_TYPES.get(v2, "CHILD_OF")
            span["references"].append(ref)
        elif fno == 6 and wt == 2:
            span["startTime"] = _dec_ts(buf, val)
        elif fno == 7 and wt == 2:
            span["duration"] = _dec_ts(buf, val)
        elif fno == 8 and wt == 2:
            span["tags"].append(_dec_kv(buf, val))
        elif fno == 9 and wt == 2:
            log = {"timestamp": 0, "fields": []}
            for f2, w2, v2 in _fields(buf, *val):
                if f2 == 1 and w2 == 2:
                    log["timestamp"] = _dec_ts(buf, v2)
                elif f2 == 2 and w2 == 2:
                    log["fields"].append(_dec_kv(buf, v2))
            span["logs"].append(log)
        elif fno == 10 and wt == 2:
            for f2, w2, v2 in _fields(buf, *val):
                if f2 == 1 and w2 == 2:
                    span["process"]["serviceName"] = buf[v2[0] : v2[1]].decode(
                        "utf-8", errors="replace"
                    )
    return span


def parse_jaeger_proto(
    df: DataFrame,
    col: str = "value",
    with_events: bool = False,
    with_links: bool = False,
) -> DataFrame:
    """Unmarshal jaeger proto Span payloads to the flattened span frame:
    the byte walk produces the UI-JSON dialect, then the SHARED translator
    (parse_jaeger_json) applies the jaegerproto_to_traces.go semantics —
    the Go composition (jaeger_unmarshaler.go:32-38 both feed
    jaegerSpanToTraces). Malformed payloads refuse the message."""
    from opentelemetry_collector_spark.sources.jaeger import parse_jaeger_json

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for buf in pdf[col]:
                if buf is None:
                    continue
                try:
                    lines.append(json.dumps(decode_jaeger_span(bytes(buf))))
                except _Malformed:
                    continue
            yield pd.DataFrame({col: lines}, dtype=object)

    json_df = df.select(col).mapInPandas(_gen, f"{col} string")
    return parse_jaeger_json(json_df, col, with_events=with_events, with_links=with_links)
