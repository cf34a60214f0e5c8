"""Zipkin protobuf (proto3) span codec — the ``zipkin_proto`` Kafka encoding.

The reference registers ``zipkin_proto`` via
``zipkinv2.NewProtobufTracesUnmarshaler`` (``receiver/kafkareceiver/
unmarshaler.go:56``), which parses a zipkin proto3 ``ListOfSpans`` payload
and feeds the SAME zipkinv2 translator as the JSON wire. This module
mirrors that composition: a from-scratch proto3 byte walk (shared kernel
with ``sources/otlp_proto.py``) decodes the public ``zipkin.proto`` wire
into the v2 JSON dialect, then ``sources/zipkin.py parse_zipkin_json``
applies the ``to_translator.go`` semantics — kind/status/tag handling
lives in exactly one place.

zipkin.proto (public openzipkin/zipkin-api) field numbers:

    ListOfSpans: spans = 1 rep Span
    Span: trace_id=1 bytes(16), parent_id=2 bytes(8), id=3 bytes(8),
          kind=4 enum (UNSPECIFIED=0 CLIENT=1 SERVER=2 PRODUCER=3
          CONSUMER=4), name=5, timestamp=6 fixed64 (epoch MICROS),
          duration=7 varint micros, local_endpoint=8, remote_endpoint=9,
          annotations=10 rep (timestamp=1 fixed64, value=2),
          tags=11 map<string,string> (entries: key=1, value=2),
          debug=12, shared=13
    Endpoint: service_name=1, ipv4=2, ipv6=3, port=4

Envelope grouping: one ListOfSpans per trace (deterministic — ordered by
(timestamp, span id)), the batch shape a Kafka zipkin producer emits.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.otlp_proto import (
    _f64,
    _fields,
    _ld,
    _Malformed,
    _vi,
)
from opentelemetry_collector_spark.sources.zipkin import (
    KIND_TO_ZIPKIN,
    SPAN_KIND_INTERNAL,
    STATUS_NAMES,
)

# zipkin proto3 Kind enum <-> v2 JSON kind string
_PROTO_KIND = {1: "CLIENT", 2: "SERVER", 3: "PRODUCER", 4: "CONSUMER"}
_KIND_PROTO = {v: k for k, v in _PROTO_KIND.items()}


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _endpoint(service_name: str | None) -> bytes:
    return _ld(1, (service_name or "").encode())


def encode_zipkin_span(row: dict, with_events: bool, with_links: bool) -> bytes:
    """One proto3 Span from a span-frame row. Tag construction mirrors
    to_zipkin_json / from_translator.go:140-166: status.code always (enum
    name), status.message when non-empty, internal kind -> span.kind tag,
    otlp.link.{i} tags in link order."""
    out = _ld(1, bytes.fromhex(row["trace_id"]))
    if row["parent_span_id"] is not None:
        out += _ld(2, bytes.fromhex(row["parent_span_id"]))
    out += _ld(3, bytes.fromhex(row["span_id"]))
    zkind = _KIND_PROTO.get(KIND_TO_ZIPKIN.get(row["kind"], ""))
    if zkind:
        out += _vi(4, zkind)
    if row["name"] is not None:
        out += _ld(5, row["name"].encode())
    if row["start_us"]:
        out += _f64(6, int(row["start_us"]))
    if row["duration_us"]:
        out += _vi(7, int(row["duration_us"]))
    out += _ld(8, _endpoint(row["service_name"]))
    if with_events:
        for ev in row.get("events") or []:
            out += _ld(10, _f64(1, int(ev["ts_us"])) + _ld(2, ev["value"].encode()))
    tags = dict(row["attrs"] or {})
    tags["status.code"] = STATUS_NAMES.get(row["status_code"] or 0, STATUS_NAMES[0])
    if row["status_message"]:
        tags["status.message"] = row["status_message"]
    if row["kind"] == SPAN_KIND_INTERNAL:
        tags["span.kind"] = "internal"
    if with_links:
        for i, lv in enumerate(row.get("link_values") or []):
            tags[f"otlp.link.{i}"] = lv
    for k, v in tags.items():
        if v is not None:
            out += _ld(11, _ld(1, k.encode()) + _ld(2, v.encode()))
    return out


def to_zipkin_proto(
    df: DataFrame,
    out_col: str = "value",
    with_events: bool = False,
    with_links: bool = False,
) -> DataFrame:
    """Span frame -> one binary ListOfSpans per trace (spans ordered by
    (timestamp, span id) so the wire is deterministic)."""
    from opentelemetry_collector_spark.sources.zipkin import _annotation_value, _link_value

    # attrs travel as JSON text: a MAP column inside the struct would make
    # array_sort's ordering undefined (Spark rejects struct<...map> there)
    cols = [
        "trace_id", "span_id", "parent_span_id", "name", "kind",
        "status_code", "status_message", "service_name",
        F.unix_micros(F.col("ts")).alias("start_us"), "duration_us",
        F.to_json(F.coalesce(F.col("attrs"), F.create_map())).alias("attrs_json"),
    ]
    if with_events:
        cols.append(
            F.transform(
                F.col("events"),
                lambda e: F.struct(
                    F.unix_micros(e["ts"]).alias("ts_us"),
                    _annotation_value(e).alias("value"),
                ),
            ).alias("events")
        )
    if with_links:
        cols.append(
            F.transform(F.col("links"), lambda l: _link_value(l)).alias("link_values")
        )
    src = df.select(*cols)
    rec = F.struct(F.col("start_us").alias("_o1"), F.col("span_id").alias("_o2"), *src.columns)
    per_trace = src.groupBy("trace_id").agg(
        F.array_sort(F.collect_list(rec)).alias("spans")
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for spans in pdf["spans"]:
                blobs = []
                for span in spans:
                    row = dict(span)
                    row["attrs"] = json.loads(row.pop("attrs_json") or "{}")
                    blobs.append(_ld(1, encode_zipkin_span(row, with_events, with_links)))
                vals.append(b"".join(blobs))
            yield pd.DataFrame({out_col: vals})

    return per_trace.select("spans").mapInPandas(_gen, f"{out_col} binary")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _utf8(buf: bytes, span: tuple[int, int]) -> str:
    return buf[span[0] : span[1]].decode("utf-8", errors="replace")


def decode_zipkin_spans(buf: bytes) -> list[dict]:
    """ListOfSpans -> v2 JSON dialect dicts for parse_zipkin_json."""
    out = []
    for fno, wt, sp in _fields(buf, 0, len(buf)):
        if fno != 1 or wt != 2:
            continue
        span: dict = {
            "traceId": "", "id": "", "parentId": None, "kind": None, "name": None,
            "timestamp": 0, "duration": 0, "localEndpoint": None, "tags": {},
            "annotations": [],
        }
        for f2, w2, v2 in _fields(buf, *sp):
            if f2 == 1 and w2 == 2:
                span["traceId"] = buf[v2[0] : v2[1]].hex()
            elif f2 == 2 and w2 == 2:
                span["parentId"] = buf[v2[0] : v2[1]].hex()
            elif f2 == 3 and w2 == 2:
                span["id"] = buf[v2[0] : v2[1]].hex()
            elif f2 == 4 and w2 == 0:
                span["kind"] = _PROTO_KIND.get(v2)
            elif f2 == 5 and w2 == 2:
                span["name"] = _utf8(buf, v2)
            elif f2 == 6 and w2 == 1:
                span["timestamp"] = v2
            elif f2 == 7 and w2 == 0:
                span["duration"] = v2
            elif f2 == 8 and w2 == 2:
                for f3, w3, v3 in _fields(buf, *v2):
                    if f3 == 1 and w3 == 2:
                        span["localEndpoint"] = {"serviceName": _utf8(buf, v3)}
            elif f2 == 10 and w2 == 2:
                anno = {"timestamp": 0, "value": ""}
                for f3, w3, v3 in _fields(buf, *v2):
                    if f3 == 1 and w3 == 1:
                        anno["timestamp"] = v3
                    elif f3 == 2 and w3 == 2:
                        anno["value"] = _utf8(buf, v3)
                span["annotations"].append(anno)
            elif f2 == 11 and w2 == 2:
                k = v = None
                for f3, w3, v3 in _fields(buf, *v2):
                    if f3 == 1 and w3 == 2:
                        k = _utf8(buf, v3)
                    elif f3 == 2 and w3 == 2:
                        v = _utf8(buf, v3)
                if k is not None and k not in span["tags"]:
                    span["tags"][k] = v or ""
        out.append(span)
    return out


def parse_zipkin_proto(
    df: DataFrame,
    col: str = "value",
    with_events: bool = False,
    with_links: bool = False,
) -> DataFrame:
    """Unmarshal zipkin proto3 ListOfSpans payloads to the flattened span
    frame via the SHARED zipkinv2 translator (the Go composition:
    unmarshaler.go:56 both wires feed zipkinv2's to_translator). Malformed
    payloads refuse the message."""
    from opentelemetry_collector_spark.sources.zipkin import parse_zipkin_json

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for buf in pdf[col]:
                if buf is None:
                    continue
                try:
                    lines += [json.dumps(s) for s in decode_zipkin_spans(bytes(buf))]
                except _Malformed:
                    continue
            yield pd.DataFrame({col: lines}, dtype=object)

    json_df = df.select(col).mapInPandas(_gen, f"{col} string")
    return parse_zipkin_json(json_df, col, with_events=with_events, with_links=with_links)
