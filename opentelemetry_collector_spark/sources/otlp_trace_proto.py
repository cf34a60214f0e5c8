"""OTLP protobuf TRACES envelope codec — ``otlp_proto`` for the traces
signal.

The reference's Kafka registry uses ``otlp_proto`` as the default for ALL
THREE signals (``receiver/kafkareceiver/unmarshaler.go:52-82``); the logs
envelope lives in ``sources/otlp_proto.py``, this module adds the traces
twin over the same byte kernel. Decode walks the generated wire
(``model/internal/data/protogen/trace/v1/trace.pb.go``) into the jsonpb
dialect ``sources/otlp_trace.py`` already parses, so the unmarshal
semantics (enum-name kinds, ""-empty parent, decimal nano division,
first-occurrence attrs, deprecated-code shim) stay single-sourced — the
Go layout, where pb and json unmarshalers share pdata.

trace.pb.go field numbers:

    ExportTraceServiceRequest: resource_spans = 1
    ResourceSpans: resource=1, instrumentation_library_spans=2
    InstrumentationLibrarySpans: instrumentation_library=1, spans=2
    Span: trace_id=1 bytes(16), span_id=2 bytes(8), trace_state=3,
          parent_span_id=4 bytes(8), name=5, kind=6 varint,
          start_time_unix_nano=7 fixed64, end_time_unix_nano=8 fixed64,
          attributes=9 rep KeyValue, events=11, links=13, status=15
          (trace.pb.go:319-394)
    Status: deprecated_code=1 varint, message=2, code=3 varint
            (trace.pb.go:672-676); non-nullable embedded — ALWAYS on the
            wire, and pdata's SetCode keeps deprecated_code in lockstep
            (model/pdata/traces.go:143-153)

Lossy spot shared with the logs proto: fixed64 zero is omitted by the
gogo marshaler, so an epoch-0 start time reads back as ABSENT (NULL ts) —
the JSON wire ships the explicit "0" instead (see otlp_trace.py's note).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.codecs import _LIB_NAME
from opentelemetry_collector_spark.sources.otlp_proto import (
    _f64,
    _fields,
    _ld,
    _Malformed,
    _vi,
)
from opentelemetry_collector_spark.sources.otlp_trace import (
    _DEPRECATED_ERROR,
    _KIND_NAMES,
    _STATUS_CODE_NAMES,
)

#: Status_DEPRECATED_STATUS_CODE_UNKNOWN_ERROR (trace.pb.go:90) — the
#: numeric twin of otlp_trace._DEPRECATED_ERROR, written by the SetCode shim
_DEPRECATED_ERROR_VALUE = 2

# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _attr(key: str, value: str, as_int: bool) -> bytes:
    if as_int:
        any_v = _vi(3, int(value))
    else:
        any_v = _ld(1, value.encode())
    return _ld(1, key.encode()) + _ld(2, any_v)


def encode_otlp_span(row: dict) -> bytes:
    """One trace.v1.Span from a span-frame row (fields in ascending
    field-number order, the gogo MarshalToSizedBuffer layout)."""
    out = _ld(1, bytes.fromhex(row["trace_id"])) + _ld(2, bytes.fromhex(row["span_id"]))
    if row["parent_span_id"]:
        out += _ld(4, bytes.fromhex(row["parent_span_id"]))
    if row["name"] is not None:
        out += _ld(5, row["name"].encode())
    if row["kind"]:
        out += _vi(6, int(row["kind"]))
    # nullable ts arrives as pandas NaN in the mapInPandas batch, and NaN is
    # truthy — guard it explicitly or int(NaN) kills the task (ADVICE r3)
    start_ns, end_ns = row["start_ns"], row["end_ns"]
    if start_ns and start_ns == start_ns:
        out += _f64(7, int(start_ns))
    if end_ns and end_ns == end_ns:
        out += _f64(8, int(end_ns))
    for k, v in (row["attrs"] or {}).items():
        if v is not None:
            out += _ld(9, _attr(k, v, as_int=k == "turn.idx"))
    status = b""
    is_err = row["status_code"] == 2
    if is_err:
        status += _vi(1, _DEPRECATED_ERROR_VALUE)
        if row["status_message"]:
            status += _ld(2, row["status_message"].encode())
    if row["status_code"]:
        status += _vi(3, int(row["status_code"]))
    out += _ld(15, status)  # non-nullable embedded: always emitted
    return out


def to_otlp_traces_proto(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Span frame -> one binary ExportTraceServiceRequest per trace, one
    ResourceSpans per service (sorted), spans sorted by (start, id) — the
    exact grouping of to_otlp_traces_json, on the proto wire."""
    from opentelemetry_collector_spark.sources.codecs import _nanos

    nanos = _nanos(F.col("ts"))
    src = df.select(
        "trace_id", "span_id", "parent_span_id", "name", "kind",
        "status_code", "status_message", "service_name",
        nanos.alias("start_ns"),
        F.try_add(nanos, F.try_multiply(F.col("duration_us"), F.lit(1000))).alias("end_ns"),
        F.to_json(F.coalesce(F.col("attrs"), F.create_map())).alias("attrs_json"),
    )
    rec = F.struct(
        F.col("service_name").alias("_o0"),
        F.col("start_ns").alias("_o1"),
        F.col("span_id").alias("_o2"),
        *src.columns,
    )
    per_trace = src.groupBy("trace_id").agg(F.array_sort(F.collect_list(rec)).alias("spans"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for spans in pdf["spans"]:
                by_service: dict[str, list[bytes]] = {}
                for span in spans:  # already (service, start, id)-sorted
                    row = dict(span)
                    row["attrs"] = json.loads(row.pop("attrs_json") or "{}")
                    by_service.setdefault(row["service_name"], []).append(
                        encode_otlp_span(row)
                    )
                req = b""
                for service, blobs in by_service.items():
                    resource = _ld(
                        1, _ld(1, b"service.name") + _ld(2, _ld(1, service.encode()))
                    )
                    ill = _ld(1, _ld(1, _LIB_NAME.encode())) + b"".join(
                        _ld(2, b) for b in blobs
                    )
                    req += _ld(1, _ld(1, resource) + _ld(2, ill))
                vals.append(req)
            yield pd.DataFrame({out_col: vals})

    return per_trace.select("spans").mapInPandas(_gen, f"{out_col} binary")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _utf8(buf: bytes, span: tuple[int, int]) -> str:
    return buf[span[0] : span[1]].decode("utf-8", errors="replace")


def _dec_attrs(buf: bytes, spans: list[tuple[int, int]]) -> list[dict]:
    out = []
    for kv_span in spans:
        key = None
        val: dict = {}
        for fno, wt, v in _fields(buf, *kv_span):
            if fno == 1 and wt == 2:
                key = _utf8(buf, v)
            elif fno == 2 and wt == 2:
                for f2, w2, v2 in _fields(buf, *v):
                    if f2 == 1 and w2 == 2:
                        val = {"stringValue": _utf8(buf, v2)}
                    elif f2 == 3 and w2 == 0:
                        iv = v2 - (1 << 64) if v2 >= 1 << 63 else v2
                        val = {"intValue": str(iv)}
        out.append({"key": key, "value": val})
    return out


def decode_otlp_traces(buf: bytes) -> dict:
    """ExportTraceServiceRequest -> the jsonpb dialect dict
    parse_otlp_traces_json understands."""
    rss = []
    for fno, wt, rs_span in _fields(buf, 0, len(buf)):
        if fno != 1 or wt != 2:
            continue
        rs: dict = {"resource": {"attributes": []}, "instrumentationLibrarySpans": []}
        for f2, w2, v2 in _fields(buf, *rs_span):
            if f2 == 1 and w2 == 2:  # resource
                attr_spans = [v for f, w, v in _fields(buf, *v2) if f == 1 and w == 2]
                rs["resource"]["attributes"] = _dec_attrs(buf, attr_spans)
            elif f2 == 2 and w2 == 2:  # instrumentation_library_spans
                ill: dict = {"instrumentationLibrary": {}, "spans": []}
                for f3, w3, v3 in _fields(buf, *v2):
                    if f3 == 1 and w3 == 2:
                        for f4, w4, v4 in _fields(buf, *v3):
                            if f4 == 1 and w4 == 2:
                                ill["instrumentationLibrary"]["name"] = _utf8(buf, v4)
                    elif f3 == 2 and w3 == 2:
                        span: dict = {
                            "traceId": "", "spanId": "", "parentSpanId": "",
                            "name": None, "kind": None, "startTimeUnixNano": None,
                            "endTimeUnixNano": None, "attributes": [],
                            "status": {},
                        }
                        for f4, w4, v4 in _fields(buf, *v3):
                            if f4 == 1 and w4 == 2:
                                span["traceId"] = buf[v4[0] : v4[1]].hex()
                            elif f4 == 2 and w4 == 2:
                                span["spanId"] = buf[v4[0] : v4[1]].hex()
                            elif f4 == 4 and w4 == 2:
                                span["parentSpanId"] = buf[v4[0] : v4[1]].hex()
                            elif f4 == 5 and w4 == 2:
                                span["name"] = _utf8(buf, v4)
                            elif f4 == 6 and w4 == 0:
                                span["kind"] = _KIND_NAMES.get(v4)
                            elif f4 == 7 and w4 == 1:
                                span["startTimeUnixNano"] = str(v4) if v4 else None
                            elif f4 == 8 and w4 == 1:
                                span["endTimeUnixNano"] = str(v4) if v4 else None
                            elif f4 == 9 and w4 == 2:
                                span["attributes"].append(
                                    _dec_attrs(buf, [v4])[0]
                                )
                            elif f4 == 15 and w4 == 2:
                                st = {}
                                for f5, w5, v5 in _fields(buf, *v4):
                                    if f5 == 1 and w5 == 0:
                                        st["deprecatedCode"] = (
                                            _DEPRECATED_ERROR if v5 == _DEPRECATED_ERROR_VALUE
                                            else str(v5)
                                        )
                                    elif f5 == 2 and w5 == 2:
                                        st["message"] = _utf8(buf, v5)
                                    elif f5 == 3 and w5 == 0:
                                        st["code"] = _STATUS_CODE_NAMES.get(v5)
                                span["status"] = st
                        ill["spans"].append(span)
                rs["instrumentationLibrarySpans"].append(ill)
        rss.append(rs)
    return {"resourceSpans": rss}


def parse_otlp_traces_proto(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal binary trace envelopes to the flat span frame via the
    SHARED jsonpb-dialect parser (parse_otlp_traces_json). Malformed
    payloads refuse the message."""
    from opentelemetry_collector_spark.sources.otlp_trace import parse_otlp_traces_json

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for buf in pdf[col]:
                if buf is None:
                    continue
                try:
                    lines.append(json.dumps(decode_otlp_traces(bytes(buf))))
                except _Malformed:
                    continue
            yield pd.DataFrame({col: lines}, dtype=object)

    json_df = df.select(col).mapInPandas(_gen, f"{col} string")
    return parse_otlp_traces_json(json_df, col)
