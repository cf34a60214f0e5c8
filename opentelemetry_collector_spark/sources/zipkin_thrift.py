"""Zipkin v1 Thrift span codec — the ``zipkin_thrift`` Kafka encoding.

The reference registers ``zipkin_thrift`` via
``zipkinv1.NewThriftTracesUnmarshaler`` (``receiver/kafkareceiver/
unmarshaler.go:57``; ``translator/trace/zipkinv1/thrift.go:37-47``), which
thrift-deserializes a LIST of zipkincore Spans and feeds the same
v1 -> OC -> pdata conversion as the v1 JSON wire. This module mirrors the
composition: a from-scratch TBinaryProtocol walk decodes the payload into
the v1 JSON dialect, then ``sources/zipkin_v1.py parse_zipkin_v1_json``
applies the translator semantics (kind annotations, status mapper,
endpoint fallbacks) — one implementation for both v1 wires.

TBinaryProtocol layout (public Apache Thrift spec; zipkincore.thrift ids):

    payload:  list header = 1B elem-type (STRUCT=12) + 4B BE count, then
              each Span struct; struct = repeated (1B field-type, 2B BE
              field-id, value) terminated by STOP (0x00)
    Span:     1:i64 trace_id, 3:str name, 4:i64 id, 5:i64 parent_id,
              6:list<Annotation>, 8:list<BinaryAnnotation>, 9:bool debug,
              10:i64 timestamp, 11:i64 duration, 12:i64 trace_id_high
    Annotation:       1:i64 timestamp, 2:str value, 3:struct host
    BinaryAnnotation: 1:str key, 2:binary value, 3:i32 annotation_type
                      (BOOL=0 BYTES=1 I16=2 I32=3 I64=4 DOUBLE=5 STRING=6),
                      4:struct host
    Endpoint: 1:i32 ipv4, 2:i16 port, 3:str service_name, 4:binary ipv6

Value rendering on decode follows ``thrift.go``'s binary-annotation
conversion: STRING utf-8, BOOL "true"/"false", integer types decimal,
DOUBLE shortest-roundtrip, BYTES base64 (the ``encoding/base64`` import).
"""

from __future__ import annotations

import base64
import json
import struct as _struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# thrift wire type codes
_T_STOP, _T_BOOL, _T_BYTE, _T_DOUBLE = 0, 2, 3, 4
_T_I16, _T_I32, _T_I64, _T_STR, _T_STRUCT, _T_LIST = 6, 8, 10, 11, 12, 15


class _Malformed(ValueError):
    pass


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _fh(ftype: int, fid: int) -> bytes:
    return bytes([ftype]) + _struct.pack(">h", fid)


def _i64(v: int) -> bytes:
    return _struct.pack(">q", v - (1 << 64) if v >= 1 << 63 else v)


def _tstr(s: str | bytes) -> bytes:
    b = s.encode("utf-8") if isinstance(s, str) else s
    return _struct.pack(">i", len(b)) + b


def _endpoint(service_name: str | None) -> bytes:
    out = b""
    if service_name is not None:
        out += _fh(_T_STR, 3) + _tstr(service_name)
    return out + bytes([_T_STOP])


def _annotation(ts_us: int | None, value: str, service_name: str | None) -> bytes:
    out = b""
    if ts_us is not None:
        out += _fh(_T_I64, 1) + _i64(int(ts_us))
    out += _fh(_T_STR, 2) + _tstr(value)
    if service_name is not None:
        out += _fh(_T_STRUCT, 3) + _endpoint(service_name)
    return out + bytes([_T_STOP])


def _binary_annotation(key: str, value: str, service_name: str | None) -> bytes:
    out = _fh(_T_STR, 1) + _tstr(key)
    out += _fh(_T_STR, 2) + _tstr(value)
    out += _fh(_T_I32, 3) + _struct.pack(">i", 6)  # STRING
    if service_name is not None:
        out += _fh(_T_STRUCT, 4) + _endpoint(service_name)
    return out + bytes([_T_STOP])


def encode_v1_thrift_span(span: dict) -> bytes:
    """One zipkincore thrift Span from a v1-dialect dict (the shape
    parse_zipkin_v1_json consumes: hex ids, micros, annotations with
    endpoint serviceName, string binaryAnnotations)."""
    trace_hex = span["traceId"] or ""
    low = int(trace_hex[-16:] or "0", 16)
    high = int(trace_hex[:-16] or "0", 16) if len(trace_hex) > 16 else 0
    out = _fh(_T_I64, 1) + _i64(low)
    if span.get("name") is not None:
        out += _fh(_T_STR, 3) + _tstr(span["name"])
    out += _fh(_T_I64, 4) + _i64(int(span["id"] or "0", 16))
    if span.get("parentId"):
        out += _fh(_T_I64, 5) + _i64(int(span["parentId"], 16))
    annos = span.get("annotations") or []
    out += _fh(_T_LIST, 6) + bytes([_T_STRUCT]) + _struct.pack(">i", len(annos))
    for a in annos:
        out += _annotation(
            a.get("timestamp"), a["value"], (a.get("endpoint") or {}).get("serviceName")
        )
    bans = span.get("binaryAnnotations") or []
    out += _fh(_T_LIST, 8) + bytes([_T_STRUCT]) + _struct.pack(">i", len(bans))
    for b in bans:
        out += _binary_annotation(
            b["key"], b["value"], (b.get("endpoint") or {}).get("serviceName")
        )
    if span.get("timestamp") is not None:
        out += _fh(_T_I64, 10) + _i64(int(span["timestamp"]))
    if span.get("duration") is not None:
        out += _fh(_T_I64, 11) + _i64(int(span["duration"]))
    if high:
        out += _fh(_T_I64, 12) + _i64(high)
    return out + bytes([_T_STOP])


def serialize_thrift_spans(spans: list[bytes]) -> bytes:
    """jaegerzipkin.SerializeThrift framing: one list<Span> payload."""
    return bytes([_T_STRUCT]) + _struct.pack(">i", len(spans)) + b"".join(spans)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _read(buf: bytes, pos: int, n: int) -> int:
    if pos + n > len(buf):
        raise _Malformed("truncated thrift payload")
    return pos + n


def _skip(buf: bytes, pos: int, ftype: int) -> int:
    """Skip one value of the given type (forward compatibility)."""
    if ftype == _T_BOOL or ftype == _T_BYTE:
        return _read(buf, pos, 1)
    if ftype == _T_DOUBLE or ftype == _T_I64:
        return _read(buf, pos, 8)
    if ftype == _T_I16:
        return _read(buf, pos, 2)
    if ftype == _T_I32:
        return _read(buf, pos, 4)
    if ftype == _T_STR:
        end = _read(buf, pos, 4)
        (ln,) = _struct.unpack(">i", buf[pos:end])
        if ln < 0:
            raise _Malformed("negative string length")
        return _read(buf, end, ln)
    if ftype == _T_STRUCT:
        while True:
            t = buf[pos] if pos < len(buf) else None
            if t is None:
                raise _Malformed("truncated struct")
            pos += 1
            if t == _T_STOP:
                return pos
            pos = _skip(buf, _read(buf, pos, 2), t)
    if ftype == _T_LIST:
        end = _read(buf, pos, 5)
        et, ln = buf[pos], _struct.unpack(">i", buf[pos + 1 : end])[0]
        pos = end
        for _ in range(ln):
            pos = _skip(buf, pos, et)
        return pos
    raise _Malformed(f"unsupported thrift type {ftype}")


def _fields_of(buf: bytes, pos: int):
    """Iterate (field_id, field_type, value_start) of one struct; yields
    then returns the position after STOP via StopIteration.value."""
    while True:
        if pos >= len(buf):
            raise _Malformed("truncated struct")
        ftype = buf[pos]
        pos += 1
        if ftype == _T_STOP:
            return pos
        end = _read(buf, pos, 2)
        (fid,) = _struct.unpack(">h", buf[pos:end])
        pos = end
        yield fid, ftype, pos
        pos = _skip(buf, pos, ftype)


def _dec_i64(buf: bytes, pos: int) -> int:
    if pos + 8 > len(buf):
        raise _Malformed("truncated i64")
    return _struct.unpack(">q", buf[pos : pos + 8])[0]


def _dec_str(buf: bytes, pos: int) -> str:
    return _dec_bytes(buf, pos).decode("utf-8", errors="replace")


def _dec_bytes(buf: bytes, pos: int) -> bytes:
    if pos + 4 > len(buf):
        raise _Malformed("truncated string length")
    (ln,) = _struct.unpack(">i", buf[pos : pos + 4])
    if ln < 0 or pos + 4 + ln > len(buf):
        raise _Malformed("truncated string payload")
    return buf[pos + 4 : pos + 4 + ln]


def _hex64(v: int) -> str:
    return f"{v & ((1 << 64) - 1):016x}"


def _dec_endpoint(buf: bytes, pos: int) -> dict:
    ep: dict = {}
    for fid, ftype, vpos in (g := _fields_of(buf, pos)):
        if fid == 3 and ftype == _T_STR:
            ep["serviceName"] = _dec_str(buf, vpos)
        elif fid == 2 and ftype == _T_I16:
            if vpos + 2 > len(buf):
                raise _Malformed("truncated i16")
            ep["port"] = _struct.unpack(">h", buf[vpos : vpos + 2])[0]
    return ep


def _ban_value(buf: bytes, vpos: int, ann_type: int) -> str:
    """thrift.go's binary-annotation value conversion by AnnotationType."""
    raw = _dec_bytes(buf, vpos)
    if ann_type == 0:  # BOOL
        return "true" if raw and raw[0] else "false"
    if ann_type == 1:  # BYTES
        return base64.b64encode(raw).decode()
    if ann_type == 2:  # I16
        return str(_struct.unpack(">h", raw[:2])[0]) if len(raw) >= 2 else ""
    if ann_type == 3:  # I32
        return str(_struct.unpack(">i", raw[:4])[0]) if len(raw) >= 4 else ""
    if ann_type == 4:  # I64
        return str(_struct.unpack(">q", raw[:8])[0]) if len(raw) >= 8 else ""
    if ann_type == 5:  # DOUBLE
        return repr(_struct.unpack(">d", raw[:8])[0]) if len(raw) >= 8 else ""
    return raw.decode("utf-8", errors="replace")  # STRING


def decode_thrift_spans(buf: bytes) -> list[dict]:
    """list<zipkincore.Span> payload -> v1 JSON dialect dicts."""
    if len(buf) < 5:
        raise _Malformed("short payload")
    count = _struct.unpack(">i", buf[1:5])[0]
    if buf[0] != _T_STRUCT or count < 0:
        raise _Malformed("bad list header")
    pos = 5
    out = []
    for _ in range(count):
        span: dict = {
            "traceId": None, "name": None, "id": None, "parentId": None,
            "timestamp": None, "duration": None, "annotations": [],
            "binaryAnnotations": [],
        }
        low = high = 0
        gen = _fields_of(buf, pos)
        while True:
            try:
                fid, ftype, vpos = next(gen)
            except StopIteration as stop:
                pos = stop.value
                break
            if fid == 1 and ftype == _T_I64:
                low = _dec_i64(buf, vpos)
            elif fid == 3 and ftype == _T_STR:
                span["name"] = _dec_str(buf, vpos)
            elif fid == 4 and ftype == _T_I64:
                span["id"] = _hex64(_dec_i64(buf, vpos))
            elif fid == 5 and ftype == _T_I64:
                span["parentId"] = _hex64(_dec_i64(buf, vpos))
            elif fid == 6 and ftype == _T_LIST:
                if vpos + 5 > len(buf):
                    raise _Malformed("truncated list header")
                et, ln = buf[vpos], _struct.unpack(">i", buf[vpos + 1 : vpos + 5])[0]
                apos = vpos + 5
                for _i in range(ln):
                    anno: dict = {"timestamp": None, "value": "", "endpoint": None}
                    agen = _fields_of(buf, apos)
                    while True:
                        try:
                            afid, aft, avp = next(agen)
                        except StopIteration as stop:
                            apos = stop.value
                            break
                        if afid == 1 and aft == _T_I64:
                            anno["timestamp"] = _dec_i64(buf, avp)
                        elif afid == 2 and aft == _T_STR:
                            anno["value"] = _dec_str(buf, avp)
                        elif afid == 3 and aft == _T_STRUCT:
                            anno["endpoint"] = _dec_endpoint(buf, avp)
                    span["annotations"].append(anno)
            elif fid == 8 and ftype == _T_LIST:
                if vpos + 5 > len(buf):
                    raise _Malformed("truncated list header")
                et, ln = buf[vpos], _struct.unpack(">i", buf[vpos + 1 : vpos + 5])[0]
                bpos = vpos + 5
                for _i in range(ln):
                    ban: dict = {"key": "", "value": "", "endpoint": None}
                    btype = 6
                    bvpos = None
                    bgen = _fields_of(buf, bpos)
                    while True:
                        try:
                            bfid, bft, bvp = next(bgen)
                        except StopIteration as stop:
                            bpos = stop.value
                            break
                        if bfid == 1 and bft == _T_STR:
                            ban["key"] = _dec_str(buf, bvp)
                        elif bfid == 2 and bft == _T_STR:
                            bvpos = bvp
                        elif bfid == 3 and bft == _T_I32:
                            if bvp + 4 > len(buf):
                                raise _Malformed("truncated i32")
                            btype = _struct.unpack(">i", buf[bvp : bvp + 4])[0]
                        elif bfid == 4 and bft == _T_STRUCT:
                            ban["endpoint"] = _dec_endpoint(buf, bvp)
                    if bvpos is not None:
                        ban["value"] = _ban_value(buf, bvpos, btype)
                    span["binaryAnnotations"].append(ban)
            elif fid == 10 and ftype == _T_I64:
                span["timestamp"] = _dec_i64(buf, vpos)
            elif fid == 11 and ftype == _T_I64:
                span["duration"] = _dec_i64(buf, vpos)
            elif fid == 12 and ftype == _T_I64:
                high = _dec_i64(buf, vpos)
        span["traceId"] = (_hex64(high) + _hex64(low)) if high else _hex64(low)
        out.append(span)
    return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def thrift_from_v1_json(df: DataFrame, col: str = "value", out_col: str = "value") -> DataFrame:
    """Transcode v1 JSON span lines into ONE thrift list payload per trace
    (the SerializeThrift batch a Kafka zipkin producer emits) — the
    fixture-generator role, like q89's JSON build: the reference has no v1
    marshaler, only the parse path is the operator under test."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    out_col: [
                        serialize_thrift_spans(
                            [encode_v1_thrift_span(json.loads(line)) for line in lines]
                        )
                        for lines in pdf["lines"]
                    ]
                }
            )

    # collect each trace into ONE row before the Arrow boundary: batch-local
    # dict grouping after repartition('_trace') split traces straddling the
    # maxRecordsPerBatch boundary into multiple payloads, breaking the
    # one-payload-per-trace framing (ADVICE r3; same pattern as
    # to_zipkin_proto). array_sort makes the wire deterministic.
    keyed = df.select(
        F.get_json_object(F.col(col), "$.traceId").alias("_trace"), F.col(col)
    )
    per_trace = keyed.groupBy("_trace").agg(
        F.array_sort(F.collect_list(F.col(col))).alias("lines")
    )
    return per_trace.select("lines").mapInPandas(_gen, f"{out_col} binary")


def parse_zipkin_thrift(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal zipkin thrift payloads to the flattened span frame via the
    SHARED v1 translator (the Go composition, thrift.go:37-47: thrift
    deserialize then the same v1->OC->pdata path as JSON). Malformed
    payloads refuse the message."""
    from opentelemetry_collector_spark.sources.zipkin_v1 import parse_zipkin_v1_json

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for buf in pdf[col]:
                if buf is None:
                    continue
                try:
                    lines += [json.dumps(s) for s in decode_thrift_spans(bytes(buf))]
                except (_Malformed, IndexError, _struct.error):
                    continue
            yield pd.DataFrame({col: lines}, dtype=object)

    json_df = df.select(col).mapInPandas(_gen, f"{col} string")
    return parse_zipkin_v1_json(json_df, col)
