"""OTLP protobuf METRICS envelope codec — ``otlp_proto`` for the metrics
signal, completing the three-signal registry parity
(``receiver/kafkareceiver/unmarshaler.go:70-74``
``defaultMetricsUnmarshalers`` registers exactly one encoding:
``otlp_proto``).

Same composition as the logs/traces twins: a byte walk over the generated
wire (``model/internal/data/protogen/metrics/v1/metrics.pb.go``) into the
jsonpb dialect ``sources/otlp_metric.py`` already parses, so oneof-member
kind resolution, label StringMap semantics, and the decimal nano division
stay single-sourced.

metrics.pb.go field numbers (v0.5-era wire — flat StringKeyValue labels,
int/double member split):

    ExportMetricsServiceRequest: resource_metrics = 1
    ResourceMetrics: resource=1, instrumentation_library_metrics=2
    InstrumentationLibraryMetrics: instrumentation_library=1, metrics=2
    Metric: name=1, description=2, unit=3, then the data oneof
            (metrics.pb.go:370-388): int_gauge=4, double_gauge=5,
            int_sum=6, double_sum=7, int_histogram=8, double_histogram=9,
            double_summary=11
    DoubleGauge: data_points=1
    DoubleSum: data_points=1, aggregation_temporality=2 varint
               (CUMULATIVE=2), is_monotonic=3 varint
    DoubleDataPoint (metrics.pb.go:989-1012): labels=1 rep StringKeyValue,
        start_time_unix_nano=2 fixed64, time_unix_nano=3 fixed64,
        value=4 fixed64 (double), exemplars=5
    StringKeyValue: key=1, value=2 (common.pb.go:326-327)

Scope: ALL SEVEN oneof members — doubleGauge/doubleSum (the q73 dialect),
doubleHistogram, intGauge/intSum, doubleSummary, and intHistogram — each
an identical walk against its own dialect parser
(parse_otlp_histograms_json etc.); the seam is the oneof dispatch below.
"""

from __future__ import annotations

import json
import struct as _struct
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

_TEMPORALITY_CUMULATIVE_VALUE = 2  # AGGREGATION_TEMPORALITY_CUMULATIVE


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _double_bits(v: float) -> int:
    return _struct.unpack("<Q", _struct.pack("<d", float(v)))[0]


def _dp(labels: list[tuple[str, str]], t_nanos: int | None, value: float) -> bytes:
    out = b""
    for k, v in labels:
        out += _ld(1, _ld(1, k.encode()) + _ld(2, v.encode()))
    if t_nanos:
        out += _f64(3, int(t_nanos))
    if value != 0.0:  # float64 zero-omission (gogo omit-empty)
        out += _f64(4, _double_bits(value))
    return out


def encode_metric(name: str, kind: str, dps: list[bytes]) -> bytes:
    body = b"".join(_ld(1, d) for d in dps)
    out = _ld(1, name.encode())
    if kind == "gauge":
        out += _ld(5, body)  # double_gauge
    elif kind == "sum_cumulative_monotonic":
        out += _ld(7, body + _vi(2, _TEMPORALITY_CUMULATIVE_VALUE) + _vi(3, 1))
    else:
        raise ValueError(f"unsupported metric kind {kind!r}")
    return out


def to_otlp_metrics_proto(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Scalar datapoint frame -> one binary ExportMetricsServiceRequest per
    (metric, kind), datapoints sorted like to_otlp_metrics_json (time,
    labels, value) so the wire is deterministic."""
    from opentelemetry_collector_spark.sources.codecs import _nanos
    from opentelemetry_collector_spark.sources.otlp_metric import _sorted_labels

    labels = _sorted_labels()
    dp = F.struct(
        _nanos(F.col("ts")).alias("t_nanos"),
        F.to_json(labels).alias("labels_json"),
        F.col("value").alias("value"),
    )
    grouped = df.groupBy("metric", "kind").agg(F.array_sort(F.collect_list(dp)).alias("dps"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for name, kind, dps in zip(pdf["metric"], pdf["kind"], pdf["dps"]):
                blobs = [
                    _dp(
                        [(e["key"], e["value"]) for e in json.loads(d["labels_json"] or "[]")],
                        d["t_nanos"],
                        d["value"],
                    )
                    for d in dps
                ]
                metric = encode_metric(name, kind, blobs)
                resource = b""  # non-nullable empty resource
                ilm = _ld(1, _ld(1, _LIB_NAME.encode())) + _ld(2, metric)
                vals.append(_ld(1, _ld(1, resource) + _ld(2, ilm)))
            yield pd.DataFrame({out_col: vals})

    return grouped.mapInPandas(_gen, f"{out_col} binary")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _utf8(buf: bytes, span: tuple[int, int]) -> str:
    return buf[span[0] : span[1]].decode("utf-8", errors="replace")


def _dec_dp(buf: bytes, span: tuple[int, int]) -> dict:
    dp: dict = {"labels": [], "timeUnixNano": None, "value": None}
    for fno, wt, v in _fields(buf, *span):
        if fno == 1 and wt == 2:
            kv = {"key": None, "value": None}
            for f2, w2, v2 in _fields(buf, *v):
                if f2 == 1 and w2 == 2:
                    kv["key"] = _utf8(buf, v2)
                elif f2 == 2 and w2 == 2:
                    kv["value"] = _utf8(buf, v2)
            dp["labels"].append(kv)
        elif fno == 3 and wt == 1:
            dp["timeUnixNano"] = str(v) if v else None
        elif fno == 4 and wt == 1:
            dp["value"] = _struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
    if not dp["labels"]:
        dp.pop("labels")
    return dp


def decode_otlp_metrics(buf: bytes) -> dict:
    """ExportMetricsServiceRequest -> the jsonpb dialect dict
    parse_otlp_metrics_json understands (scalar members)."""
    rms = []
    for fno, wt, rm_span in _fields(buf, 0, len(buf)):
        if fno != 1 or wt != 2:
            continue
        ilms = []
        for f2, w2, v2 in _fields(buf, *rm_span):
            if f2 != 2 or w2 != 2:
                continue
            ilm: dict = {"instrumentationLibrary": {}, "metrics": []}
            for f3, w3, v3 in _fields(buf, *v2):
                if f3 == 1 and w3 == 2:
                    for f4, w4, v4 in _fields(buf, *v3):
                        if f4 == 1 and w4 == 2:
                            ilm["instrumentationLibrary"]["name"] = _utf8(buf, v4)
                elif f3 == 2 and w3 == 2:
                    metric: dict = {"name": None}
                    for f4, w4, v4 in _fields(buf, *v3):
                        if f4 == 1 and w4 == 2:
                            metric["name"] = _utf8(buf, v4)
                        elif f4 == 5 and w4 == 2:  # double_gauge
                            metric["doubleGauge"] = {
                                "dataPoints": [
                                    _dec_dp(buf, v5)
                                    for f5, w5, v5 in _fields(buf, *v4)
                                    if f5 == 1 and w5 == 2
                                ]
                            }
                        elif f4 == 7 and w4 == 2:  # double_sum
                            sum_m: dict = {"dataPoints": []}
                            for f5, w5, v5 in _fields(buf, *v4):
                                if f5 == 1 and w5 == 2:
                                    sum_m["dataPoints"].append(_dec_dp(buf, v5))
                                elif f5 == 2 and w5 == 0:
                                    sum_m["aggregationTemporality"] = (
                                        "AGGREGATION_TEMPORALITY_CUMULATIVE"
                                        if v5 == _TEMPORALITY_CUMULATIVE_VALUE
                                        else str(v5)
                                    )
                                elif f5 == 3 and w5 == 0:
                                    sum_m["isMonotonic"] = bool(v5)
                            metric["doubleSum"] = sum_m
                    ilm["metrics"].append(metric)
            ilms.append(ilm)
        rms.append({"instrumentationLibraryMetrics": ilms})
    return {"resourceMetrics": rms}


def parse_otlp_metrics_proto(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal binary metric envelopes to the scalar datapoint frame via
    the SHARED dialect parser (parse_otlp_metrics_json). Malformed
    payloads refuse the message."""
    from opentelemetry_collector_spark.sources.otlp_metric import parse_otlp_metrics_json

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for buf in pdf[col]:
                if buf is None:
                    continue
                try:
                    lines.append(json.dumps(decode_otlp_metrics(bytes(buf))))
                except _Malformed:
                    continue
            yield pd.DataFrame({col: lines}, dtype=object)

    json_df = df.select(col).mapInPandas(_gen, f"{col} string")
    return parse_otlp_metrics_json(json_df, col)


# ---------------------------------------------------------------------------
# DoubleHistogram member (metric oneof field 9; metrics.pb.go:1237-1310)
# ---------------------------------------------------------------------------


def _packed_f64(field: int, values: list[int]) -> bytes:
    """Packed repeated fixed64 (proto3 default for repeated scalars): one
    LEN field whose payload is the concatenated 8-byte values."""
    return _ld(field, b"".join(int(v).to_bytes(8, "little") for v in values))


def _hdp(
    labels: list[tuple[str, str]],
    t_nanos: int | None,
    count: int,
    h_sum: float,
    bucket_counts: list[int],
    explicit_bounds: list[float],
) -> bytes:
    out = b""
    for k, v in labels:
        out += _ld(1, _ld(1, k.encode()) + _ld(2, v.encode()))
    if t_nanos:
        out += _f64(3, int(t_nanos))
    if count:
        out += _f64(4, int(count))
    if h_sum != 0.0:
        out += _f64(5, _double_bits(h_sum))
    if bucket_counts:
        out += _packed_f64(6, bucket_counts)
    if explicit_bounds:
        out += _packed_f64(7, [_double_bits(b) for b in explicit_bounds])
    return out


def encode_histogram_metric(name: str, dps: list[bytes]) -> bytes:
    body = b"".join(_ld(1, d) for d in dps)
    return _ld(1, name.encode()) + _ld(
        9, body + _vi(2, _TEMPORALITY_CUMULATIVE_VALUE)
    )


def to_otlp_histograms_proto(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Histogram datapoint frame (otlp_metric._HIST_FRAME_COLS) -> one
    binary envelope per metric, datapoints in to_otlp_histograms_json's
    deterministic order."""
    from opentelemetry_collector_spark.sources.codecs import _nanos
    from opentelemetry_collector_spark.sources.otlp_metric import _sorted_labels

    dp = F.struct(
        _nanos(F.col("ts")).alias("t_nanos"),
        F.to_json(_sorted_labels()).alias("labels_json"),
        F.col("h_count").alias("h_count"),
        F.col("h_sum").alias("h_sum"),
        F.to_json(F.col("bucket_counts")).alias("counts_json"),
        F.to_json(F.col("explicit_bounds")).alias("bounds_json"),
    )
    grouped = df.groupBy("metric").agg(F.array_sort(F.collect_list(dp)).alias("dps"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for name, dps in zip(pdf["metric"], pdf["dps"]):
                blobs = [
                    _hdp(
                        [(e["key"], e["value"]) for e in json.loads(d["labels_json"] or "[]")],
                        d["t_nanos"],
                        int(d["h_count"] or 0),
                        float(d["h_sum"] or 0.0),
                        json.loads(d["counts_json"] or "[]"),
                        json.loads(d["bounds_json"] or "[]"),
                    )
                    for d in dps
                ]
                metric = encode_histogram_metric(name, blobs)
                ilm = _ld(1, _ld(1, _LIB_NAME.encode())) + _ld(2, metric)
                vals.append(_ld(1, _ld(1, b"") + _ld(2, ilm)))
            yield pd.DataFrame({out_col: vals})

    return grouped.mapInPandas(_gen, f"{out_col} binary")


def _unpack_f64s(buf: bytes, span: tuple[int, int]) -> list[int]:
    raw = buf[span[0] : span[1]]
    if len(raw) % 8:
        raise _Malformed("packed fixed64 payload not a multiple of 8")
    return [int.from_bytes(raw[i : i + 8], "little") for i in range(0, len(raw), 8)]


def _dec_hdp(buf: bytes, span: tuple[int, int]) -> dict:
    dp: dict = {
        "labels": [], "timeUnixNano": None, "count": None, "sum": None,
        "bucketCounts": None, "explicitBounds": None,
    }
    counts: list[int] = []
    bounds: list[float] = []
    for fno, wt, v in _fields(buf, *span):
        if fno == 1 and wt == 2:
            kv = {"key": None, "value": None}
            for f2, w2, v2 in _fields(buf, *v):
                if f2 == 1 and w2 == 2:
                    kv["key"] = _utf8(buf, v2)
                elif f2 == 2 and w2 == 2:
                    kv["value"] = _utf8(buf, v2)
            dp["labels"].append(kv)
        elif fno == 3 and wt == 1:
            dp["timeUnixNano"] = str(v) if v else None
        elif fno == 4 and wt == 1:
            dp["count"] = str(v) if v else None
        elif fno == 5 and wt == 1:
            dp["sum"] = _struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif fno == 6:
            # packed (LEN) is the proto3 default; accept unpacked (I64) too
            counts += _unpack_f64s(buf, v) if wt == 2 else [v]
        elif fno == 7:
            raw = _unpack_f64s(buf, v) if wt == 2 else [v]
            bounds += [_struct.unpack("<d", int(x).to_bytes(8, "little"))[0] for x in raw]
    if counts:
        dp["bucketCounts"] = [str(c) for c in counts]
    if bounds:
        dp["explicitBounds"] = bounds
    if not dp["labels"]:
        dp.pop("labels")
    return dp


def decode_otlp_histograms(buf: bytes) -> dict:
    """ExportMetricsServiceRequest (doubleHistogram member) -> the jsonpb
    dialect dict parse_otlp_histograms_json understands."""
    rms = []
    for fno, wt, rm_span in _fields(buf, 0, len(buf)):
        if fno != 1 or wt != 2:
            continue
        ilms = []
        for f2, w2, v2 in _fields(buf, *rm_span):
            if f2 != 2 or w2 != 2:
                continue
            ilm: dict = {"metrics": []}
            for f3, w3, v3 in _fields(buf, *v2):
                if f3 != 2 or w3 != 2:
                    continue
                metric: dict = {"name": None}
                for f4, w4, v4 in _fields(buf, *v3):
                    if f4 == 1 and w4 == 2:
                        metric["name"] = _utf8(buf, v4)
                    elif f4 == 9 and w4 == 2:  # double_histogram
                        hist: dict = {"dataPoints": []}
                        for f5, w5, v5 in _fields(buf, *v4):
                            if f5 == 1 and w5 == 2:
                                hist["dataPoints"].append(_dec_hdp(buf, v5))
                            elif f5 == 2 and w5 == 0:
                                hist["aggregationTemporality"] = (
                                    "AGGREGATION_TEMPORALITY_CUMULATIVE"
                                    if v5 == _TEMPORALITY_CUMULATIVE_VALUE
                                    else str(v5)
                                )
                        metric["doubleHistogram"] = hist
                ilm["metrics"].append(metric)
            ilms.append(ilm)
        rms.append({"instrumentationLibraryMetrics": ilms})
    return {"resourceMetrics": rms}


def parse_otlp_histograms_proto(df: DataFrame, col: str = "value") -> DataFrame:
    """Binary histogram envelopes -> the histogram frame via the SHARED
    dialect parser (parse_otlp_histograms_json)."""
    from opentelemetry_collector_spark.sources.otlp_metric import parse_otlp_histograms_json

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for buf in pdf[col]:
                if buf is None:
                    continue
                try:
                    lines.append(json.dumps(decode_otlp_histograms(bytes(buf))))
                except _Malformed:
                    continue
            yield pd.DataFrame({col: lines}, dtype=object)

    json_df = df.select(col).mapInPandas(_gen, f"{col} string")
    return parse_otlp_histograms_json(json_df, col)


# ---------------------------------------------------------------------------
# intGauge / intSum members (metric oneof fields 4 / 6; IntDataPoint
# metrics.pb.go:889-914 — value is sfixed64, field 4 on the I64 wire)
# ---------------------------------------------------------------------------


def _idp(labels: list[tuple[str, str]], t_nanos: int | None, value: int) -> bytes:
    out = b""
    for k, v in labels:
        out += _ld(1, _ld(1, k.encode()) + _ld(2, v.encode()))
    if t_nanos:
        out += _f64(3, int(t_nanos))
    if value:
        out += _f64(4, int(value) & ((1 << 64) - 1))  # sfixed64 two's complement
    return out


def encode_int_metric(name: str, kind: str, dps: list[bytes]) -> bytes:
    body = b"".join(_ld(1, d) for d in dps)
    out = _ld(1, name.encode())
    if kind == "gauge":
        out += _ld(4, body)  # int_gauge
    elif kind == "sum_cumulative_monotonic":
        out += _ld(6, body + _vi(2, _TEMPORALITY_CUMULATIVE_VALUE) + _vi(3, 1))
    else:
        raise ValueError(f"unsupported metric kind {kind!r}")
    return out


def to_otlp_int_metrics_proto(df: DataFrame, out_col: str = "value") -> DataFrame:
    """INTEGER scalar frame -> binary envelopes (intGauge/intSum members),
    to_otlp_int_metrics_json's deterministic datapoint order."""
    from opentelemetry_collector_spark.sources.codecs import _nanos
    from opentelemetry_collector_spark.sources.otlp_metric import _sorted_labels

    dp = F.struct(
        _nanos(F.col("ts")).alias("t_nanos"),
        F.to_json(_sorted_labels()).alias("labels_json"),
        F.col("value").alias("value"),
    )
    grouped = df.groupBy("metric", "kind").agg(F.array_sort(F.collect_list(dp)).alias("dps"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for name, kind, dps in zip(pdf["metric"], pdf["kind"], pdf["dps"]):
                blobs = [
                    _idp(
                        [(e["key"], e["value"]) for e in json.loads(d["labels_json"] or "[]")],
                        d["t_nanos"],
                        int(d["value"] or 0),
                    )
                    for d in dps
                ]
                ilm = _ld(1, _ld(1, _LIB_NAME.encode())) + _ld(2, encode_int_metric(name, kind, blobs))
                vals.append(_ld(1, _ld(1, b"") + _ld(2, ilm)))
            yield pd.DataFrame({out_col: vals})

    return grouped.mapInPandas(_gen, f"{out_col} binary")


def _dec_idp(buf: bytes, span: tuple[int, int]) -> dict:
    dp: dict = {"labels": [], "timeUnixNano": None, "value": None}
    for fno, wt, v in _fields(buf, *span):
        if fno == 1 and wt == 2:
            kv = {"key": None, "value": None}
            for f2, w2, v2 in _fields(buf, *v):
                if f2 == 1 and w2 == 2:
                    kv["key"] = _utf8(buf, v2)
                elif f2 == 2 and w2 == 2:
                    kv["value"] = _utf8(buf, v2)
            dp["labels"].append(kv)
        elif fno == 3 and wt == 1:
            dp["timeUnixNano"] = str(v) if v else None
        elif fno == 4 and wt == 1:
            iv = v - (1 << 64) if v >= 1 << 63 else v
            dp["value"] = str(iv) if iv else None  # jsonpb int64 string, omit-zero
    if not dp["labels"]:
        dp.pop("labels")
    return dp


def decode_otlp_int_metrics(buf: bytes) -> dict:
    """ExportMetricsServiceRequest (intGauge/intSum members) -> the jsonpb
    dialect dict parse_otlp_int_metrics_json understands."""
    rms = []
    for fno, wt, rm_span in _fields(buf, 0, len(buf)):
        if fno != 1 or wt != 2:
            continue
        ilms = []
        for f2, w2, v2 in _fields(buf, *rm_span):
            if f2 != 2 or w2 != 2:
                continue
            ilm: dict = {"metrics": []}
            for f3, w3, v3 in _fields(buf, *v2):
                if f3 != 2 or w3 != 2:
                    continue
                metric: dict = {"name": None}
                for f4, w4, v4 in _fields(buf, *v3):
                    if f4 == 1 and w4 == 2:
                        metric["name"] = _utf8(buf, v4)
                    elif f4 == 4 and w4 == 2:  # int_gauge
                        metric["intGauge"] = {
                            "dataPoints": [
                                _dec_idp(buf, v5)
                                for f5, w5, v5 in _fields(buf, *v4)
                                if f5 == 1 and w5 == 2
                            ]
                        }
                    elif f4 == 6 and w4 == 2:  # int_sum
                        sum_m: dict = {"dataPoints": []}
                        for f5, w5, v5 in _fields(buf, *v4):
                            if f5 == 1 and w5 == 2:
                                sum_m["dataPoints"].append(_dec_idp(buf, v5))
                            elif f5 == 2 and w5 == 0:
                                sum_m["aggregationTemporality"] = (
                                    "AGGREGATION_TEMPORALITY_CUMULATIVE"
                                    if v5 == _TEMPORALITY_CUMULATIVE_VALUE
                                    else str(v5)
                                )
                            elif f5 == 3 and w5 == 0:
                                sum_m["isMonotonic"] = bool(v5)
                        metric["intSum"] = sum_m
                ilm["metrics"].append(metric)
            ilms.append(ilm)
        rms.append({"instrumentationLibraryMetrics": ilms})
    return {"resourceMetrics": rms}


def parse_otlp_int_metrics_proto(df: DataFrame, col: str = "value") -> DataFrame:
    """Binary int-metric envelopes -> the integer scalar frame via the
    SHARED dialect parser (parse_otlp_int_metrics_json)."""
    from opentelemetry_collector_spark.sources.otlp_metric import parse_otlp_int_metrics_json

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for buf in pdf[col]:
                if buf is None:
                    continue
                try:
                    lines.append(json.dumps(decode_otlp_int_metrics(bytes(buf))))
                except _Malformed:
                    continue
            yield pd.DataFrame({col: lines}, dtype=object)

    json_df = df.select(col).mapInPandas(_gen, f"{col} string")
    return parse_otlp_int_metrics_json(json_df, col)


# ---------------------------------------------------------------------------
# doubleSummary member (metric oneof field 11; DoubleSummaryDataPoint
# metrics.pb.go:1387-1413, ValueAtQuantile :1502-1504)
# ---------------------------------------------------------------------------


def _sdp(
    labels: list[tuple[str, str]],
    t_nanos: int | None,
    count: int,
    h_sum: float,
    quantiles: list[tuple[float, float]],
) -> bytes:
    out = b""
    for k, v in labels:
        out += _ld(1, _ld(1, k.encode()) + _ld(2, v.encode()))
    if t_nanos:
        out += _f64(3, int(t_nanos))
    if count:
        out += _f64(4, int(count))
    if h_sum != 0.0:
        out += _f64(5, _double_bits(h_sum))
    for q, v in quantiles:
        qv = b""
        if q != 0.0:
            qv += _f64(1, _double_bits(q))
        if v != 0.0:
            qv += _f64(2, _double_bits(v))
        out += _ld(6, qv)
    return out


def encode_summary_metric(name: str, dps: list[bytes]) -> bytes:
    return _ld(1, name.encode()) + _ld(11, b"".join(_ld(1, d) for d in dps))


def to_otlp_summaries_proto(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Summary datapoint frame -> binary envelopes (doubleSummary member),
    to_otlp_summaries_json's deterministic datapoint order."""
    from opentelemetry_collector_spark.sources.codecs import _nanos
    from opentelemetry_collector_spark.sources.otlp_metric import _sorted_labels

    dp = F.struct(
        _nanos(F.col("ts")).alias("t_nanos"),
        F.to_json(_sorted_labels()).alias("labels_json"),
        F.col("h_count").alias("h_count"),
        F.col("h_sum").alias("h_sum"),
        F.to_json(F.col("quantiles")).alias("quantiles_json"),
    )
    grouped = df.groupBy("metric").agg(F.array_sort(F.collect_list(dp)).alias("dps"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for name, dps in zip(pdf["metric"], pdf["dps"]):
                blobs = [
                    _sdp(
                        [(e["key"], e["value"]) for e in json.loads(d["labels_json"] or "[]")],
                        d["t_nanos"],
                        int(d["h_count"] or 0),
                        float(d["h_sum"] or 0.0),
                        [(q["quantile"], q["value"]) for q in json.loads(d["quantiles_json"] or "[]")],
                    )
                    for d in dps
                ]
                ilm = _ld(1, _ld(1, _LIB_NAME.encode())) + _ld(2, encode_summary_metric(name, blobs))
                vals.append(_ld(1, _ld(1, b"") + _ld(2, ilm)))
            yield pd.DataFrame({out_col: vals})

    return grouped.mapInPandas(_gen, f"{out_col} binary")


def _dec_sdp(buf: bytes, span: tuple[int, int]) -> dict:
    dp: dict = {
        "labels": [], "timeUnixNano": None, "count": None, "sum": None,
        "quantileValues": None,
    }
    qvs = []
    for fno, wt, v in _fields(buf, *span):
        if fno == 1 and wt == 2:
            kv = {"key": None, "value": None}
            for f2, w2, v2 in _fields(buf, *v):
                if f2 == 1 and w2 == 2:
                    kv["key"] = _utf8(buf, v2)
                elif f2 == 2 and w2 == 2:
                    kv["value"] = _utf8(buf, v2)
            dp["labels"].append(kv)
        elif fno == 3 and wt == 1:
            dp["timeUnixNano"] = str(v) if v else None
        elif fno == 4 and wt == 1:
            dp["count"] = str(v) if v else None
        elif fno == 5 and wt == 1:
            dp["sum"] = _struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif fno == 6 and wt == 2:
            qv = {"quantile": None, "value": None}
            for f2, w2, v2 in _fields(buf, *v):
                if f2 == 1 and w2 == 1:
                    qv["quantile"] = _struct.unpack("<d", int(v2).to_bytes(8, "little"))[0]
                elif f2 == 2 and w2 == 1:
                    qv["value"] = _struct.unpack("<d", int(v2).to_bytes(8, "little"))[0]
            qvs.append(qv)
    if qvs:
        dp["quantileValues"] = qvs
    if not dp["labels"]:
        dp.pop("labels")
    return dp


def decode_otlp_summaries(buf: bytes) -> dict:
    """ExportMetricsServiceRequest (doubleSummary member) -> the jsonpb
    dialect dict parse_otlp_summaries_json understands."""
    rms = []
    for fno, wt, rm_span in _fields(buf, 0, len(buf)):
        if fno != 1 or wt != 2:
            continue
        ilms = []
        for f2, w2, v2 in _fields(buf, *rm_span):
            if f2 != 2 or w2 != 2:
                continue
            ilm: dict = {"metrics": []}
            for f3, w3, v3 in _fields(buf, *v2):
                if f3 != 2 or w3 != 2:
                    continue
                metric: dict = {"name": None}
                for f4, w4, v4 in _fields(buf, *v3):
                    if f4 == 1 and w4 == 2:
                        metric["name"] = _utf8(buf, v4)
                    elif f4 == 11 and w4 == 2:  # double_summary
                        metric["doubleSummary"] = {
                            "dataPoints": [
                                _dec_sdp(buf, v5)
                                for f5, w5, v5 in _fields(buf, *v4)
                                if f5 == 1 and w5 == 2
                            ]
                        }
                ilm["metrics"].append(metric)
            ilms.append(ilm)
        rms.append({"instrumentationLibraryMetrics": ilms})
    return {"resourceMetrics": rms}


def parse_otlp_summaries_proto(df: DataFrame, col: str = "value") -> DataFrame:
    """Binary summary envelopes -> the summary frame via the SHARED dialect
    parser (parse_otlp_summaries_json)."""
    from opentelemetry_collector_spark.sources.otlp_metric import parse_otlp_summaries_json

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for buf in pdf[col]:
                if buf is None:
                    continue
                try:
                    lines.append(json.dumps(decode_otlp_summaries(bytes(buf))))
                except _Malformed:
                    continue
            yield pd.DataFrame({col: lines}, dtype=object)

    json_df = df.select(col).mapInPandas(_gen, f"{col} string")
    return parse_otlp_summaries_json(json_df, col)


# ---------------------------------------------------------------------------
# intHistogram member (metric oneof field 8; IntHistogram
# metrics.pb.go:727-732, IntHistogramDataPoint :1087-1124 — the last pdata
# metric data type, model/pdata/metrics.go:138). Same wire layout as the
# doubleHistogram datapoint except sum (field 5) is an sfixed64 int64
# (metrics.pb.go:1115), the q192+q193 composition: packed fixed64
# bucketCounts, packed double explicitBounds, two's-complement int sum.
# ---------------------------------------------------------------------------


def _ihdp(
    labels: list[tuple[str, str]],
    t_nanos: int | None,
    count: int,
    h_sum: int,
    bucket_counts: list[int],
    explicit_bounds: list[float],
) -> bytes:
    out = b""
    for k, v in labels:
        out += _ld(1, _ld(1, k.encode()) + _ld(2, v.encode()))
    if t_nanos:
        out += _f64(3, int(t_nanos))
    if count:
        out += _f64(4, int(count))
    if h_sum:
        out += _f64(5, int(h_sum) & ((1 << 64) - 1))  # sfixed64 two's complement
    if bucket_counts:
        out += _packed_f64(6, bucket_counts)
    if explicit_bounds:
        out += _packed_f64(7, [_double_bits(b) for b in explicit_bounds])
    return out


def encode_int_histogram_metric(name: str, dps: list[bytes]) -> bytes:
    body = b"".join(_ld(1, d) for d in dps)
    return _ld(1, name.encode()) + _ld(
        8, body + _vi(2, _TEMPORALITY_CUMULATIVE_VALUE)
    )


def to_otlp_int_histograms_proto(
    df: DataFrame, out_col: str = "value", with_metric: bool = False
) -> DataFrame:
    """INT histogram datapoint frame -> one binary envelope per metric,
    to_otlp_int_histograms_json's deterministic datapoint order.
    ``with_metric=True`` keeps the grouping key beside the payload (the
    Kafka message-key analog — and what lets the q197 wire oracle join
    its SQL-reconstructed envelope to ours, the q186 pattern)."""
    from opentelemetry_collector_spark.sources.codecs import _nanos
    from opentelemetry_collector_spark.sources.otlp_metric import _sorted_labels

    dp = F.struct(
        _nanos(F.col("ts")).alias("t_nanos"),
        F.to_json(_sorted_labels()).alias("labels_json"),
        F.col("h_count").alias("h_count"),
        F.col("h_sum").alias("h_sum"),
        F.to_json(F.col("bucket_counts")).alias("counts_json"),
        F.to_json(F.col("explicit_bounds")).alias("bounds_json"),
    )
    grouped = df.groupBy("metric").agg(F.array_sort(F.collect_list(dp)).alias("dps"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, vals = [], []
            for name, dps in zip(pdf["metric"], pdf["dps"]):
                blobs = [
                    _ihdp(
                        [(e["key"], e["value"]) for e in json.loads(d["labels_json"] or "[]")],
                        d["t_nanos"],
                        int(d["h_count"] or 0),
                        int(d["h_sum"] or 0),
                        json.loads(d["counts_json"] or "[]"),
                        json.loads(d["bounds_json"] or "[]"),
                    )
                    for d in dps
                ]
                metric = encode_int_histogram_metric(name, blobs)
                ilm = _ld(1, _ld(1, _LIB_NAME.encode())) + _ld(2, metric)
                names.append(name)
                vals.append(_ld(1, _ld(1, b"") + _ld(2, ilm)))
            cols = {"metric": names, out_col: vals} if with_metric else {out_col: vals}
            yield pd.DataFrame(cols)

    schema = (f"metric string, {out_col} binary" if with_metric else f"{out_col} binary")
    return grouped.mapInPandas(_gen, schema)


def _dec_ihdp(buf: bytes, span: tuple[int, int]) -> dict:
    dp: dict = {
        "labels": [], "timeUnixNano": None, "count": None, "sum": None,
        "bucketCounts": None, "explicitBounds": None,
    }
    counts: list[int] = []
    bounds: list[float] = []
    for fno, wt, v in _fields(buf, *span):
        if fno == 1 and wt == 2:
            kv = {"key": None, "value": None}
            for f2, w2, v2 in _fields(buf, *v):
                if f2 == 1 and w2 == 2:
                    kv["key"] = _utf8(buf, v2)
                elif f2 == 2 and w2 == 2:
                    kv["value"] = _utf8(buf, v2)
            dp["labels"].append(kv)
        elif fno == 3 and wt == 1:
            dp["timeUnixNano"] = str(v) if v else None
        elif fno == 4 and wt == 1:
            dp["count"] = str(v) if v else None
        elif fno == 5 and wt == 1:
            iv = v - (1 << 64) if v >= 1 << 63 else v
            dp["sum"] = str(iv) if iv else None  # jsonpb int64 string, omit-zero
        elif fno == 6:
            counts += _unpack_f64s(buf, v) if wt == 2 else [v]
        elif fno == 7:
            raw = _unpack_f64s(buf, v) if wt == 2 else [v]
            bounds += [_struct.unpack("<d", int(x).to_bytes(8, "little"))[0] for x in raw]
    if counts:
        dp["bucketCounts"] = [str(c) for c in counts]
    if bounds:
        dp["explicitBounds"] = bounds
    if not dp["labels"]:
        dp.pop("labels")
    return dp


def decode_otlp_int_histograms(buf: bytes) -> dict:
    """ExportMetricsServiceRequest (intHistogram member) -> the jsonpb
    dialect dict parse_otlp_int_histograms_json understands."""
    rms = []
    for fno, wt, rm_span in _fields(buf, 0, len(buf)):
        if fno != 1 or wt != 2:
            continue
        ilms = []
        for f2, w2, v2 in _fields(buf, *rm_span):
            if f2 != 2 or w2 != 2:
                continue
            ilm: dict = {"metrics": []}
            for f3, w3, v3 in _fields(buf, *v2):
                if f3 != 2 or w3 != 2:
                    continue
                metric: dict = {"name": None}
                for f4, w4, v4 in _fields(buf, *v3):
                    if f4 == 1 and w4 == 2:
                        metric["name"] = _utf8(buf, v4)
                    elif f4 == 8 and w4 == 2:  # int_histogram
                        hist: dict = {"dataPoints": []}
                        for f5, w5, v5 in _fields(buf, *v4):
                            if f5 == 1 and w5 == 2:
                                hist["dataPoints"].append(_dec_ihdp(buf, v5))
                            elif f5 == 2 and w5 == 0:
                                hist["aggregationTemporality"] = (
                                    "AGGREGATION_TEMPORALITY_CUMULATIVE"
                                    if v5 == _TEMPORALITY_CUMULATIVE_VALUE
                                    else str(v5)
                                )
                        metric["intHistogram"] = hist
                ilm["metrics"].append(metric)
            ilms.append(ilm)
        rms.append({"instrumentationLibraryMetrics": ilms})
    return {"resourceMetrics": rms}


def parse_otlp_int_histograms_proto(df: DataFrame, col: str = "value") -> DataFrame:
    """Binary intHistogram envelopes -> the INT histogram frame via the
    SHARED dialect parser (parse_otlp_int_histograms_json)."""
    from opentelemetry_collector_spark.sources.otlp_metric import (
        parse_otlp_int_histograms_json,
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for buf in pdf[col]:
                if buf is None:
                    continue
                try:
                    lines.append(json.dumps(decode_otlp_int_histograms(bytes(buf))))
                except _Malformed:
                    continue
            yield pd.DataFrame({col: lines}, dtype=object)

    json_df = df.select(col).mapInPandas(_gen, f"{col} string")
    return parse_otlp_int_histograms_json(json_df, col)
