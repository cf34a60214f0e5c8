"""Binary trace wire codecs: jaeger_proto, zipkin_proto, zipkin_thrift.

Pure-byte goldens (hand-assembled, independent of the encoders) + junk
policy + Spark-level roundtrips through the UNMARSHALERS registry."""

from __future__ import annotations

import datetime as dt
import struct

from opentelemetry_collector_spark.sources.jaeger_proto import (
    decode_jaeger_span,
    encode_jaeger_span,
)
from opentelemetry_collector_spark.sources.otlp_proto import _ld, _vi
from opentelemetry_collector_spark.sources.zipkin_proto import (
    decode_zipkin_spans,
    encode_zipkin_span,
)
from opentelemetry_collector_spark.sources.zipkin_thrift import (
    decode_thrift_spans,
    encode_v1_thrift_span,
    serialize_thrift_spans,
)

_ROW = dict(
    trace_id="0af7651916cd43dd8448eb211c80319c",
    span_id="b7ad6b7169203331",
    parent_span_id="00f067aa0ba902b7",
    name="GET /api",
    kind=3,
    status_code=2,
    status_message="boom",
    service_name="frontend",
    start_us=1_700_000_000_123_456,
    duration_us=4_000,
    attrs={"turn.idx": "3", "tool": "calc"},
)


class TestJaegerProto:
    def test_roundtrip_all_fields(self):
        d = decode_jaeger_span(encode_jaeger_span(dict(_ROW), False, False))
        assert d["traceID"] == _ROW["trace_id"]
        assert d["spanID"] == _ROW["span_id"]
        assert d["operationName"] == "GET /api"
        assert d["references"] == [
            {"refType": "CHILD_OF", "traceID": _ROW["trace_id"], "spanID": _ROW["parent_span_id"]}
        ]
        assert d["startTime"] == _ROW["start_us"] and d["duration"] == 4000
        assert d["process"] == {"serviceName": "frontend"}
        tags = {t["key"]: (t["type"], t["value"]) for t in d["tags"]}
        assert tags["span.kind"] == ("string", "client")
        assert tags["status.code"] == ("int64", "2")
        assert tags["error"] == ("bool", "true")
        assert tags["status.message"] == ("string", "boom")
        assert tags["turn.idx"] == ("string", "3")

    def test_timestamp_message_golden(self):
        # start_time = Timestamp{seconds=1700000000, nanos=123456000} at field 6
        b = encode_jaeger_span(dict(_ROW), False, False)
        ts_payload = _vi(1, 1_700_000_000) + _vi(2, 123_456_000)
        assert _ld(6, ts_payload) in b

    def test_unknown_fields_and_junk(self):
        good = encode_jaeger_span(dict(_ROW), False, False)
        spliced = _vi(99, 7) + _ld(55, b"junk") + good
        d = decode_jaeger_span(spliced)
        assert d["traceID"] == _ROW["trace_id"]

    def test_unspecified_kind_no_tag(self):
        row = dict(_ROW, kind=0, status_code=0, status_message="", attrs={})
        tags = {t["key"] for t in decode_jaeger_span(encode_jaeger_span(row, False, False))["tags"]}
        assert tags == {"status.code"}


class TestZipkinProto:
    def test_roundtrip_all_fields(self):
        payload = _ld(1, encode_zipkin_span(dict(_ROW), False, False))
        (s,) = decode_zipkin_spans(payload)
        assert s["traceId"] == _ROW["trace_id"]
        assert s["id"] == _ROW["span_id"]
        assert s["parentId"] == _ROW["parent_span_id"]
        assert s["kind"] == "CLIENT"
        assert s["timestamp"] == _ROW["start_us"] and s["duration"] == 4000
        assert s["localEndpoint"] == {"serviceName": "frontend"}
        assert s["tags"]["status.code"] == "STATUS_CODE_ERROR"
        assert s["tags"]["status.message"] == "boom"
        assert s["tags"]["turn.idx"] == "3"

    def test_internal_kind_becomes_tag(self):
        row = dict(_ROW, kind=1, status_code=0, status_message="")
        (s,) = decode_zipkin_spans(_ld(1, encode_zipkin_span(row, False, False)))
        assert s["kind"] is None and s["tags"]["span.kind"] == "internal"

    def test_multiple_spans_per_list(self):
        a = encode_zipkin_span(dict(_ROW), False, False)
        b = encode_zipkin_span(dict(_ROW, span_id="ffffffffffffffff"), False, False)
        got = decode_zipkin_spans(_ld(1, a) + _ld(1, b))
        assert [s["id"] for s in got] == [_ROW["span_id"], "ffffffffffffffff"]

    def test_fixed64_micros_golden(self):
        b = encode_zipkin_span(dict(_ROW), False, False)
        assert bytes([6 << 3 | 1]) + _ROW["start_us"].to_bytes(8, "little") in b


class TestZipkinThrift:
    _SPAN = {
        "traceId": "0af7651916cd43dd8448eb211c80319c",
        "id": "b7ad6b7169203331",
        "parentId": "00f067aa0ba902b7",
        "name": "op",
        "timestamp": 1_700_000_000_123_456,
        "duration": 4000,
        "annotations": [
            {"timestamp": 1_700_000_000_123_456, "value": "cs",
             "endpoint": {"serviceName": "frontend"}}
        ],
        "binaryAnnotations": [
            {"key": "tool", "value": "calc", "endpoint": {"serviceName": "frontend"}}
        ],
    }

    def test_roundtrip(self):
        payload = serialize_thrift_spans([encode_v1_thrift_span(dict(self._SPAN))])
        (s,) = decode_thrift_spans(payload)
        for k in ("traceId", "id", "parentId", "name", "timestamp", "duration"):
            assert s[k] == self._SPAN[k], k
        assert s["annotations"][0]["value"] == "cs"
        assert s["annotations"][0]["endpoint"]["serviceName"] == "frontend"
        assert s["binaryAnnotations"][0] == {
            "key": "tool", "value": "calc", "endpoint": {"serviceName": "frontend"}
        }

    def test_low_only_trace_id(self):
        span = dict(self._SPAN, traceId="8448eb211c80319c")
        (s,) = decode_thrift_spans(serialize_thrift_spans([encode_v1_thrift_span(span)]))
        assert s["traceId"] == "8448eb211c80319c"  # no high half -> 16 hex

    def test_typed_binary_annotation_values(self):
        # hand-build I64 + BOOL + DOUBLE binary annotations
        def ban(key: bytes, raw: bytes, ann_type: int) -> bytes:
            return (
                bytes([11]) + struct.pack(">h", 1) + struct.pack(">i", len(key)) + key
                + bytes([11]) + struct.pack(">h", 2) + struct.pack(">i", len(raw)) + raw
                + bytes([8]) + struct.pack(">h", 3) + struct.pack(">i", ann_type)
                + bytes([0])
            )

        body = (
            bytes([10]) + struct.pack(">h", 1) + struct.pack(">q", 7)       # trace_id
            + bytes([10]) + struct.pack(">h", 4) + struct.pack(">q", 9)     # id
            + bytes([15]) + struct.pack(">h", 8) + bytes([12]) + struct.pack(">i", 3)
            + ban(b"n", struct.pack(">q", -5), 4)
            + ban(b"b", b"\x01", 0)
            + ban(b"d", struct.pack(">d", 2.5), 5)
            + bytes([0])
        )
        payload = bytes([12]) + struct.pack(">i", 1) + body
        (s,) = decode_thrift_spans(payload)
        vals = {b["key"]: b["value"] for b in s["binaryAnnotations"]}
        assert vals == {"n": "-5", "b": "true", "d": "2.5"}

    def test_truncated_refuses(self):
        payload = serialize_thrift_spans([encode_v1_thrift_span(dict(self._SPAN))])
        import pytest

        with pytest.raises(Exception):
            decode_thrift_spans(payload[:-4])


class TestSparkRegistry:
    def _frame(self, spark):
        rows = [
            ("0af7651916cd43dd8448eb211c80319c", "b7ad6b7169203331", None, "root", 2,
             0, "", "svc-a", dt.datetime(2024, 5, 1, 8, 0, 0, 250000), 1500,
             {"turn.idx": "0"}),
            ("0af7651916cd43dd8448eb211c80319c", "00f067aa0ba902b7", "b7ad6b7169203331",
             "child", 3, 2, "error code=7", "svc-b",
             dt.datetime(2024, 5, 1, 8, 0, 1), 900, {"turn.idx": "1", "tool": "calc"}),
        ]
        return spark.createDataFrame(
            rows,
            "trace_id string, span_id string, parent_span_id string, name string,"
            " kind int, status_code int, status_message string, service_name string,"
            " ts timestamp, duration_us bigint, attrs map<string,string>",
        )

    def test_jaeger_proto_roundtrip_spark(self, spark):
        from opentelemetry_collector_spark.sources.codecs import unmarshal
        from opentelemetry_collector_spark.sources.jaeger_proto import to_jaeger_proto

        src = self._frame(spark)
        back = unmarshal(to_jaeger_proto(src), "jaeger_proto")
        a = {r["span_id"]: r.asDict() for r in src.collect()}
        b = {r["span_id"]: r.asDict() for r in back.select(*src.columns).collect()}
        assert a == b

    def test_zipkin_proto_roundtrip_spark(self, spark):
        from opentelemetry_collector_spark.sources.codecs import unmarshal
        from opentelemetry_collector_spark.sources.zipkin_proto import to_zipkin_proto

        src = self._frame(spark)
        back = unmarshal(to_zipkin_proto(src), "zipkin_proto")
        a = {r["span_id"]: r.asDict() for r in src.collect()}
        b = {r["span_id"]: r.asDict() for r in back.select(*src.columns).collect()}
        assert a == b


class TestOtlpTracesProto:
    def test_roundtrip_pure_python(self):
        from opentelemetry_collector_spark.sources.otlp_trace_proto import (
            decode_otlp_traces,
            encode_otlp_span,
        )
        from opentelemetry_collector_spark.sources.otlp_proto import _ld
        from opentelemetry_collector_spark.sources.codecs import _LIB_NAME

        row = dict(
            trace_id=_ROW["trace_id"], span_id=_ROW["span_id"],
            parent_span_id=_ROW["parent_span_id"], name="op", kind=3,
            status_code=2, status_message="boom",
            start_ns=1_700_000_000_123_456_000, end_ns=1_700_000_000_127_456_000,
            attrs={"turn.idx": "3", "tool": "calc"},
        )
        resource = _ld(1, _ld(1, b"service.name") + _ld(2, _ld(1, b"svc")))
        ill = _ld(1, _ld(1, _LIB_NAME.encode())) + _ld(2, encode_otlp_span(row))
        req = _ld(1, _ld(1, resource) + _ld(2, ill))
        env = decode_otlp_traces(req)
        (rs,) = env["resourceSpans"]
        assert rs["resource"]["attributes"][0] == {
            "key": "service.name", "value": {"stringValue": "svc"}
        }
        (span,) = rs["instrumentationLibrarySpans"][0]["spans"]
        assert span["traceId"] == row["trace_id"]
        assert span["parentSpanId"] == row["parent_span_id"]
        assert span["kind"] == "SPAN_KIND_CLIENT"
        assert span["startTimeUnixNano"] == str(row["start_ns"])
        assert span["status"] == {
            "deprecatedCode": "DEPRECATED_STATUS_CODE_UNKNOWN_ERROR",
            "message": "boom", "code": "STATUS_CODE_ERROR",
        }
        attrs = {a["key"]: a["value"] for a in span["attributes"]}
        assert attrs == {"turn.idx": {"intValue": "3"}, "tool": {"stringValue": "calc"}}

    def test_unset_status_always_on_wire(self):
        from opentelemetry_collector_spark.sources.otlp_trace_proto import encode_otlp_span

        row = dict(
            trace_id=_ROW["trace_id"], span_id=_ROW["span_id"], parent_span_id=None,
            name="n", kind=0, status_code=0, status_message="",
            start_ns=None, end_ns=None, attrs={},
        )
        b = encode_otlp_span(row)
        assert b.endswith(bytes([15 << 3 | 2, 0]))  # "status": {} — empty but present

    def test_spark_registry_roundtrip(self, spark):
        from opentelemetry_collector_spark.sources.codecs import unmarshal
        from opentelemetry_collector_spark.sources.otlp_trace_proto import (
            to_otlp_traces_proto,
        )

        src = TestSparkRegistry()._frame(spark)
        back = unmarshal(to_otlp_traces_proto(src), "otlp_proto_traces")
        a = {r["span_id"]: r.asDict() for r in src.collect()}
        b = {r["span_id"]: r.asDict() for r in back.select(*src.columns).collect()}
        assert a == b


class TestOtlpMetricsProto:
    def test_roundtrip_pure_python(self):
        from opentelemetry_collector_spark.sources.otlp_metric_proto import (
            _dp,
            decode_otlp_metrics,
            encode_metric,
        )
        from opentelemetry_collector_spark.sources.otlp_proto import _ld
        from opentelemetry_collector_spark.sources.codecs import _LIB_NAME

        dp = _dp([("user", "42")], 1_700_000_000_000_000_000, 12.5)
        metric = encode_metric("purchase", "sum_cumulative_monotonic", [dp])
        ilm = _ld(1, _ld(1, _LIB_NAME.encode())) + _ld(2, metric)
        req = _ld(1, _ld(1, b"") + _ld(2, ilm))
        env = decode_otlp_metrics(req)
        (m,) = env["resourceMetrics"][0]["instrumentationLibraryMetrics"][0]["metrics"]
        assert m["name"] == "purchase"
        s = m["doubleSum"]
        assert s["aggregationTemporality"] == "AGGREGATION_TEMPORALITY_CUMULATIVE"
        assert s["isMonotonic"] is True
        (point,) = s["dataPoints"]
        assert point["labels"] == [{"key": "user", "value": "42"}]
        assert point["timeUnixNano"] == "1700000000000000000"
        assert point["value"] == 12.5

    def test_zero_value_omitted(self):
        from opentelemetry_collector_spark.sources.otlp_metric_proto import (
            _dp,
            decode_otlp_metrics,
            encode_metric,
        )
        from opentelemetry_collector_spark.sources.otlp_proto import _ld

        dp = _dp([], 1, 0.0)
        req = _ld(1, _ld(2, _ld(2, encode_metric("g", "gauge", [dp]))))
        (m,) = decode_otlp_metrics(req)["resourceMetrics"][0][
            "instrumentationLibraryMetrics"
        ][0]["metrics"]
        (point,) = m["doubleGauge"]["dataPoints"]
        assert point["value"] is None  # absent member, parser coalesces to 0.0


class TestOtlpHistogramProto:
    def test_roundtrip_pure_python(self):
        from opentelemetry_collector_spark.sources.otlp_metric_proto import (
            _hdp,
            decode_otlp_histograms,
            encode_histogram_metric,
        )
        from opentelemetry_collector_spark.sources.otlp_proto import _ld

        dp = _hdp([("conv", "c-1")], 1_700_000_000_000_000_000, 7, 123.5,
                  [1, 2, 0, 4], [10.0, 50.0, 100.0])
        req = _ld(1, _ld(2, _ld(2, encode_histogram_metric("latency", [dp]))))
        env = decode_otlp_histograms(req)
        (m,) = env["resourceMetrics"][0]["instrumentationLibraryMetrics"][0]["metrics"]
        assert m["name"] == "latency"
        h = m["doubleHistogram"]
        assert h["aggregationTemporality"] == "AGGREGATION_TEMPORALITY_CUMULATIVE"
        (point,) = h["dataPoints"]
        assert point["labels"] == [{"key": "conv", "value": "c-1"}]
        assert point["count"] == "7"
        assert point["sum"] == 123.5
        # packed fixed64 roundtrip — including the ZERO bucket element
        assert point["bucketCounts"] == ["1", "2", "0", "4"]
        assert point["explicitBounds"] == [10.0, 50.0, 100.0]

    def test_unpacked_repeated_accepted(self):
        # some encoders emit repeated fixed64 UNPACKED (one I64 field per
        # element) — the decoder must accept both representations
        from opentelemetry_collector_spark.sources.otlp_metric_proto import _dec_hdp
        from opentelemetry_collector_spark.sources.otlp_proto import _f64

        raw = _f64(6, 5) + _f64(6, 9)
        dp = _dec_hdp(raw, (0, len(raw)))
        assert dp["bucketCounts"] == ["5", "9"]


class TestStreamingDecode:
    def test_otlp_proto_decode_runs_inside_streaming_plan(self, spark, tmp_path):
        """A Kafka landing job is readStream -> unmarshal -> sink; the
        otlp_proto decode (mapInPandas) must run unchanged inside a
        Structured Streaming plan — the same proof the relabel chain got
        in round 2. Batch-encode envelopes to a landing dir, stream them
        back through the registry decoder, compare with the batch parse."""
        import datetime as dt

        from opentelemetry_collector_spark.sources.codecs import unmarshal
        from opentelemetry_collector_spark.sources.otlp_proto import to_otlp_proto

        rows = [
            ("c-1", 0, "user", "hello", None, dt.datetime(2024, 5, 1, 8, 0, 0)),
            ("c-1", 1, "assistant", "hi", "calc", dt.datetime(2024, 5, 1, 8, 0, 1)),
            ("c-2", 0, "tool", "lookup", "search", dt.datetime(2024, 5, 1, 8, 0, 2)),
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )
        landing = str(tmp_path / "landing")
        to_otlp_proto(df).write.parquet(landing)

        stream = spark.readStream.schema("value binary").parquet(landing)
        decoded = unmarshal(stream, "otlp_proto")
        assert decoded.isStreaming
        out = str(tmp_path / "out")
        q = (
            decoded.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        want = sorted(tuple(r) for r in unmarshal(spark.read.parquet(landing), "otlp_proto").collect())
        assert got == want and len(got) == 3


class TestNullTimestampEncode:
    """ADVICE r3: the span frame's ts is nullable; a null arrives in the
    mapInPandas batch as NaN (truthy!) and int(NaN) crashed the encode
    task. Null-ts spans must encode (epoch/absent ts) on every wire."""

    def _null_ts_frame(self, spark):
        rows = [
            ("0af7651916cd43dd8448eb211c80319c", "b7ad6b7169203331", None, "root",
             2, 0, "", "svc-a", None, 1500, {"turn.idx": "0"}),
            ("0af7651916cd43dd8448eb211c80319c", "00f067aa0ba902b7", "b7ad6b7169203331",
             "child", 3, 0, "", "svc-b", dt.datetime(2024, 5, 1, 8, 0, 1), 900, {}),
        ]
        return spark.createDataFrame(
            rows,
            "trace_id string, span_id string, parent_span_id string, name string,"
            " kind int, status_code int, status_message string, service_name string,"
            " ts timestamp, duration_us bigint, attrs map<string,string>",
        )

    def test_jaeger_proto_null_ts(self, spark):
        from opentelemetry_collector_spark.sources.jaeger_proto import to_jaeger_proto

        payloads = [bytes(r["value"]) for r in to_jaeger_proto(self._null_ts_frame(spark)).collect()]
        assert len(payloads) == 2
        by_span = {decode_jaeger_span(p)["spanID"]: decode_jaeger_span(p) for p in payloads}
        assert by_span["b7ad6b7169203331"]["startTime"] == 0
        assert by_span["00f067aa0ba902b7"]["startTime"] == 1_714_550_401_000_000

    def test_otlp_trace_proto_null_ts(self, spark):
        from opentelemetry_collector_spark.sources.otlp_trace_proto import (
            parse_otlp_traces_proto,
            to_otlp_traces_proto,
        )

        wire = to_otlp_traces_proto(self._null_ts_frame(spark))
        back = {r["span_id"]: r.asDict() for r in parse_otlp_traces_proto(wire).collect()}
        assert set(back) == {"b7ad6b7169203331", "00f067aa0ba902b7"}
        assert back["b7ad6b7169203331"]["ts"] is None
        assert back["00f067aa0ba902b7"]["ts"] == dt.datetime(2024, 5, 1, 8, 0, 1)


class TestThriftTraceFraming:
    def test_one_payload_per_trace_across_arrow_batches(self, spark):
        """ADVICE r3: batch-local grouping split a trace straddling the
        Arrow maxRecordsPerBatch boundary into multiple payloads; the
        groupBy/collect_list form keeps one payload per trace regardless
        of batch size."""
        import json as _json

        from opentelemetry_collector_spark.sources.zipkin_thrift import thrift_from_v1_json

        spans = [
            _json.dumps({
                "traceId": ("a" if i < 9 else "b") * 32, "id": f"{i:016x}",
                "parentId": None, "name": "op",
                "timestamp": 1_700_000_000_000_000 + i, "duration": 10,
                "annotations": [], "binaryAnnotations": [],
            })
            for i in range(12)
        ]
        df = spark.createDataFrame([(s,) for s in spans], "value string")
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        try:
            payloads = [bytes(r["value"]) for r in thrift_from_v1_json(df).collect()]
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
        assert len(payloads) == 2
        assert sorted(len(decode_thrift_spans(p)) for p in payloads) == [3, 9]


class TestOtlpIntHistogramProto:
    """intHistogram — metric oneof field 8 (IntHistogram metrics.pb.go:
    727-732, IntHistogramDataPoint :1087-1124): the doubleHistogram bucket
    wire with an sfixed64 int64 sum (:1115)."""

    def test_roundtrip_pure_python(self):
        from opentelemetry_collector_spark.sources.otlp_metric_proto import (
            _ihdp,
            decode_otlp_int_histograms,
            encode_int_histogram_metric,
        )
        from opentelemetry_collector_spark.sources.otlp_proto import _ld

        # sum beyond double's 53-bit mantissa: 2^53 + 3 survives ONLY on an
        # integer path (float64 rounds it to 2^53) — the member's reason
        big = (1 << 53) + 3
        dp = _ihdp([("conv", "c-1")], 1_700_000_000_000_000_000, 7, big,
                   [1, 2, 0, 4], [10.0, 50.0, 100.0])
        req = _ld(1, _ld(2, _ld(2, encode_int_histogram_metric("turn_len", [dp]))))
        env = decode_otlp_int_histograms(req)
        (m,) = env["resourceMetrics"][0]["instrumentationLibraryMetrics"][0]["metrics"]
        assert m["name"] == "turn_len"
        h = m["intHistogram"]
        assert h["aggregationTemporality"] == "AGGREGATION_TEMPORALITY_CUMULATIVE"
        (point,) = h["dataPoints"]
        assert point["labels"] == [{"key": "conv", "value": "c-1"}]
        assert point["count"] == "7"
        assert point["sum"] == str(big)  # jsonpb int64 string, bit-exact
        assert point["bucketCounts"] == ["1", "2", "0", "4"]
        assert point["explicitBounds"] == [10.0, 50.0, 100.0]

    def test_negative_sum_twos_complement(self):
        from opentelemetry_collector_spark.sources.otlp_metric_proto import (
            _ihdp,
            _dec_ihdp,
        )

        raw = _ihdp([], None, 1, -42, [], [])
        assert _dec_ihdp(raw, (0, len(raw)))["sum"] == "-42"

    def test_omit_zero_sum_reads_back_absent(self):
        from opentelemetry_collector_spark.sources.otlp_metric_proto import (
            _ihdp,
            _dec_ihdp,
        )

        raw = _ihdp([], None, 3, 0, [1], [])
        dp = _dec_ihdp(raw, (0, len(raw)))
        assert dp["sum"] is None and dp["count"] == "3"

    def test_spark_both_wires_bigint_exact(self, spark):
        """JSON and proto wires agree and keep an int64 sum > 2^53 exact
        through marshal -> parse on each wire."""
        from opentelemetry_collector_spark.sources.otlp_metric import (
            parse_otlp_int_histograms_json,
            to_otlp_int_histograms_json,
        )
        from opentelemetry_collector_spark.sources.otlp_metric_proto import (
            parse_otlp_int_histograms_proto,
            to_otlp_int_histograms_proto,
        )

        big = (1 << 53) + 3
        frame = spark.createDataFrame(
            [("turn_len", {"conv": "c-1"}, None, [1, 2, 0], [16.0, 32.0], big, 3),
             ("turn_len", {"conv": "c-2"}, dt.datetime(2024, 5, 1, 8, 0, 0), [5, 0, 1],
              [16.0, 32.0], -7, 6)],
            "metric string, labels map<string,string>, ts timestamp,"
            " bucket_counts array<bigint>, explicit_bounds array<double>,"
            " h_sum bigint, h_count bigint",
        )
        for rt in (
            lambda f: parse_otlp_int_histograms_json(to_otlp_int_histograms_json(f)),
            lambda f: parse_otlp_int_histograms_proto(to_otlp_int_histograms_proto(f)),
        ):
            back = rt(frame)
            assert dict(back.dtypes)["h_sum"] == "bigint"
            got = {r["labels"]["conv"]: r.asDict() for r in back.collect()}
            assert got["c-1"]["h_sum"] == big
            assert got["c-1"]["bucket_counts"] == [1, 2, 0]
            assert got["c-2"]["h_sum"] == -7
            assert got["c-2"]["ts"] == dt.datetime(2024, 5, 1, 8, 0, 0)

    def test_mutation_fuzz_decoder_total(self):
        import random

        from opentelemetry_collector_spark.sources.otlp_metric_proto import (
            _ihdp,
            _Malformed,
            decode_otlp_int_histograms,
            encode_int_histogram_metric,
        )
        from opentelemetry_collector_spark.sources.otlp_proto import _ld

        rng = random.Random(46)
        dp = _ihdp([("k", "v")], 1_700_000_000_000_000_000, 7, (1 << 60) + 9,
                   [1, 2, 0, 4], [10.0, 50.0])
        payload = _ld(1, _ld(2, _ld(2, encode_int_histogram_metric("m", [dp, dp]))))
        for _ in range(300):
            b = bytearray(payload)
            op = rng.randrange(3)
            if op == 0 and b:
                i = rng.randrange(len(b))
                b[i] ^= 1 << rng.randrange(8)
            elif op == 1:
                b = b[: rng.randrange(len(b) + 1)]
            else:
                i = rng.randrange(len(b) + 1)
                b[i:i] = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
            try:
                decode_otlp_int_histograms(bytes(b))
            except _Malformed:
                pass

def test_zipkin_proto_null_ts(spark):
    """zipkin_proto's encoder receives spans as dicts from a collected
    array (nulls arrive as None, not NaN) — pin that a null-ts span
    encodes there too, completing the null-ts matrix across all three
    trace wires."""
    from opentelemetry_collector_spark.sources.zipkin_proto import to_zipkin_proto

    frame = TestNullTimestampEncode()._null_ts_frame(spark)
    payloads = [bytes(r["value"]) for r in to_zipkin_proto(frame).collect()]
    spans = [s for p in payloads for s in decode_zipkin_spans(p)]
    by_id = {s["id"]: s for s in spans}
    assert set(by_id) == {"b7ad6b7169203331", "00f067aa0ba902b7"}
    # omitted on the wire; proto3 absent fixed64 reads back zero
    assert not by_id["b7ad6b7169203331"]["timestamp"]
    assert by_id["00f067aa0ba902b7"]["timestamp"] == 1_714_550_401_000_000
