"""Codec + sink-physical-options tests (SURVEY §2.2 / §2.5).

Codec gate: marshal->unmarshal is the identity on every turn (the
pb_marshaler/json_marshaler round-trip tests' analog). Sink gate: keyed
repartition and hive partitioning change the LAYOUT, never the row set
(record-count invariance, the batch-processor contract).
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.pipeline import SinkSpec, write_sink
from opentelemetry_collector_spark.sources.codecs import (
    UNMARSHALERS,
    parse_otlp_json,
    parse_turn_json,
    to_otlp_json,
    to_turn_json,
    unmarshal,
)
from opentelemetry_collector_spark.sources.transcripts import synthesize


def _key(df):
    return {tuple(r) for r in df.select("conv_id", "turn_idx", "role", "text", "tool", "ts").collect()}


def test_turn_json_roundtrip_identity(spark, tiny):
    wire = to_turn_json(tiny)
    assert wire.columns == ["value"]
    back = parse_turn_json(wire)
    assert _key(back) == _key(tiny)


def test_turn_json_handles_special_text(spark):
    rows = [
        ("c", 0, "user", 'quote " backslash \\ newline \n tab \t', None, None),
        ("c", 1, "user", "héllo ∑ (.*+?)", "calc", None),
        ("c", 2, "user", "", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    back = parse_turn_json(to_turn_json(df))
    assert _key(back) == _key(df)


def test_malformed_json_yields_nulls_not_errors(spark):
    df = spark.createDataFrame([("{not json",), ('{"conv_id": "c"}',)], ["value"])
    out = parse_turn_json(df).collect()
    assert out[0].conv_id is None  # refused-record, not an exception
    assert out[1].conv_id == "c"


def test_otlp_envelope_roundtrip_identity(spark, tiny):
    wire = to_otlp_json(tiny)
    # one envelope per conversation (one ResourceLogs per resource)
    assert wire.count() == tiny.select("conv_id").distinct().count()
    back = parse_otlp_json(wire)
    assert _key(back) == _key(tiny)


def test_otlp_envelope_wire_shape(spark):
    """jsonpb parity details: 64-bit ints as JSON strings, attributes as a
    key/value LIST, omit-empty for null tool, stable turn order."""
    import json

    rows = [
        ("c1", 1, "assistant", "later", None, "2025-01-01T00:00:02"),
        ("c1", 0, "user", "hi", "calc", "2025-01-01T00:00:01"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    doc = json.loads(to_otlp_json(df).collect()[0].value)
    rl = doc["resourceLogs"][0]
    assert rl["resource"]["attributes"][0] == {
        "key": "conv.id",
        "value": {"stringValue": "c1"},
    }
    recs = rl["instrumentationLibraryLogs"][0]["logRecords"]
    assert [r["body"]["stringValue"] for r in recs] == ["hi", "later"]  # turn order
    assert isinstance(recs[0]["timeUnixNano"], str)  # int64-as-string
    a0 = {kv["key"]: kv["value"] for kv in recs[0]["attributes"]}
    assert a0["turn.idx"] == {"intValue": "0"}
    assert a0["tool"] == {"stringValue": "calc"}
    a1 = {kv["key"]: kv["value"] for kv in recs[1]["attributes"]}
    assert "tool" not in a1  # omit-empty


def test_otlp_unmarshaler_in_registry(spark, tiny):
    assert "otlp_json" in UNMARSHALERS
    back = unmarshal(to_otlp_json(tiny), "otlp_json")
    assert back.count() == tiny.count()


def test_kv_text_encoding(spark):
    df = spark.createDataFrame(
        [("conv_id=c1 turn_idx=3 role=user text=hello_world ts=2025-01-01T00:00:05",)], ["value"]
    )
    row = unmarshal(df, "kv_text").collect()[0]
    assert (row.conv_id, row.turn_idx, row.role, row.text) == ("c1", 3, "user", "hello world")
    assert row.ts is not None


def test_unmarshaler_registry_dispatch(spark):
    assert set(UNMARSHALERS) == {
        # binary wires (r3): the reference's full six-encoding Kafka
        # registry (unmarshaler.go:52-82) plus the per-signal otlp_proto
        # twins (the Go registries are per-signal; we suffix instead)
        "otlp_proto",
        "otlp_proto_traces",
        "otlp_proto_metrics",
        "jaeger_proto",
        "zipkin_proto",
        "zipkin_thrift",
        # text/JSON family
        "turn_json",
        "kv_text",
        "otlp_json",
        "otlp_json_nested",  # r4: composite-AnyValue variant (SURVEY §1.3)
        "zipkin_json",
        "jaeger_json",
        "oc_json",
        "oc_metrics_json",
    }
    with pytest.raises(ValueError, match="unknown encoding"):
        unmarshal(None, "otlp_thrift")


def test_keyed_sink_write_preserves_rows_and_colocates(spark, tmp_path, small):
    path = str(tmp_path / "keyed")
    spec = SinkSpec(
        name="k",
        predicate=F.lit(True),
        path=path,
        repartition_key="conv_id",
        max_records_per_file=5000,
    )
    write_sink(small, spec)
    back = spark.read.parquet(path)
    assert back.count() == small.count()
    # co-location: every conv_id appears in exactly one file (the Kafka
    # key-partitioning contract, jaeger_marshaler.go:56)
    per_conv_files = (
        back.withColumn("f", F.input_file_name())
        .groupBy("conv_id")
        .agg(F.countDistinct("f").alias("nf"))
        .agg(F.max("nf"))
        .collect()[0][0]
    )
    assert per_conv_files == 1


def test_partitioned_sink_layout(spark, tmp_path, small):
    path = str(tmp_path / "byrole")
    write_sink(small, SinkSpec(name="p", predicate=F.lit(True), path=path, partition_by=["role"]))
    dirs = {d.split("/")[-1] for d in glob.glob(f"{path}/role=*")}
    assert {"role=user", "role=assistant"} <= dirs
    back = spark.read.parquet(path)
    assert back.count() == small.count()
    # partition pruning: reading one role touches only its directory
    plan = back.filter(F.col("role") == "user")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(role" in plan


def test_jsonl_receiver_roundtrips_file_exporter_output(spark, tmp_path):
    """file exporter (JSON lines) -> jsonl receiver closes the loop: what one
    pipeline exports, another ingests (fileexporter wire format)."""
    from opentelemetry_collector_spark.config import compile_config
    from opentelemetry_collector_spark.sources.codecs import to_turn_json
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    t = synthesize(spark, n_convs=3, mean_turns=4, seed=11)
    path = str(tmp_path / "landing")
    to_turn_json(t).select("value").write.text(path)
    spec = {
        "receivers": {"jsonl/in": {"path": path, "encoding": "turn_json"}},
        "exporters": {"parquet/out": {"path": str(tmp_path / "out")}},
        "service": {"pipelines": {"logs": {"receivers": ["jsonl/in"], "exporters": ["parquet/out"]}}},
    }
    svc = compile_config(spark, spec)
    got = svc.pipelines["logs"].source(spark)
    assert got.count() == t.count()
    a = {(r.conv_id, r.turn_idx, r.role, r.text) for r in t.collect()}
    b = {(r.conv_id, r.turn_idx, r.role, r.text) for r in got.collect()}
    assert a == b


def test_jsonl_receiver_reads_gzip_wire(spark, tmp_path):
    """Compressed-wire ingest (the middleware/compression.go gzip decompress
    and the zipkin receiver's gzip/zlib body handling,
    trace_receiver.go:153-180): the jsonl receiver's text scan decompresses
    .gz landing files natively via the Hadoop codec — same rows as the
    uncompressed wire, no config needed."""
    import gzip

    from opentelemetry_collector_spark.sources.codecs import to_turn_json, unmarshal
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    t = synthesize(spark, n_convs=3, mean_turns=4, seed=11)
    lines = [r.value for r in to_turn_json(t).select("value").collect()]
    landing = tmp_path / "landing_gz"
    landing.mkdir()
    with gzip.open(landing / "batch-0.jsonl.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")

    got = unmarshal(spark.read.text(str(landing)), "turn_json", col="value")
    assert got.count() == t.count()
    a = {(r.conv_id, r.turn_idx, r.role, r.text) for r in t.collect()}
    b = {(r.conv_id, r.turn_idx, r.role, r.text) for r in got.collect()}
    assert a == b


def test_prometheus_exposition_text(spark):
    """Exposition format golden: header + escaped label lines."""
    from opentelemetry_collector_spark.sources.codecs import to_prometheus_text

    df = spark.createDataFrame(
        [("api", 'we"ird\\', 3.0), ("web", "plain", 1.5)],
        "channel string, tenant string, v double",
    )
    header, lines = to_prometheus_text(
        df, "turns_total", "v", ["channel", "tenant"], metric_type="counter"
    )
    assert header == "# HELP turns_total turns_total\n# TYPE turns_total counter"
    got = sorted(r.line for r in lines.collect())
    assert got[0] == 'turns_total{channel="api",tenant="we\\"ird\\\\"} 3.0'
    assert got[1] == 'turns_total{channel="web",tenant="plain"} 1.5'


def test_prometheus_parse_roundtrip_with_escapes(spark):
    from opentelemetry_collector_spark.sources.codecs import (
        parse_prometheus_text,
        to_prometheus_text,
    )

    df = spark.createDataFrame(
        [("a\\b", 'x"y', "l1\nl2", 3.0), ("plain", "v", "w", 7.5)],
        ["la", "lb", "lc", "val"],
    )
    header, lines = to_prometheus_text(df, "m_total", "val", ["la", "lb", "lc"], "counter")
    hdr = spark.createDataFrame([(h,) for h in header.split("\n")], "line string")
    back = {
        (r.labels["la"], r.labels["lb"], r.labels["lc"]): (r.value, r.metric_type, r.kind)
        for r in parse_prometheus_text(hdr.union(lines)).collect()
    }
    # label escaping is byte-exact inverse; # TYPE metadata typed every sample
    assert back == {
        ("a\\b", 'x"y', "l1\nl2"): (3.0, "counter", "sum_cumulative_monotonic"),
        ("plain", "v", "w"): (7.5, "counter", "sum_cumulative_monotonic"),
    }


def test_prometheus_parse_untyped_timestamp_and_comments(spark):
    from opentelemetry_collector_spark.sources.codecs import parse_prometheus_text

    raw = spark.createDataFrame(
        [
            ("# HELP up whether the target is up",),
            ("up 1 1700000000123",),
            ("",),
            ('lag_seconds{q="a b",r="c}d"} 2.5',),  # spaces + brace inside quoted label
        ],
        "line string",
    )
    rows = {r.metric: r for r in parse_prometheus_text(raw).collect()}
    assert set(rows) == {"up", "lag_seconds"}
    assert rows["up"].labels == {} and rows["up"].ts_ms == 1700000000123
    assert rows["up"].metric_type == "untyped" and rows["up"].kind == "gauge"
    assert dict(rows["lag_seconds"].labels) == {"q": "a b", "r": "c}d"}
    assert rows["lag_seconds"].value == 2.5 and rows["lag_seconds"].ts_ms is None


def test_histogram_family_roundtrip(spark):
    """Exposition histogram family: writer emits cumulative _bucket/_sum/
    _count lines; the scrape-side family grouper reassembles datapoints
    (le=null is the +Inf bucket)."""
    from opentelemetry_collector_spark.sources.codecs import (
        scraped_histograms,
        to_prometheus_histogram_text,
    )

    df = spark.createDataFrame(
        [("u", 1.0), ("u", 3.0), ("u", 12.0), ("a", 2.0)], ["role", "v"]
    )
    header, lines = to_prometheus_histogram_text(df, "h", "v", ["role"], [2.0, 5.0])
    assert header.endswith("# TYPE h histogram")
    wire = sorted(r.line for r in lines.collect())
    assert 'h_bucket{role="u",le="2.0"} 1.0' in wire
    assert 'h_bucket{role="u",le="+Inf"} 3.0' in wire
    hdr = spark.createDataFrame([(h,) for h in header.split("\n")], "line string")
    out = {
        (r.labels["role"], r.le): (r.cum_count, r.total_count, r.sum_value)
        for r in scraped_histograms(hdr.union(lines)).collect()
    }
    assert out == {
        ("u", 2.0): (1, 3, 16.0),
        ("u", 5.0): (2, 3, 16.0),
        ("u", None): (3, 3, 16.0),
        ("a", 2.0): (1, 1, 2.0),
        ("a", 5.0): (1, 1, 2.0),
        ("a", None): (1, 1, 2.0),
    }


def test_scraped_histograms_ignores_untyped_families(spark):
    from opentelemetry_collector_spark.sources.codecs import scraped_histograms

    raw = spark.createDataFrame(
        [
            ("# TYPE h histogram",),
            ('h_bucket{le="1.0"} 2',),
            ('h_bucket{le="+Inf"} 2',),
            ("h_sum 1.5",),
            ("h_count 2",),
            ("other_bucket 9",),  # no histogram TYPE -> not a family member
        ],
        "line string",
    )
    out = scraped_histograms(raw)
    assert {r.family for r in out.collect()} == {"h"}


def test_otlp_text_debug_dump_golden(spark):
    """logging exporter debug dump (internal/otlptext/logs.go:25-55,
    databuffer.go:212-218): field lines, nanos timestamp, STRING() attr
    rendering, Attributes block omitted when the map is empty."""
    from opentelemetry_collector_spark.sources.codecs import to_otlp_text

    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "hello", None, "2024-01-01 00:00:01", {"b": "2", "a": "1"}),
            ("c1", 1, "assistant", "hi", "search", "2024-01-01 00:00:02", {}),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string,"
        " ts string, attrs map<string,string>",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    lines = {r["turn_idx"]: r["line"] for r in to_otlp_text(df).collect()}
    assert lines[0] == (
        "LogRecord #0\n"
        "Timestamp: 1704067201000000000\n"
        "Severity: user\n"
        "ShortName: user\n"
        "Body: hello\n"
        "Attributes:\n"
        "     -> a: STRING(1)\n"
        "     -> b: STRING(2)"
    )
    assert lines[1] == (
        "LogRecord #1\n"
        "Timestamp: 1704067202000000000\n"
        "Severity: assistant\n"
        "ShortName: search\n"
        "Body: hi"
    )


def test_oc_encodings_dispatch_through_registry(spark):
    """oc_json / oc_metrics_json unmarshal via the registry like any Kafka
    encoding (jsonl/file receiver path)."""
    import json

    from opentelemetry_collector_spark.sources.codecs import unmarshal

    span_line = json.dumps({
        "node": {"serviceInfo": {"name": "s"}}, "resource": None,
        "spans": [{"traceId": "t1", "spanId": "s1", "name": {"value": "op"},
                   "kind": "SERVER", "startTime": "2026-01-01T00:00:00Z",
                   "endTime": "2026-01-01T00:00:01Z"}],
    })
    metric_line = json.dumps({
        "node": None, "resource": None,
        "metrics": [{"metricDescriptor": {"name": "m", "type": "GAUGE_DOUBLE",
                                          "labelKeys": []},
                     "timeseries": [{"startTimestamp": "2026-01-01T00:00:00Z",
                                     "labelValues": [],
                                     "points": [{"timestamp": "2026-01-01T00:00:01Z",
                                                 "doubleValue": 1.5}]}]}],
    })
    spans = unmarshal(spark.createDataFrame([(span_line,)], "value string"), "oc_json")
    mets = unmarshal(spark.createDataFrame([(metric_line,)], "value string"), "oc_metrics_json")
    assert spans.first()["kind"] == 2
    assert mets.first()["value"] == 1.5


def test_prometheus_parse_refuses_malformed_sample_not_job(spark):
    """textparse semantics: a junk value/timestamp token invalidates that
    SAMPLE (NULL fields), never the scrape — and +Inf/NaN values parse."""
    from opentelemetry_collector_spark.sources.codecs import parse_prometheus_text

    lines = [
        "# TYPE good counter",
        "good 1.5",
        "bad_value not-a-number",
        "bad_ts 2.0 not-a-ts",
        'inf_gauge{q="0.5"} +Inf',
        "nan_gauge NaN",
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    rows = {r.metric: r for r in parse_prometheus_text(df).collect()}
    assert rows["good"].value == 1.5
    assert rows["bad_value"].value is None        # refused sample, job alive
    assert rows["bad_ts"].value == 2.0 and rows["bad_ts"].ts_ms is None
    assert rows["inf_gauge"].value == float("inf")
    assert rows["nan_gauge"].value != rows["nan_gauge"].value  # NaN


def test_scraped_histograms_refuse_junk_le_bucket(spark):
    """A bucket with an unparseable le is skipped (metricsbuilder), never
    aliased onto the le=NULL (+Inf) encoding."""
    from opentelemetry_collector_spark.sources.codecs import scraped_histograms

    lines = [
        "# TYPE h histogram",
        'h_bucket{le="0.5"} 3',
        'h_bucket{le="junk"} 5',
        'h_bucket{le="+Inf"} 9',
        "h_sum 12.5",
        "h_count 9",
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    rows = scraped_histograms(df).collect()
    buckets = sorted(
        ((r.le, r.cum_count) for r in rows), key=lambda x: (x[0] is None, x[0])
    )
    assert buckets == [(0.5, 3), (None, 9)]  # junk bucket gone, +Inf intact
    assert all(r.total_count == 9 for r in rows)


def test_parse_kv_text_junk_tokens_refuse_fields_not_job(spark):
    from opentelemetry_collector_spark.sources.codecs import parse_kv_text

    df = spark.createDataFrame(
        [("conv_id=c1 turn_idx=abc role=user ts=garbage",),
         ("conv_id=c2 turn_idx=3 role=user ts=2026-01-02T03:04:05",)],
        "value string",
    )
    rows = {r.conv_id: r for r in parse_kv_text(df).collect()}
    assert rows["c1"].turn_idx is None and rows["c1"].ts is None  # refused fields
    assert rows["c2"].turn_idx == 3 and rows["c2"].ts is not None


def test_parse_otlp_json_duplicate_and_null_attr_keys_degrade_per_record(spark):
    """map_from_entries throws on duplicate/null keys (EXCEPTION policy) —
    the codec must keep the FIRST occurrence (pdata AttributeMap.Get
    semantics) and drop null-key entries instead of killing the scan."""
    import json

    from opentelemetry_collector_spark.sources.codecs import parse_otlp_json

    env = {"resourceLogs": [{
        "resource": {"attributes": [{"key": "conv.id", "value": {"stringValue": "c9"}}]},
        "instrumentationLibraryLogs": [{"logRecords": [{
            "timeUnixNano": "not-a-number",
            "body": {"stringValue": "hello"},
            "attributes": [
                {"key": "role", "value": {"stringValue": "user"}},
                {"key": "role", "value": {"stringValue": "assistant"}},
                {"value": {"stringValue": "orphan"}},
                {"key": "turn.idx", "value": {"intValue": "7"}},
            ],
        }]}],
    }]}
    df = spark.createDataFrame([(json.dumps(env),)], "value string")
    (r,) = parse_otlp_json(df).collect()
    assert r.conv_id == "c9" and r.text == "hello"
    assert r.role == "user"       # first occurrence wins
    assert r.turn_idx == 7
    assert r.ts is None           # junk timeUnixNano refused per-field


def test_prometheus_histogram_refuses_null_and_nan_observations(spark):
    from opentelemetry_collector_spark.sources.codecs import to_prometheus_histogram_text

    df = spark.createDataFrame(
        [("a", 0.5), ("a", 2.0), ("a", None), ("a", float("nan"))],
        "svc string, v double",
    )
    _, lines = to_prometheus_histogram_text(df, "lat", "v", ["svc"], bounds=[1.0])
    got = {l.line.split(" ")[0].split("{")[0]: l.line.rsplit(" ", 1)[1] for l in lines.collect()}
    # 2 real observations: count=2, +Inf=2, sum=2.5 — internally consistent
    assert got["lat_count"] == "2.0" and got["lat_sum"] == "2.5"


def test_otlp_text_always_prints_field_labels(spark):
    from opentelemetry_collector_spark.sources.codecs import to_otlp_text

    df = spark.createDataFrame(
        [("c1", 0, None, None, None, None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, attrs map<string,string>",
    )
    (r,) = to_otlp_text(df).collect()
    for label in ("LogRecord #", "Timestamp: ", "Severity: ", "ShortName: ", "Body: "):
        assert label in r.line, f"missing {label!r} line for a junk row"


class TestNestedAttrsJsonWire:
    """SURVEY §1.3 on the JSON wire (opt-in nested mode): composite
    AnyValue attributes/bodies survive as canonical JSON renderings,
    byte-identical to the proto decoder's rendering of the same value."""

    @staticmethod
    def _jsonpb(v):
        # independent typed-jsonpb producer (json_marshaler.go rendering)
        if isinstance(v, bool):
            return {"boolValue": v}
        if isinstance(v, int):
            return {"intValue": str(v)}
        if isinstance(v, float):
            return {"doubleValue": v}
        if isinstance(v, str):
            return {"stringValue": v}
        if isinstance(v, list):
            return {"arrayValue": {"values": [TestNestedAttrsJsonWire._jsonpb(e) for e in v]}}
        if isinstance(v, dict):
            return {
                "kvlistValue": {
                    "values": [
                        {"key": k, "value": TestNestedAttrsJsonWire._jsonpb(x)}
                        for k, x in v.items()
                    ]
                }
            }
        raise TypeError(type(v))

    def _envelope(self, tool_payload, body_payload="hello"):
        import json

        return json.dumps(
            {
                "resourceLogs": [
                    {
                        "resource": {
                            "attributes": [
                                {"key": "conv.id", "value": {"stringValue": "c-1"}}
                            ]
                        },
                        "instrumentationLibraryLogs": [
                            {
                                "instrumentationLibrary": {"name": "x"},
                                "logRecords": [
                                    {
                                        "timeUnixNano": "1700000000000000000",
                                        "body": self._jsonpb(body_payload),
                                        "attributes": [
                                            {"key": "role", "value": {"stringValue": "user"}},
                                            {"key": "turn.idx", "value": {"intValue": "0"}},
                                            {"key": "tool", "value": self._jsonpb(tool_payload)},
                                        ],
                                    }
                                ],
                            }
                        ],
                    }
                ]
            }
        )

    PAYLOAD = {"outer": {"z": [1, 2], "a": True}, "arr": ["x", 2.5]}

    def test_parity_with_proto_wire(self, spark):
        from opentelemetry_collector_spark.sources.codecs import parse_otlp_json
        from opentelemetry_collector_spark.sources.otlp_proto import (
            _any_nested,
            _decode_envelope,
            _kv,
            _ld,
            encode_logs_request,
        )

        rec = _ld(6, _kv("role", _any_nested("user"))) + _ld(
            6, _kv("tool", _any_nested(self.PAYLOAD))
        )
        (prow,) = list(_decode_envelope(encode_logs_request("c-1", [rec])))
        proto_rendering = prow[4]
        assert proto_rendering and proto_rendering.startswith("{")

        df = spark.createDataFrame([(self._envelope(self.PAYLOAD),)], "value string")
        (row,) = parse_otlp_json(df, nested=True).collect()
        assert row["tool"] == proto_rendering
        assert row["role"] == "user" and row["conv_id"] == "c-1"
        assert row["text"] == "hello" and row["turn_idx"] == 0

    def test_nested_body_renders(self, spark):
        from opentelemetry_collector_spark.sources.codecs import parse_otlp_json

        df = spark.createDataFrame(
            [(self._envelope("calc", body_payload=["seg-a", {"k": 1}]),)], "value string"
        )
        (row,) = parse_otlp_json(df, nested=True).collect()
        assert row["text"] == '["seg-a",{"k":1}]'
        assert row["tool"] == "calc"

    def test_flat_default_unchanged(self, spark):
        from opentelemetry_collector_spark.sources.codecs import parse_otlp_json

        df = spark.createDataFrame([(self._envelope(self.PAYLOAD),)], "value string")
        (row,) = parse_otlp_json(df).collect()
        assert row["tool"] is None  # flat mode: composite attr stays junk
        assert row["role"] == "user"

    def test_junk_composite_refuses_field(self, spark):
        import json

        from opentelemetry_collector_spark.sources.codecs import parse_otlp_json

        env = json.loads(self._envelope("calc"))
        recs = env["resourceLogs"][0]["instrumentationLibraryLogs"][0]["logRecords"]
        recs[0]["attributes"][2]["value"] = {"arrayValue": "not-an-object"}
        df = spark.createDataFrame([(json.dumps(env),)], "value string")
        (row,) = parse_otlp_json(df, nested=True).collect()
        assert row["tool"] is None and row["role"] == "user"

    def test_nested_mode_survives_downstream_filter(self, spark):
        """The transcode UDF must stay extractable when its output is
        consumed inside a FILTER (projection collapse re-inlines the UDF
        into the condition; a HOF-built argument made that an
        INTERNAL_ERROR in r4 — this pins the to_json-input design)."""
        from opentelemetry_collector_spark.sources.codecs import parse_otlp_json

        df = spark.createDataFrame(
            [(self._envelope(self.PAYLOAD),), (self._envelope("calc"),)], "value string"
        )
        out = parse_otlp_json(df, nested=True)
        assert out.filter(out["tool"].startswith("{")).count() == 1
        assert out.filter(~out["tool"].startswith("{")).count() == 1

    def test_nested_parse_runs_inside_streaming_plan(self, spark, tmp_path):
        """The nested transcode kernel is stateless per-batch (one
        ArrowEvalPython, no shuffle), so otlp_json_nested must run
        unchanged inside a Structured Streaming plan — the same proof the
        otlp_proto decoder got. Stream a JSON-lines landing dir through
        the registry entry and compare with the batch parse."""
        from opentelemetry_collector_spark.sources.codecs import unmarshal

        landing = tmp_path / "landing"
        landing.mkdir()
        (landing / "a.txt").write_text(
            self._envelope(self.PAYLOAD) + "\n" + self._envelope("calc") + "\n"
        )
        stream = spark.readStream.format("text").load(str(landing))
        decoded = unmarshal(stream, "otlp_json_nested")
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
        batch_df = spark.read.format("text").load(str(landing))
        want = sorted(tuple(r) for r in unmarshal(batch_df, "otlp_json_nested").collect())
        assert got == want and len(got) == 2
        tools = {r[4] for r in got}
        assert "calc" in tools and any(t and t.startswith("{") for t in tools)
