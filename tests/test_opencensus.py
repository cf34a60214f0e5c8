"""OpenCensus codec goldens (translator/internaldata/oc_to_traces.go,
oc_to_resource.go, traces_to_oc.go)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.opencensus import (
    UNKNOWN_OC_VALUE,
    parse_oc_json,
    to_oc_json,
)


def _parse(spark, batches):
    df = spark.createDataFrame([(json.dumps(b),) for b in batches], "value string")
    return parse_oc_json(df).collect()


FULL_NODE = {
    "identifier": {"hostName": "host-1", "pid": 4242, "startTimestamp": "2026-01-02T03:04:05.000000006Z"},
    "libraryInfo": {"language": 4, "exporterVersion": "v1.2", "coreLibraryVersion": "v0.9"},
    "serviceInfo": {"name": "svcA"},
    "attributes": {"a": "node-a", "host.name": "from-node-attr"},
}

SPAN = {
    "traceId": "0102030405060708090a0b0c0d0e0f10",
    "spanId": "0102030405060708",
    "parentSpanId": "1112131415161718",
    "name": {"value": "op-1"},
    "kind": "SERVER",
    "startTime": "2026-01-02T03:04:05.000000Z",
    "endTime": "2026-01-02T03:04:05.250000Z",
    "attributes": {"attributeMap": {"k": {"stringValue": {"value": "v"}}}},
    "status": {"code": 0, "message": ""},
}


def test_node_resource_mapping_and_precedence(spark):
    """oc_to_resource.go:87-139: specials upsert over node attrs; labels
    insert only-if-absent; cloud.zone renamed; pid/type/language mapped."""
    b = {
        "node": FULL_NODE,
        "resource": {"type": "container", "labels": {"cloud.zone": "us-east1-a", "a": "label-a"}},
        "spans": [SPAN],
    }
    (r,) = _parse(spark, [b])
    res = r["resource"]
    assert res["service.name"] == "svcA"
    assert res["host.name"] == "host-1"  # special beats node attr
    assert res["process.pid"] == "4242"
    assert res["telemetry.sdk.language"] == "go"
    assert res["telemetry.sdk.version"] == "v0.9"
    assert res["opencensus.exporterversion"] == "v1.2"
    assert res["opencensus.starttime"] == "2026-01-02T03:04:05.000000006Z"
    assert res["opencensus.resourcetype"] == "container"
    assert res["cloud.availability_zone"] == "us-east1-a"
    assert res["a"] == "node-a"  # node attr wins over label (label is Insert)
    assert r["service_name"] == "svcA"
    assert r["kind"] == 2 and r["duration_us"] == 250000


def test_typed_attribute_union_stringify(spark):
    b = {
        "node": None,
        "resource": None,
        "spans": [
            {
                **SPAN,
                "attributes": {
                    "attributeMap": {
                        "s": {"stringValue": {"value": "x"}},
                        "i": {"intValue": "42"},
                        "bt": {"boolValue": True},
                        "bf": {"boolValue": False},
                        "d": {"doubleValue": 2.5},
                        "di": {"doubleValue": 3.0},
                        "empty": {},
                    }
                },
            }
        ],
    }
    (r,) = _parse(spark, [b])
    a = r["attrs"]
    assert a["s"] == "x" and a["i"] == "42"
    assert a["bt"] == "true" and a["bf"] == "false"
    # integral doubles print BARE like Go strconv.FormatFloat(3.0,'f',-1,64)
    # = "3" (protospan_translation.go:73) — "3.0" would never match a
    # canonical_str(3.0) config literal
    assert a["d"] == "2.5" and a["di"] == "3"
    assert a["empty"] == UNKNOWN_OC_VALUE


@pytest.mark.parametrize(
    "kind_field,kind_attr,want_kind,attr_kept",
    [
        ("SERVER", None, 2, False),
        ("CLIENT", "consumer", 3, True),  # field wins, attr untouched
        ("SPAN_KIND_UNSPECIFIED", "consumer", 5, False),  # mapped + consumed
        ("SPAN_KIND_UNSPECIFIED", "producer", 4, False),
        ("SPAN_KIND_UNSPECIFIED", "internal", 1, False),
        # "server" hits the default arm: UNSPECIFIED, attr KEPT
        ("SPAN_KIND_UNSPECIFIED", "server", 0, True),
        ("SPAN_KIND_UNSPECIFIED", None, 0, False),
    ],
)
def test_kind_fallback_table(spark, kind_field, kind_attr, want_kind, attr_kept):
    """oc_to_traces.go:246-285 — the span.kind attr maps only
    consumer/producer/internal and is consumed only when it mapped."""
    amap = {}
    if kind_attr is not None:
        amap["span.kind"] = {"stringValue": {"value": kind_attr}}
    b = {"node": None, "resource": None,
         "spans": [{**SPAN, "kind": kind_field, "attributes": {"attributeMap": amap}}]}
    (r,) = _parse(spark, [b])
    assert r["kind"] == want_kind
    assert ("span.kind" in (r["attrs"] or {})) == attr_kept


def test_status_mapping_and_code_attr_override(spark):
    """oc_to_traces.go:169-195: OC 0 -> UNSET, else ERROR; status.code attr
    overrides AND is consumed — but only when a status is present."""
    rows = _parse(
        spark,
        [
            {"node": None, "resource": None,
             "spans": [{**SPAN, "status": {"code": 0, "message": "fine"}}]},
            {"node": None, "resource": None,
             "spans": [{**SPAN, "status": {"code": 5, "message": "boom"}}]},
            {"node": None, "resource": None,
             "spans": [{**SPAN, "status": {"code": 5, "message": "m"},
                        "attributes": {"attributeMap": {"status.code": {"intValue": "1"}}}}]},
            {"node": None, "resource": None,
             "spans": [{**SPAN, "status": None,
                        "attributes": {"attributeMap": {"status.code": {"intValue": "1"}}}}]},
        ],
    )
    assert (rows[0]["status_code"], rows[0]["status_message"]) == (0, "fine")
    assert (rows[1]["status_code"], rows[1]["status_message"]) == (2, "boom")
    assert rows[2]["status_code"] == 1 and "status.code" not in rows[2]["attrs"]
    # nil status: attr NOT applied, NOT consumed (early return :170-172)
    assert rows[3]["status_code"] == 0 and rows[3]["attrs"]["status.code"] == "1"


def test_same_process_and_span_resource_override(spark):
    b = {
        "node": FULL_NODE,
        "resource": {"type": "batch-res", "labels": {"batch": "yes"}},
        "spans": [
            {**SPAN, "sameProcessAsParentSpan": False},
            {**SPAN, "spanId": "0202030405060708",
             "resource": {"type": "own-res", "labels": {"own": "yes"}}},
        ],
    }
    r1, r2 = sorted(_parse(spark, [b]), key=lambda r: r["span_id"])
    assert r1["attrs"]["opencensus.same_process_as_parent_span"] == "false"
    assert r1["resource"]["opencensus.resourcetype"] == "batch-res"
    assert r1["resource"]["batch"] == "yes"
    # span-level resource replaces the batch resource, node still applies
    assert r2["resource"]["opencensus.resourcetype"] == "own-res"
    assert r2["resource"]["own"] == "yes" and "batch" not in r2["resource"]
    assert r2["resource"]["service.name"] == "svcA"


def test_roundtrip_through_wire(spark):
    """frame -> to_oc_json -> parse_oc_json preserves the frame columns
    (traces_to_oc.go marshal composed with its inverse)."""
    b = {
        "node": {"serviceInfo": {"name": "svcR"}},
        "resource": None,
        "spans": [
            {**SPAN, "kind": "SPAN_KIND_UNSPECIFIED",
             "attributes": {"attributeMap": {"span.kind": {"stringValue": {"value": "producer"}},
                                             "k": {"stringValue": {"value": "v"}}}},
             "status": {"code": 9, "message": "err"}},
        ],
    }
    df = spark.createDataFrame([(json.dumps(b),)], "value string")
    frame = parse_oc_json(df)
    back = parse_oc_json(to_oc_json(frame))
    cols = ["trace_id", "span_id", "parent_span_id", "name", "kind",
            "status_code", "status_message", "service_name", "ts",
            "duration_us", "attrs"]
    a = frame.select(cols).collect()
    c = back.select(cols).collect()
    assert a == c


# ---------------------------------------------------------------------------
# metrics signal
# ---------------------------------------------------------------------------


def _parse_metrics(spark, batches):
    from opentelemetry_collector_spark.sources.opencensus import parse_oc_metrics_json

    df = spark.createDataFrame([(json.dumps(b),) for b in batches], "value string")
    return parse_oc_metrics_json(df).collect()


def test_oc_metrics_scalar_kinds_and_labels(spark):
    """descriptorTypeToMetrics kind table + fillLabelsMap semantics
    (min-length pairing, hasValue gating, oc_to_metrics.go:170-241)."""
    b = {
        "node": {"serviceInfo": {"name": "svcM"}},
        "resource": None,
        "metrics": [
            {
                "metricDescriptor": {
                    "name": "req_count", "description": "d", "unit": "1",
                    "type": "CUMULATIVE_INT64",
                    "labelKeys": [{"key": "k1"}, {"key": "k2"}, {"key": "k3"}],
                },
                "timeseries": [
                    {
                        "startTimestamp": "2026-01-02T00:00:00Z",
                        # only two values for three keys; second has hasValue=false
                        "labelValues": [{"value": "v1", "hasValue": True},
                                        {"value": "ignored", "hasValue": False}],
                        "points": [{"timestamp": "2026-01-02T00:00:05Z", "int64Value": "7"}],
                    }
                ],
            },
            {
                "metricDescriptor": {"name": "temp", "type": "GAUGE_DOUBLE", "labelKeys": []},
                "timeseries": [
                    {"startTimestamp": "2026-01-02T00:00:00Z", "labelValues": [],
                     "points": [{"timestamp": "2026-01-02T00:00:06Z", "doubleValue": 21.5}]}
                ],
            },
        ],
    }
    rows = {r["metric"]: r for r in _parse_metrics(spark, [b])}
    rc = rows["req_count"]
    assert rc["kind"] == "sum_cumulative_monotonic"
    assert rc["value"] == 7.0
    assert rc["labels"] == {"k1": "v1"}  # k2 hasValue=false, k3 unpaired
    assert rc["resource"]["service.name"] == "svcM"
    assert rows["temp"]["kind"] == "gauge" and rows["temp"]["value"] == 21.5


def test_oc_metrics_distribution_and_summary(spark):
    b = {
        "node": None, "resource": None,
        "metrics": [
            {
                "metricDescriptor": {"name": "lat", "type": "CUMULATIVE_DISTRIBUTION",
                                     "labelKeys": []},
                "timeseries": [{
                    "startTimestamp": "2026-01-02T00:00:00Z", "labelValues": [],
                    "points": [{
                        "timestamp": "2026-01-02T00:00:05Z",
                        "distributionValue": {
                            "count": "10", "sum": 42.5,
                            "bucketOptions": {"explicit": {"bounds": [1.0, 5.0]}},
                            "buckets": [{"count": "3"}, {"count": "5"}, {"count": "2"}],
                        },
                    }],
                }],
            },
            {
                "metricDescriptor": {"name": "gc", "type": "SUMMARY", "labelKeys": []},
                "timeseries": [{
                    "startTimestamp": "2026-01-02T00:00:00Z", "labelValues": [],
                    "points": [{
                        "timestamp": "2026-01-02T00:00:06Z",
                        "summaryValue": {
                            "count": {"value": "4"}, "sum": {"value": 9.0},
                            "snapshot": {"percentileValues": [
                                {"percentile": 50.0, "value": 2.0},
                                {"percentile": 99.0, "value": 5.0},
                            ]},
                        },
                    }],
                }],
            },
        ],
    }
    rows = {r["metric"]: r for r in _parse_metrics(spark, [b])}
    lat = rows["lat"]
    assert lat["kind"] == "histogram_cumulative"
    assert lat["bucket_counts"] == [3, 5, 2]
    assert lat["explicit_bounds"] == [1.0, 5.0]
    assert lat["h_sum"] == 42.5 and lat["h_count"] == 10
    gc = rows["gc"]
    assert gc["kind"] == "summary"
    assert gc["h_sum"] == 9.0 and gc["h_count"] == 4
    assert [(q["percentile"], q["value"]) for q in gc["quantiles"]] == [(50.0, 2.0), (99.0, 5.0)]


def test_oc_metrics_roundtrip_scalar(spark):
    """scalar frame -> to_oc_metrics_json -> parse_oc_metrics_json."""
    from opentelemetry_collector_spark.sources.opencensus import (
        parse_oc_metrics_json,
        to_oc_metrics_json,
    )

    src = spark.createDataFrame(
        [
            ("m1", {"a": "1", "b": "2"}, 3.5, "gauge"),
            ("m2", {}, 7.0, "sum_cumulative_monotonic"),
        ],
        "metric string, labels map<string,string>, value double, kind string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-02 03:04:05")))
    back = parse_oc_metrics_json(to_oc_metrics_json(src))
    got = {r["metric"]: r for r in back.collect()}
    assert got["m1"]["kind"] == "gauge" and got["m1"]["value"] == 3.5
    assert got["m1"]["labels"] == {"a": "1", "b": "2"}
    assert got["m2"]["kind"] == "sum_cumulative_monotonic" and got["m2"]["value"] == 7.0
    assert got["m1"]["ts"] == got["m1"]["start_ts"]


def test_oc_unparseable_int64_strings_degrade_per_row(spark):
    """jsonpb int64 fields travel as strings; a producer emitting junk in
    one of them must lose that override/point only — never the job."""
    import json

    from opentelemetry_collector_spark.sources.opencensus import (
        parse_oc_json,
        parse_oc_metrics_json,
    )

    span = {
        "node": {"serviceInfo": {"name": "svc"}},
        "spans": [{
            "traceId": "0" * 32, "spanId": "1" * 16,
            "name": {"value": "op"},
            "status": {"code": 5, "message": "m"},
            "attributes": {"attributeMap": {
                "status.code": {"intValue": "not-an-int"},
            }},
        }],
    }
    df = spark.createDataFrame([(json.dumps(span),)], "value string")
    row = parse_oc_json(df).collect()[0]
    assert row.status_code == 2  # junk override dropped -> nonzero oc code -> 2

    metric = {
        "node": {"serviceInfo": {"name": "svc"}},
        "metrics": [{
            "metricDescriptor": {"name": "m", "type": "CUMULATIVE_INT64"},
            "timeseries": [{
                "points": [{"timestamp": "2026-01-01T00:00:00Z", "int64Value": "junk"}],
            }],
        }],
    }
    mdf = spark.createDataFrame([(json.dumps(metric),)], "value string")
    mrow = parse_oc_metrics_json(mdf).collect()[0]
    assert mrow.value is None  # refused point, surviving scan
