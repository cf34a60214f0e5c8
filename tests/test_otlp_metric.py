"""OTLP-JSON metrics envelope codec (sources/otlp_metric.py).

Wire-shape goldens for the v0.5-era metrics proto jsonpb rules (oneof
member per value type, flat StringKeyValue labels, float64 omit-empty,
non-nullable resource), then the frame roundtrip and junk paths.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.otlp_metric import (
    parse_otlp_metrics_json,
    to_otlp_metrics_json,
)

FRAME_COLS = "metric string, labels map<string,string>, value double, ts timestamp, kind string"
T0 = dt.datetime(2024, 1, 1, 9, 0, 0, 123456)
T0_NANOS = 1_704_099_600_123_456_000


def _frame(spark, rows):
    return spark.createDataFrame(rows, FRAME_COLS)


def _only_metric(env):
    rms = env["resourceMetrics"]
    assert len(rms) == 1
    return rms[0]["instrumentationLibraryMetrics"][0]["metrics"][0]


def test_gauge_wire_shape_golden(spark):
    rows = [("cpu", {"b": "2", "a": "1"}, 0.5, T0, "gauge")]
    env = json.loads(to_otlp_metrics_json(_frame(spark, rows)).collect()[0]["value"])
    # non-nullable Resource: empty but present
    assert env["resourceMetrics"][0]["resource"] == {}
    m = _only_metric(env)
    assert m["name"] == "cpu"
    assert "doubleSum" not in m  # oneof: exactly one member
    dp = m["doubleGauge"]["dataPoints"][0]
    # labels sorted by key; flat key/value pairs (not typed attributes)
    assert dp["labels"] == [{"key": "a", "value": "1"}, {"key": "b", "value": "2"}]
    assert dp["timeUnixNano"] == str(T0_NANOS)
    assert dp["value"] == 0.5
    assert "startTimeUnixNano" not in dp


def test_sum_member_and_zero_value_omitted(spark):
    rows = [("clicks", {"u": "7"}, 0.0, T0, "sum_cumulative_monotonic")]
    env = json.loads(to_otlp_metrics_json(_frame(spark, rows)).collect()[0]["value"])
    m = _only_metric(env)
    assert "doubleGauge" not in m
    s = m["doubleSum"]
    assert s["aggregationTemporality"] == "AGGREGATION_TEMPORALITY_CUMULATIVE"
    assert s["isMonotonic"] is True
    # float64 omit-empty: the 0.0 point ships without a value member...
    assert "value" not in s["dataPoints"][0]
    # ...and reads back as 0.0
    back = parse_otlp_metrics_json(to_otlp_metrics_json(_frame(spark, rows))).collect()[0]
    assert back["value"] == 0.0 and back["kind"] == "sum_cumulative_monotonic"


def test_roundtrip_equals_frame(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = ev.select(
        F.col("event_type").alias("metric"),
        F.create_map(F.lit("user"), F.col("user_id").cast("string")).alias("labels"),
        F.floor(F.col("value") * 100).cast("double").alias("value"),
        F.col("ts"),
        F.when(F.col("event_type") == "click", "sum_cumulative_monotonic")
        .otherwise("gauge")
        .alias("kind"),
    )
    back = parse_otlp_metrics_json(to_otlp_metrics_json(src))
    cols = ["metric", "kind", "value", "ts"]
    a = sorted(map(tuple, src.select(*cols, F.element_at("labels", "user")).collect()))
    b = sorted(map(tuple, back.select(*cols, F.element_at("labels", "user")).collect()))
    assert a == b


def test_junk_degrades_per_row(spark):
    bad = spark.createDataFrame(
        [
            ("{ not json",),
            ('{"resourceMetrics":[{"instrumentationLibraryMetrics":[{"metrics":['
             '{"name":"m1","doubleSum":{"dataPoints":[{"timeUnixNano":"junk",'
             '"labels":[{"key":null,"value":"x"},{"key":"k","value":"a"},'
             '{"key":"k","value":"b"}]}],"aggregationTemporality":'
             '"AGGREGATION_TEMPORALITY_DELTA"}},'
             '{"name":"m2","intGauge":{"dataPoints":[{"timeUnixNano":"1"}]}}'
             "]}]}]}",),
        ],
        "value string",
    )
    rows = {r["metric"]: r for r in parse_otlp_metrics_json(bad).collect()}
    # non-monotonic-cumulative sum -> kind NULL (we only speak the frame's
    # two kinds); junk nanos -> NULL ts; dup labels keep first, null key dropped
    m1 = rows["m1"]
    assert m1["kind"] is None and m1["ts"] is None and m1["value"] == 0.0
    assert m1["labels"] == {"k": "a"}
    # unknown oneof member (intGauge not in frame vocabulary) -> no datapoints
    assert "m2" not in rows


def test_far_future_and_epoch_zero_timestamps(spark):
    # regression: unix_micros(ts) * 1000 overflowed bigint under ANSI past
    # the 2262 int64-nano limit, aborting the marshal on one junk row; and
    # epoch-0 was omitted on the wire, roundtripping to NULL instead of 0
    epoch = dt.datetime(1970, 1, 1)
    rows = [
        ("far", {}, 1.0, dt.datetime(2300, 1, 1), "gauge"),
        ("zero", {}, 2.0, epoch, "gauge"),
        ("none", {}, 3.0, None, "gauge"),
    ]
    back = {
        r["metric"]: r
        for r in parse_otlp_metrics_json(to_otlp_metrics_json(_frame(spark, rows))).collect()
    }
    assert back["far"]["ts"] is None and back["far"]["value"] == 1.0
    assert back["zero"]["ts"] == epoch  # "0" on the wire, not omitted
    assert back["none"]["ts"] is None


def test_marshal_is_pure_jvm_single_exchange(spark):
    rows = [("cpu", {"a": "1"}, 1.0, T0, "gauge")] * 4
    plan = (
        to_otlp_metrics_json(_frame(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# --- doubleHistogram member --------------------------------------------------

HIST_COLS = (
    "metric string, labels map<string,string>, ts timestamp, "
    "bucket_counts array<bigint>, explicit_bounds array<double>, "
    "h_sum double, h_count bigint"
)


def _hframe(spark, rows):
    return spark.createDataFrame(rows, HIST_COLS)


def test_histogram_wire_shape_golden(spark):
    from opentelemetry_collector_spark.sources.otlp_metric import to_otlp_histograms_json

    rows = [("lat", {"svc": "a"}, T0, [1, 2, 4], [0.5, 1.0], 3.25, 7)]
    env = json.loads(to_otlp_histograms_json(_hframe(spark, rows)).collect()[0]["value"])
    assert env["resourceMetrics"][0]["resource"] == {}
    m = _only_metric(env)
    assert m["name"] == "lat" and set(m) == {"name", "doubleHistogram"}
    h = m["doubleHistogram"]
    assert h["aggregationTemporality"] == "AGGREGATION_TEMPORALITY_CUMULATIVE"
    (dp,) = h["dataPoints"]
    # fixed64 -> strings (count, bucketCounts, nanos); float64 sum a number
    assert dp["count"] == "7"
    assert dp["bucketCounts"] == ["1", "2", "4"]
    assert dp["timeUnixNano"] == str(T0_NANOS)
    assert dp["sum"] == 3.25
    assert dp["explicitBounds"] == [0.5, 1.0]
    assert dp["labels"] == [{"key": "svc", "value": "a"}]


def test_histogram_omit_empty_rules(spark):
    from opentelemetry_collector_spark.sources.otlp_metric import to_otlp_histograms_json

    # zero count, zero sum, empty counts/bounds/labels, NULL ts: everything
    # optional vanishes from the wire (jsonpb omit-empty)
    rows = [("lat", {}, None, [], [], 0.0, 0)]
    env = json.loads(to_otlp_histograms_json(_hframe(spark, rows)).collect()[0]["value"])
    (dp,) = _only_metric(env)["doubleHistogram"]["dataPoints"]
    assert dp == {}


def test_histogram_roundtrip_and_omitted_reads_back_zero(spark):
    from opentelemetry_collector_spark.sources.otlp_metric import (
        parse_otlp_histograms_json,
        to_otlp_histograms_json,
    )

    rows = [
        ("lat", {"svc": "a"}, T0, [1, 0, 2], [0.5, 1.0], 3.25, 3),
        ("lat", {}, None, [], [], 0.0, 0),
    ]
    back = parse_otlp_histograms_json(to_otlp_histograms_json(_hframe(spark, rows)))
    got = {r["h_count"]: r for r in back.collect()}
    full = got[3]
    assert full["metric"] == "lat" and full["temporality"].endswith("CUMULATIVE")
    assert full["labels"] == {"svc": "a"} and full["ts"] == T0
    assert full["bucket_counts"] == [1, 0, 2] and full["explicit_bounds"] == [0.5, 1.0]
    assert full["h_sum"] == 3.25
    empty = got[0]
    # omitted count/sum read back as the proto zero values; empty repeated
    # fields are indistinguishable from absent -> NULL
    assert empty["h_sum"] == 0.0 and empty["h_count"] == 0
    assert empty["bucket_counts"] is None and empty["explicit_bounds"] is None
    assert empty["labels"] == {} and empty["ts"] is None


def test_histogram_junk_degrades_per_row(spark):
    from opentelemetry_collector_spark.sources.otlp_metric import parse_otlp_histograms_json

    wires = [
        ("not json",),
        ('{"resourceMetrics":[{"instrumentationLibraryMetrics":[{"metrics":['
         '{"name":"nohist","doubleGauge":{"dataPoints":[{"value":1}]}}]}]}]}',),
        ('{"resourceMetrics":[{"instrumentationLibraryMetrics":[{"metrics":['
         '{"name":"bad","doubleHistogram":{"dataPoints":[{"count":"NaNish",'
         '"bucketCounts":["1","junk","3"],"timeUnixNano":"zzz"}],'
         '"aggregationTemporality":"AGGREGATION_TEMPORALITY_DELTA"}}]}]}]}',),
    ]
    rows = parse_otlp_histograms_json(spark.createDataFrame(wires, "value string")).collect()
    # junk envelope vanishes; gauge-only metric explodes to nothing; the bad
    # histogram survives with per-field NULL degradation + raw temporality
    assert len(rows) == 1
    r = rows[0]
    assert r["metric"] == "bad" and r["temporality"].endswith("DELTA")
    assert r["h_count"] == 0 and r["ts"] is None
    assert r["bucket_counts"] == [1, None, 3]


# --- intGauge / intSum members ----------------------------------------------

from opentelemetry_collector_spark.sources.otlp_metric import (  # noqa: E402
    parse_otlp_int_metrics_json,
    parse_otlp_summaries_json,
    to_otlp_int_metrics_json,
    to_otlp_summaries_json,
)

INT_FRAME_COLS = (
    "metric string, labels map<string,string>, value bigint, ts timestamp, kind string"
)


def _int_frame(spark, rows):
    return spark.createDataFrame(rows, INT_FRAME_COLS)


def test_int_gauge_wire_value_is_string(spark):
    # int64 beyond double's 53-bit mantissa must survive exactly
    big = (1 << 60) + 1
    rows = [("mem", {"host": "a"}, big, T0, "gauge")]
    env = json.loads(to_otlp_int_metrics_json(_int_frame(spark, rows)).collect()[0]["value"])
    m = _only_metric(env)
    assert "intSum" not in m and "doubleGauge" not in m
    dp = m["intGauge"]["dataPoints"][0]
    # jsonpb renders 64-bit ints as STRINGS
    assert dp["value"] == str(big)
    back = parse_otlp_int_metrics_json(
        to_otlp_int_metrics_json(_int_frame(spark, rows))
    ).collect()[0]
    assert back["value"] == big and back["kind"] == "gauge"


def test_int_sum_zero_value_omitted_reads_back_zero(spark):
    rows = [("clicks", {"u": "7"}, 0, T0, "sum_cumulative_monotonic")]
    env = json.loads(to_otlp_int_metrics_json(_int_frame(spark, rows)).collect()[0]["value"])
    m = _only_metric(env)
    s = m["intSum"]
    assert s["aggregationTemporality"] == "AGGREGATION_TEMPORALITY_CUMULATIVE"
    assert s["isMonotonic"] is True
    assert "value" not in s["dataPoints"][0]
    back = parse_otlp_int_metrics_json(
        to_otlp_int_metrics_json(_int_frame(spark, rows))
    ).collect()[0]
    assert back["value"] == 0 and back["kind"] == "sum_cumulative_monotonic"


def test_int_junk_degrades_per_row(spark):
    rows = [
        ("not json at all",),
        ('{"resourceMetrics":[{"instrumentationLibraryMetrics":[{"metrics":['
         '{"name":"m","intGauge":{"dataPoints":[{"value":"junk","timeUnixNano":"nope"}]}},'
         '{"name":"delta","intSum":{"dataPoints":[{"value":"5"}],'
         '"aggregationTemporality":"AGGREGATION_TEMPORALITY_DELTA","isMonotonic":true}},'
         '{"name":"nomember"}]}]}]}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse_otlp_int_metrics_json(df).collect()
    by_name = {r["metric"]: r for r in out}
    # junk value string -> NULL (distinguishable from omitted-0); junk nanos -> NULL ts
    assert by_name["m"]["value"] is None and by_name["m"]["ts"] is None
    # DELTA sum keeps rows with NULL kind
    assert by_name["delta"]["kind"] is None and by_name["delta"]["value"] == 5
    # metric with no recognized member explodes to nothing
    assert "nomember" not in by_name and len(out) == 2


# --- doubleSummary member ---------------------------------------------------

SUMMARY_FRAME_COLS = (
    "metric string, labels map<string,string>, ts timestamp, h_sum double,"
    " h_count bigint, quantiles array<struct<quantile:double,value:double>>"
)


def _summary_frame(spark, rows):
    return spark.createDataFrame(rows, SUMMARY_FRAME_COLS)


def test_summary_wire_shape_golden(spark):
    rows = [("lat", {"svc": "api"}, T0, 12.5, 4, [(0.0, 1.0), (0.5, 3.0), (1.0, 7.5)])]
    env = json.loads(to_otlp_summaries_json(_summary_frame(spark, rows)).collect()[0]["value"])
    m = _only_metric(env)
    assert set(m.keys()) == {"name", "doubleSummary"}
    dp = m["doubleSummary"]["dataPoints"][0]
    assert dp["count"] == "4"  # fixed64 -> string
    assert dp["sum"] == 12.5
    qvs = dp["quantileValues"]
    # float64 omit-empty inside each pair: the 0.0 quantile ships memberless
    assert "quantile" not in qvs[0] and qvs[0]["value"] == 1.0
    assert qvs[1] == {"quantile": 0.5, "value": 3.0}
    assert qvs[2] == {"quantile": 1.0, "value": 7.5}


def test_summary_omit_rules_and_roundtrip(spark):
    rows = [
        ("empty", {}, None, 0.0, 0, []),
        ("lat", {"svc": "api"}, T0, 12.5, 4, [(0.0, 0.0), (0.5, 3.0)]),
    ]
    outs = {
        json.loads(r["value"])["resourceMetrics"][0]["instrumentationLibraryMetrics"][0][
            "metrics"
        ][0]["name"]: json.loads(r["value"])
        for r in to_otlp_summaries_json(_summary_frame(spark, rows)).collect()
    }
    dp0 = _only_metric(outs["empty"])["doubleSummary"]["dataPoints"][0]
    # count 0, sum 0.0, empty quantileValues: all omitted
    assert "count" not in dp0 and "sum" not in dp0 and "quantileValues" not in dp0
    assert "timeUnixNano" not in dp0 and "labels" not in dp0
    back = {
        r["metric"]: r
        for r in parse_otlp_summaries_json(
            to_otlp_summaries_json(_summary_frame(spark, rows))
        ).collect()
    }
    assert back["empty"]["h_count"] == 0 and back["empty"]["h_sum"] == 0.0
    assert back["empty"]["ts"] is None and back["empty"]["quantiles"] is None
    got = [(q["quantile"], q["value"]) for q in back["lat"]["quantiles"]]
    # the omitted 0.0 quantile AND its 0.0 value read back as 0.0
    assert got == [(0.0, 0.0), (0.5, 3.0)]
    assert back["lat"]["h_sum"] == 12.5 and back["lat"]["h_count"] == 4


def test_summary_junk_degrades_per_row(spark):
    rows = [
        ('{"resourceMetrics":[{"instrumentationLibraryMetrics":[{"metrics":['
         '{"name":"s","doubleSummary":{"dataPoints":[{"count":"junk","timeUnixNano":"x"}]}},'
         '{"name":"nomember"}]}]}]}',),
        ("{broken",),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse_otlp_summaries_json(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["metric"] == "s"
    # junk count -> NULL (not the omitted-0 path), junk nanos -> NULL ts
    assert r["h_count"] is None and r["ts"] is None and r["h_sum"] == 0.0
