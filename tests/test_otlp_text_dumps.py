"""otlptext traces/metrics debug dumps + metrics-signal rebatch split.

Reference: ``internal/otlptext/traces.go:29-66``, ``metrics.go:30-52``,
``databuffer.go:36-38,71-137`` (field-line rendering) and
``processor/batchprocessor/splitmetrics.go:21-77`` with the straddle
semantics pinned by ``splitmetrics_test.go:179-205`` (TestSplitMetricsUneven).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.batch import split_datapoint_batches
from opentelemetry_collector_spark.sources.codecs import (
    to_otlp_text_metrics,
    to_otlp_text_traces,
)

TS = dt.datetime(2024, 1, 2, 3, 4, 5)
TS_NS = int(TS.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000_000


def _span_rows(spark):
    return spark.createDataFrame(
        [
            (
                "aa" * 16,
                "bb" * 8,
                "cc" * 8,
                "calc",
                2,
                2,
                "error code=7",
                "assistant",
                TS,
                1500,
                {"turn.idx": "3", "tool": "calc"},
            ),
            # NULL parent (root span), no attrs beyond turn.idx, unset status
            (
                "aa" * 16,
                "dd" * 8,
                None,
                "user",
                3,
                0,
                "",
                "user",
                TS,
                0,
                {"turn.idx": "0"},
            ),
        ],
        "trace_id string, span_id string, parent_span_id string, name string, "
        "kind int, status_code int, status_message string, service_name string, "
        "ts timestamp, duration_us long, attrs map<string,string>",
    )


def test_traces_dump_golden(spark):
    out = {r["span_id"]: r["line"] for r in to_otlp_text_traces(_span_rows(spark)).collect()}
    expected = "\n".join(
        [
            "Span #3",
            "    Trace ID       : " + "aa" * 16,
            "    Parent ID      : " + "cc" * 8,
            "    ID             : " + "bb" * 8,
            "    Name           : calc",
            "    Kind           : SPAN_KIND_SERVER",
            f"    Start time     : {TS_NS}",
            f"    End time       : {TS_NS + 1500 * 1000}",
            "    Status code    : STATUS_CODE_ERROR",
            "    Status message : error code=7",
            "Attributes:",
            "     -> tool: STRING(calc)",
            "     -> turn.idx: STRING(3)",
        ]
    )
    assert out["bb" * 8] == expected


def test_traces_dump_null_parent_renders_empty(spark):
    out = {r["span_id"]: r["line"] for r in to_otlp_text_traces(_span_rows(spark)).collect()}
    lines = out["dd" * 8].split("\n")
    assert "    Parent ID      : " in lines  # empty value, label still printed
    assert "    Kind           : SPAN_KIND_CLIENT" in lines
    assert "    Status code    : STATUS_CODE_UNSET" in lines
    assert lines[-1] == "     -> turn.idx: STRING(0)"


def test_traces_dump_is_pure_projection(spark):
    plan = to_otlp_text_traces(_span_rows(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def _metric_rows(spark):
    return spark.createDataFrame(
        [
            ("reqs", "sum_cumulative_monotonic", {"user": "7"}, 3.0, TS),
            ("reqs", "sum_cumulative_monotonic", {"user": "7"}, 5.5, dt.datetime(2024, 1, 2, 3, 4, 6)),
            ("lat", "gauge", {"user": "9"}, 1.25, TS),
        ],
        "metric string, kind string, labels map<string,string>, value double, ts timestamp",
    )


def test_metrics_dump_golden_sum(spark):
    out = {(r["metric"], r["kind"]): r["line"] for r in to_otlp_text_metrics(_metric_rows(spark)).collect()}
    expected = "\n".join(
        [
            "Metric #1",  # name order: lat < reqs
            "Descriptor:",
            "     -> Name: reqs",
            "     -> Description: ",
            "     -> Unit: ",
            "     -> DataType: DoubleSum",
            "     -> IsMonotonic: true",
            "     -> AggregationTemporality: AGGREGATION_TEMPORALITY_CUMULATIVE",
            "DoubleDataPoints #0",
            "Data point labels:",
            "     -> user: 7",
            "StartTimestamp: 0",
            f"Timestamp: {TS_NS}",
            "Value: 3.000000",
            "DoubleDataPoints #1",
            "Data point labels:",
            "     -> user: 7",
            "StartTimestamp: 0",
            f"Timestamp: {TS_NS + 1_000_000_000}",
            "Value: 5.500000",
        ]
    )
    assert out[("reqs", "sum_cumulative_monotonic")] == expected


def test_metrics_dump_gauge_omits_sum_lines(spark):
    out = {(r["metric"], r["kind"]): r["line"] for r in to_otlp_text_metrics(_metric_rows(spark)).collect()}
    block = out[("lat", "gauge")]
    assert block.startswith("Metric #0\n")
    assert "     -> DataType: DoubleGauge" in block
    assert "IsMonotonic" not in block
    assert "AggregationTemporality" not in block
    assert "Value: 1.250000" in block


def _datapoint_rows(spark):
    # TestSplitMetricsUneven fixture: 10 metrics x 2 points, split at 9
    rows = [
        (f"m{i:02d}", "gauge", float(i * 2 + j), dt.datetime(2024, 1, 1, 0, 0, j))
        for i in range(10)
        for j in range(2)
    ]
    return spark.createDataFrame(rows, "metric string, kind string, value double, ts timestamp")


def test_split_datapoints_uneven_batches_and_straddle(spark):
    split = split_datapoint_batches(_datapoint_rows(spark), max_size=9)
    sizes = {
        r["batch_id"]: r["n"]
        for r in split.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    # splitmetrics_test.go:179-205 — 20 points at size 9: batches of 9/9/2
    assert sizes == {0: 9, 1: 9, 2: 2}
    # metric #4's two points straddle the first cut: point 9 is m04's second
    batches_of_m04 = {
        r["batch_id"] for r in split.filter(F.col("metric") == "m04").collect()
    }
    assert batches_of_m04 == {0, 1}


def test_split_datapoints_nothing_dropped_or_duplicated(spark):
    df = _datapoint_rows(spark)
    split = split_datapoint_batches(df, max_size=7)
    assert split.count() == df.count()
    assert split.select("metric", "value").distinct().count() == df.count()


def test_split_datapoints_noop_when_under_size(spark):
    # splitmetrics_test.go:25-33 — everything fits: one batch
    split = split_datapoint_batches(_datapoint_rows(spark), max_size=40)
    assert split.select("batch_id").distinct().collect()[0]["batch_id"] == 0
