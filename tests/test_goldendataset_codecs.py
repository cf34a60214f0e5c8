"""Cross-codec correctness matrix — the goldendataset/testbed analog.

The reference's correctness testbed pumps PICT-combinatorial golden traces
through every receiver/exporter format pair and asserts the recorded data
equals what was sent (``testbed/correctness/traces/correctness_test.go:38-100``,
axes in ``internal/goldendataset/testdata/pict_input_traces.txt``). The
flattened-frame analog: a combinatorial span frame (kind x status x attrs x
parent) marshaled through EACH wire codec and parsed back must reconstruct
the identical frame — one property, three wires (zipkin v2 JSON, jaeger
UI-JSON, OpenCensus proto-JSON).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

FRAME_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, name string,"
    " kind int, status_code int, status_message string, service_name string,"
    " ts string, duration_us bigint, attrs map<string,string>"
)


def golden_frame(spark):
    """48 spans: all 6 kinds x {unset, error} status x {empty, 2-key} attrs
    x {root, child} — every combination the frame can express."""
    rows = []
    i = 0
    for kind, (code, msg), attrs, parent in itertools.product(
        range(6),
        [(0, ""), (2, "boom")],
        [{}, {"a": "1", "b": "x"}],
        [None, "aaaaaaaaaaaaaaaa"],
    ):
        rows.append(
            (
                f"{i:032x}",
                f"{i:016x}",
                parent,
                f"op-{i}",
                kind,
                code,
                msg,
                "svcG",
                f"2026-01-02 03:04:{i % 60:02d}.{i:06d}"[:26],
                1000 + i,
                attrs,
            )
        )
        i += 1
    return spark.createDataFrame(rows, FRAME_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


CODECS = {
    "zipkin": ("opentelemetry_collector_spark.sources.zipkin", "to_zipkin_json", "parse_zipkin_json"),
    "jaeger": ("opentelemetry_collector_spark.sources.jaeger", "to_jaeger_json", "parse_jaeger_json"),
    "opencensus": ("opentelemetry_collector_spark.sources.opencensus", "to_oc_json", "parse_oc_json"),
}

COLS = [
    "trace_id", "span_id", "parent_span_id", "name", "kind", "status_code",
    "status_message", "service_name", "ts", "duration_us", "attrs",
]


def _rows(df):
    out = []
    for r in df.select(COLS).collect():
        d = r.asDict()
        d["attrs"] = dict(d["attrs"] or {})
        out.append(d)
    return sorted(out, key=lambda d: d["span_id"])


@pytest.mark.parametrize("codec", sorted(CODECS))
def test_golden_frame_survives_each_wire(spark, codec):
    import importlib

    mod_name, to_name, parse_name = CODECS[codec]
    mod = importlib.import_module(mod_name)
    frame = golden_frame(spark)
    back = getattr(mod, parse_name)(getattr(mod, to_name)(frame))
    a, b = _rows(frame), _rows(back)
    assert len(a) == len(b) == 48
    for x, y in zip(a, b):
        assert x == y, f"{codec}: {x} != {y}"
