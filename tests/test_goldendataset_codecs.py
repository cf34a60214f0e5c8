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


# ---------------------------------------------------------------------------
# PICT pairwise sweep (internal/goldendataset/pict_tracing_input_defs.go
# analog): every PAIR of axis values — attr value shape x cardinality x
# resource presence x span name shape x status x parentage — crosses every
# wire codec at least once, without paying the full cross product.
# ---------------------------------------------------------------------------

PICT_AXES = {
    # AttributeValue shapes a string-typed attribute store must carry
    "attr_value": [
        "plain", "", "42", "-7.25", "true",
        "uni-\u00e9\u4e2d\u6587", 'q"uo\\te', "nl\nnl", "x" * 300,
    ],
    "attr_card": [0, 1, 3],
    "resource": ["present", "empty"],
    "name": ["op", "", "uni-\u00fc"],
    "status": [(0, ""), (2, "boom"), (1, "")],
    "parent": [None, "bbbbbbbbbbbbbbbb"],
}


def pict_frame(spark):
    from opentelemetry_collector_spark.sources.transcripts import pairwise_cases

    cases = pairwise_cases(PICT_AXES)
    rows = []
    for i, c in enumerate(cases):
        attrs = {f"k{j}": c["attr_value"] for j in range(c["attr_card"])}
        code, msg = c["status"]
        rows.append(
            (
                f"{i:032x}", f"{i:016x}", c["parent"], c["name"], i % 6, code, msg,
                "svcP" if c["resource"] == "present" else "",
                f"2026-03-04 05:06:{i % 60:02d}.{i:06d}"[:26], 500 + i, attrs,
            )
        )
    return len(cases), spark.createDataFrame(rows, FRAME_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_pairwise_generator_covers_all_pairs_deterministically():
    from opentelemetry_collector_spark.sources.transcripts import pairwise_cases

    cases = pairwise_cases(PICT_AXES)
    assert cases == pairwise_cases(PICT_AXES)  # no RNG anywhere
    for (xa, xb) in itertools.combinations(PICT_AXES, 2):
        for va, vb in itertools.product(PICT_AXES[xa], PICT_AXES[xb]):
            assert any(c[xa] == va and c[xb] == vb for c in cases), (xa, va, xb, vb)
    # and it is far smaller than the cross product it covers
    full = 1
    for vals in PICT_AXES.values():
        full *= len(vals)
    assert len(cases) < full / 10


@pytest.mark.parametrize("codec", sorted(CODECS))
def test_pict_pairwise_frame_survives_each_wire(spark, codec):
    """Every attr-value shape meets every cardinality/resource/name/status/
    parent value somewhere in the frame, and each wire must reconstruct
    the rows byte-for-byte — the correctness-testbed property run over
    the pairwise matrix instead of a fixed golden file."""
    import importlib

    mod_name, to_name, parse_name = CODECS[codec]
    mod = importlib.import_module(mod_name)
    n, frame = pict_frame(spark)
    back = getattr(mod, parse_name)(getattr(mod, to_name)(frame))
    a, b = _rows(frame), _rows(back)
    assert len(a) == len(b) == n
    for x, y in zip(a, b):
        if codec in ("jaeger", "opencensus") and x["service_name"] == "":
            # the reference's translators substitute the documented
            # placeholder when a resource carries no service name
            # (tracetranslator.ResourceNoServiceName) — expected lossiness
            x = dict(x, service_name="OTLPResourceNoServiceName")
        assert x == y, f"{codec}: {x} != {y}"


# ---------------------------------------------------------------------------
# Nested AnyValue pairwise sweep (the pict_tracing_input_defs.go attribute
# axis extended to the composite arms — array_value/kvlist_value,
# common.pb.go:96-100): every payload shape x record-field combination
# crosses the OTLP logs proto wire; the expected flat rendering is the
# SURVEY §1.3 contract (canonical JSON, sorted keys), written out BY HAND
# below — independent of the decoder's own json.dumps.
# ---------------------------------------------------------------------------

NESTED_PAYLOADS = {
    # axis value -> (python payload for the encoder, expected attr string)
    "flat_str": ("plain", "plain"),
    "flat_int": (-7, "-7"),
    "arr_empty": ([], "[]"),
    "arr_str": (["b", "a"], '["b","a"]'),
    "arr_mixed": (["x", 3, True, 0.5], '["x",3,true,0.5]'),
    "arr_nested": ([["y"], {"k": 1}], '[["y"],{"k":1}]'),
    "kv_flat": ({"b": "2", "a": "1"}, '{"a":"1","b":"2"}'),
    "kv_nested": ({"outer": {"z": [1, 2], "a": True}}, '{"outer":{"a":true,"z":[1,2]}}'),
    "kv_unicode": ({"ké": "中"}, '{"ké":"中"}'),
}

NESTED_AXES = {
    "payload": list(NESTED_PAYLOADS),
    "resource": ["present", "absent"],
    "ts": [1_700_000_000_000_000_000, None],
    "text": ["body", None],
}


def test_nested_anyvalue_pairwise_sweep():
    from opentelemetry_collector_spark.sources.otlp_proto import (
        _any_nested,
        _decode_envelope,
        _kv,
        _ld,
        _f64,
        encode_logs_request,
    )
    from opentelemetry_collector_spark.sources.transcripts import pairwise_cases

    cases = pairwise_cases(NESTED_AXES)
    assert cases == pairwise_cases(NESTED_AXES)
    for c in cases:
        payload, want = NESTED_PAYLOADS[c["payload"]]
        rec = b""
        if c["ts"]:
            rec += _f64(1, c["ts"])
        if c["text"] is not None:
            rec += _ld(5, _any_nested(c["text"]))
        rec += _ld(6, _kv("role", _any_nested("user")))
        rec += _ld(6, _kv("tool", _any_nested(payload)))
        env = encode_logs_request("c-1" if c["resource"] == "present" else None, [rec])
        (row,) = list(_decode_envelope(env))
        conv, idx, role, text, tool, t_nanos = row
        assert conv == ("c-1" if c["resource"] == "present" else None)
        assert t_nanos == c["ts"]
        assert text == c["text"]
        assert role == "user"
        # the contract under test: composite payloads survive as their
        # canonical JSON rendering; flat strings stay themselves; non-str
        # scalars stay typed (coerced downstream), so tool reads None
        if c["payload"] == "flat_int":
            assert tool is None  # tool column is string-typed; int is junk
        else:
            assert tool == want, c["payload"]


def test_nested_anyvalue_bomb_refuses_field_not_stack():
    from opentelemetry_collector_spark.sources.otlp_proto import (
        _any_nested,
        _decode_envelope,
        _kv,
        _ld,
        encode_logs_request,
    )

    bomb: object = "x"
    for _ in range(300):
        bomb = [bomb]
    rec = _ld(6, _kv("tool", _any_nested(bomb))) + _ld(6, _kv("role", _any_nested("user")))
    (row,) = list(_decode_envelope(encode_logs_request("c", [rec])))
    assert row[4] is None  # tool: nesting bomb -> field refused
    assert row[2] == "user"  # the record itself survives
