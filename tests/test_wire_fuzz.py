"""Fuzz the binary wire codecs (r3): property-based roundtrip identity on
adversarial field values, and mutation fuzz asserting the decoders NEVER
raise anything but their refusal error on corrupted bytes — the junk
policy is refuse-the-message, not crash-the-batch. Pure-Python level
(the Spark plumbing is covered by the roundtrip queries); hypothesis
drives the value space, a seeded PRNG drives the mutations."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_spark.sources.jaeger_proto import (
    decode_jaeger_span,
    encode_jaeger_span,
)
from opentelemetry_collector_spark.sources.otlp_proto import (
    _decode_envelope,
    _ld,
    _Malformed,
    encode_log_record,
    encode_logs_request,
)
from opentelemetry_collector_spark.sources.zipkin_proto import (
    decode_zipkin_spans,
    encode_zipkin_span,
)
from opentelemetry_collector_spark.sources.zipkin_thrift import (
    decode_thrift_spans,
    encode_v1_thrift_span,
    serialize_thrift_spans,
)

# valid UTF-8 text, newline/control/emoji-heavy, no lone surrogates
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=80
)
_opt_text = st.one_of(st.none(), _text)
_nanos = st.one_of(st.none(), st.integers(min_value=1, max_value=(1 << 63) - 1))
_idx = st.one_of(st.none(), st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1))


class TestOtlpLogsRoundtripProperty:
    @settings(max_examples=200, deadline=None)
    @given(conv=_opt_text, t=_nanos, text=_opt_text, role=_opt_text, tool=_opt_text, idx=_idx)
    def test_roundtrip_identity(self, conv, t, text, role, tool, idx):
        rec = encode_log_record(t, text, role, tool, idx)
        rows = list(_decode_envelope(encode_logs_request(conv, [rec])))
        assert len(rows) == 1
        got_conv, got_idx, got_role, got_text, got_tool, got_t = rows[0]
        assert got_conv == conv
        assert got_t == t
        assert got_text == text
        assert got_role == role
        assert got_tool == tool
        assert got_idx == idx


_HEX = "0123456789abcdef"


def _rand_hex(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(_HEX) for _ in range(n))


def _span_row(rng: random.Random) -> dict:
    return dict(
        trace_id=_rand_hex(rng, 32),
        span_id=_rand_hex(rng, 16),
        parent_span_id=_rand_hex(rng, 16) if rng.random() < 0.7 else None,
        name="op-%d" % rng.randrange(100),
        kind=rng.randrange(6),
        status_code=rng.choice([0, 0, 2]),
        status_message="boom" if rng.random() < 0.3 else "",
        service_name=rng.choice(["svc-a", "svc-b", ""]),
        start_us=rng.randrange(1, 2**62),
        duration_us=rng.randrange(0, 10**9),
        attrs={f"k{j}": f"v{rng.randrange(10)}" for j in range(rng.randrange(4))},
    )


def _mutations(payload: bytes, rng: random.Random, n: int = 300):
    for _ in range(n):
        b = bytearray(payload)
        op = rng.randrange(3)
        if op == 0 and b:  # flip a byte
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
        elif op == 1:  # truncate
            b = b[: rng.randrange(len(b) + 1)]
        else:  # splice random garbage
            i = rng.randrange(len(b) + 1)
            b[i:i] = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
        yield bytes(b)


class TestMutationFuzz:
    """Corrupted payloads must either decode (garbage-in-garbage-out rows)
    or raise exactly the codec's refusal error — never an unexpected
    exception type (IndexError, struct.error leaking, infinite loop...)."""

    def test_otlp_logs_decoder_total(self):
        rng = random.Random(42)
        rec = encode_log_record(1_700_000_000_000_000_000, "text", "user", "calc", 3)
        payload = encode_logs_request("c-1", [rec, rec])
        for mutant in _mutations(payload, rng):
            try:
                list(_decode_envelope(mutant))
            except _Malformed:
                pass

    def test_jaeger_decoder_total(self):
        rng = random.Random(43)
        payload = encode_jaeger_span(_span_row(rng), False, False)
        for mutant in _mutations(payload, rng):
            try:
                decode_jaeger_span(mutant)
            except _Malformed:
                pass

    def test_zipkin_proto_decoder_total(self):
        rng = random.Random(44)
        payload = _ld(1, encode_zipkin_span(_span_row(rng), False, False))
        for mutant in _mutations(payload, rng):
            try:
                decode_zipkin_spans(mutant)
            except _Malformed:
                pass

    def test_zipkin_thrift_decoder_total(self):
        from opentelemetry_collector_spark.sources import zipkin_thrift as zt

        rng = random.Random(45)
        span = {
            "traceId": _rand_hex(rng, 32), "id": _rand_hex(rng, 16),
            "parentId": None, "name": "op", "timestamp": 1_700_000_000_000_000,
            "duration": 4000,
            "annotations": [{"timestamp": 1, "value": "cs",
                             "endpoint": {"serviceName": "s"}}],
            "binaryAnnotations": [{"key": "k", "value": "v",
                                   "endpoint": {"serviceName": "s"}}],
        }
        payload = serialize_thrift_spans([encode_v1_thrift_span(span)])
        for mutant in _mutations(payload, rng):
            try:
                decode_thrift_spans(mutant)
            except (zt._Malformed, _Malformed):
                pass


class TestJaegerZipkinRoundtripFuzz:
    """Seeded random span frames roundtrip through both trace proto wires
    at the dict level (the Spark level is pinned by q187/q188)."""

    def test_jaeger_span_fields_survive(self):
        rng = random.Random(7)
        for _ in range(200):
            row = _span_row(rng)
            d = decode_jaeger_span(encode_jaeger_span(dict(row), False, False))
            assert d["traceID"] == row["trace_id"]
            assert d["spanID"] == row["span_id"]
            assert d["startTime"] == row["start_us"]
            assert d["duration"] == row["duration_us"]
            tags = {t["key"]: t["value"] for t in d["tags"]}
            for k, v in row["attrs"].items():
                assert tags[k] == v
            if row["parent_span_id"]:
                assert d["references"][0]["spanID"] == row["parent_span_id"]

    def test_zipkin_span_fields_survive(self):
        rng = random.Random(8)
        for _ in range(200):
            row = _span_row(rng)
            (s,) = decode_zipkin_spans(_ld(1, encode_zipkin_span(dict(row), False, False)))
            assert s["traceId"] == row["trace_id"]
            assert s["id"] == row["span_id"]
            assert s["parentId"] == row["parent_span_id"]
            assert (s["timestamp"] or 0) == (row["start_us"] or 0)
            for k, v in row["attrs"].items():
                assert s["tags"][k] == v


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


# recursive AnyValue payloads: scalars at the leaves, arrays/kvlists above
_nested_leaf = st.one_of(
    _text,
    st.booleans(),
    st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)
_nested_any = st.recursive(
    _nested_leaf,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(_text.filter(bool), inner, max_size=4),
    ),
    max_leaves=12,
)


class TestNestedAnyValueFuzz:
    @settings(max_examples=200, deadline=None)
    @given(payload=st.one_of(st.lists(_nested_any, max_size=4),
                             st.dictionaries(_text.filter(bool), _nested_any, max_size=4)))
    def test_composite_renders_canonical_json(self, payload):
        """Any composite payload decodes to a string that (a) parses back
        to the same value and (b) is already in canonical form (sorted
        keys, compact separators) at every level."""
        import json

        from opentelemetry_collector_spark.sources.otlp_proto import _any_nested, _kv

        rec = _ld(6, _kv("tool", _any_nested(payload)))
        env = encode_logs_request("c", [rec])
        (row,) = list(_decode_envelope(env))
        rendered = row[4]
        assert isinstance(rendered, str)
        assert json.loads(rendered) == payload
        assert rendered == json.dumps(
            json.loads(rendered), sort_keys=True, separators=(",", ":"), ensure_ascii=False
        )

    def test_mutation_fuzz_nested_decoder_total(self):
        from opentelemetry_collector_spark.sources.otlp_proto import _any_nested, _kv

        rng = random.Random(47)
        payload = {"a": [1, {"b": ["x", 2.5, True]}], "c": "s"}
        rec = _ld(6, _kv("tool", _any_nested(payload)))
        env = encode_logs_request("c", [rec, rec])
        for mutant in _mutations(env, rng):
            try:
                list(_decode_envelope(mutant))
            except _Malformed:
                pass
