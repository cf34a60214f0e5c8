"""OTLP protobuf wire codec (sources/otlp_proto.py) — golden bytes built
BY HAND (independent of the encoder helpers), junk-wire policy, and the
Spark-level roundtrip. Field numbers from the reference's generated
model/internal/data/protogen/logs/v1/logs.pb.go:158-305 and
common/v1/common.pb.go:85-273."""

from __future__ import annotations

import datetime as dt

import pytest

from opentelemetry_collector_spark.sources.otlp_proto import (
    _decode_envelope,
    _LIB_NAME,
    encode_log_record,
    encode_logs_request,
)


def _hand_varint(n: int) -> bytes:
    out = b""
    while True:
        if n < 0x80:
            return out + bytes([n])
        out += bytes([n & 0x7F | 0x80])
        n >>= 7


def _hand_len(field: int, payload: bytes) -> bytes:
    return bytes([field << 3 | 2]) + _hand_varint(len(payload)) + payload


class TestGoldenBytes:
    """Encoder output against bytes assembled with INDEPENDENT helpers."""

    def test_minimal_record_golden(self):
        # LogRecord{time_unix_nano: 1e18, body: "hi", attributes: [role=user, turn.idx=3]}
        t = 10**18
        expected = (
            bytes([0x09]) + t.to_bytes(8, "little")                 # field 1 fixed64
            + _hand_len(5, _hand_len(1, b"hi"))                      # body AnyValue
            + _hand_len(6, _hand_len(1, b"role") + _hand_len(2, _hand_len(1, b"user")))
            + _hand_len(6, _hand_len(1, b"turn.idx") + _hand_len(2, bytes([0x18, 0x03])))
        )
        assert encode_log_record(t, "hi", "user", None, 3) == expected

    def test_envelope_nesting_golden(self):
        rec = encode_log_record(None, "x", None, None, None)
        lib = _hand_len(1, _hand_len(1, _LIB_NAME.encode()))
        ill = lib + _hand_len(2, rec)
        resource = _hand_len(1, _hand_len(1, b"conv.id") + _hand_len(2, _hand_len(1, b"c-9")))
        expected = _hand_len(1, _hand_len(1, resource) + _hand_len(2, ill))
        assert encode_logs_request("c-9", [rec]) == expected

    def test_omit_empty(self):
        # null ts / text / tool / idx contribute NO bytes; role only
        rec = encode_log_record(None, None, "tool", None, None)
        assert rec == _hand_len(6, _hand_len(1, b"role") + _hand_len(2, _hand_len(1, b"tool")))
        assert encode_log_record(None, None, None, None, None) == b""

    def test_negative_int_ten_byte_varint(self):
        rec = encode_log_record(None, None, None, None, None)
        assert rec == b""
        neg = encode_log_record(None, None, None, None, -2)
        # int64 -2 as two's complement varint: fe ff ff ff ff ff ff ff ff 01
        any_v = bytes([0x18]) + bytes([0xFE] + [0xFF] * 8 + [0x01])
        assert neg == _hand_len(6, _hand_len(1, b"turn.idx") + _hand_len(2, any_v))

    def test_multibyte_utf8_lengths(self):
        text = "héllo ✓"
        rec = encode_log_record(None, text, None, None, None)
        assert rec == _hand_len(5, _hand_len(1, text.encode("utf-8")))


class TestDecode:
    def _one(self, env: bytes):
        rows = list(_decode_envelope(env))
        assert len(rows) == 1
        return rows[0]

    def test_roundtrip_row(self):
        rec = encode_log_record(123456789, "hello", "assistant", "calc", 7)
        row = self._one(encode_logs_request("c-1", [rec]))
        assert row == ("c-1", 7, "assistant", "hello", "calc", 123456789)

    def test_unknown_fields_skipped(self):
        # splice unknown fields of every wire type into a record: varint
        # field 99, fixed32 field 98, fixed64 field 97, LEN field 96
        # (proto tags > 15 need 2-byte tag varints)
        rec = (
            _hand_varint(99 << 3 | 0) + _hand_varint(5)
            + _hand_varint(98 << 3 | 5) + (7).to_bytes(4, "little")
            + _hand_varint(97 << 3 | 1) + (9).to_bytes(8, "little")
            + _hand_varint(96 << 3 | 2) + _hand_varint(3) + b"xyz"
            + encode_log_record(None, "kept", "user", None, 1)
        )
        row = self._one(encode_logs_request("c-2", [rec]))
        assert row == ("c-2", 1, "user", "kept", None, None)

    def test_duplicate_attr_first_wins(self):
        rec = (
            encode_log_record(None, None, "first", None, None)
            + _hand_len(6, _hand_len(1, b"role") + _hand_len(2, _hand_len(1, b"second")))
        )
        row = self._one(encode_logs_request("c-3", [rec]))
        assert row[2] == "first"

    def test_zero_time_is_null(self):
        rec = bytes([0x09]) + (0).to_bytes(8, "little") + encode_log_record(None, "t", None, None, None)
        row = self._one(encode_logs_request("c-4", [rec]))
        assert row[5] is None

    def test_int32_overflow_refuses_field(self):
        rec = encode_log_record(None, None, None, None, 2**40)
        row = self._one(encode_logs_request("c-5", [rec]))
        assert row[1] is None

    def test_truncated_envelope_refuses_message(self):
        rec = encode_log_record(1, "x", None, None, None)
        env = encode_logs_request("c-6", [rec])
        with pytest.raises(Exception):
            list(_decode_envelope(env[:-3]))

    def test_non_string_body_is_null_text(self):
        # body AnyValue{int_value: 42} -> text None
        rec = _hand_len(5, bytes([0x18, 42]))
        row = self._one(encode_logs_request("c-7", [rec]))
        assert row[3] is None

    def test_multiple_records_and_resources(self):
        r1 = encode_log_record(None, "a", None, None, 0)
        r2 = encode_log_record(None, "b", None, None, 1)
        env = encode_logs_request("c-8", [r1, r2]) + encode_logs_request("c-9", [r1])
        rows = list(_decode_envelope(env))
        assert [(r[0], r[1], r[3]) for r in rows] == [
            ("c-8", 0, "a"), ("c-8", 1, "b"), ("c-9", 0, "a"),
        ]


class TestSparkRoundtrip:
    def test_registry_dispatch_and_identity(self, spark):
        from opentelemetry_collector_spark.sources.codecs import unmarshal
        from opentelemetry_collector_spark.sources.otlp_proto import to_otlp_proto

        rows = [
            ("c-1", 0, "user", "hi there", None, dt.datetime(2024, 3, 1, 12, 0, 0, 123456)),
            ("c-1", 1, "assistant", "héllo ✓", "calc", dt.datetime(2024, 3, 1, 12, 0, 1)),
            ("c-2", 0, "tool", None, "search", None),  # null text AND null ts
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        )
        back = (
            unmarshal(to_otlp_proto(df), "otlp_proto")
            .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
            .collect()
        )
        got = sorted((tuple(r) for r in back))
        assert got == sorted(rows)

    def test_malformed_payload_refuses_message_not_batch(self, spark):
        from opentelemetry_collector_spark.sources.otlp_proto import (
            encode_log_record,
            encode_logs_request,
            parse_otlp_proto,
        )

        good = encode_logs_request("ok", [encode_log_record(None, "t", "user", None, 0)])
        df = spark.createDataFrame(
            [(bytearray(good),), (bytearray(b"\xff\xff\xff"),), (None,)], "value binary"
        )
        rows = parse_otlp_proto(df).collect()
        assert len(rows) == 1 and rows[0]["conv_id"] == "ok"


class TestAdversarialWire:
    """ADVICE r3: structurally valid wires with adversarial numeric values
    must degrade per the field-refusal policy, never crash a Spark task."""

    def test_high_bit_timestamp_refuses_field(self):
        # fixed64 time_unix_nano with the high bit set (>= 2^63) would
        # overflow the bigint Arrow schema downstream: refuse the FIELD
        rec = bytes([0x09]) + (1 << 63).to_bytes(8, "little")
        rec += _hand_len(6, _hand_len(1, b"role") + _hand_len(2, _hand_len(1, b"user")))
        (row,) = list(_decode_envelope(encode_logs_request("c-hb", [rec])))
        assert row[5] is None  # t_nanos refused
        assert row[0] == "c-hb" and row[2] == "user"  # record survives

    def test_high_bit_timestamp_survives_spark_batch(self, spark):
        # pre-fix repro: pandas inferred uint64 for the overflowing value
        # and pyarrow raised ArrowInvalid, failing the WHOLE batch
        from opentelemetry_collector_spark.sources.otlp_proto import parse_otlp_proto

        bad_rec = bytes([0x09]) + ((1 << 63) | 12345).to_bytes(8, "little")
        good = encode_logs_request(
            "ok", [encode_log_record(1_700_000_000_000_000_000, "t", "user", None, 0)]
        )
        bad = encode_logs_request("hb", [bad_rec])
        df = spark.createDataFrame(
            [(bytearray(good),), (bytearray(bad),)], "value binary"
        )
        rows = {r["conv_id"]: r for r in parse_otlp_proto(df).collect()}
        assert rows["hb"]["ts"] is None
        assert rows["ok"]["ts"] is not None

    def test_uvarint_masks_to_uint64(self):
        # 10-byte varint whose final byte carries bits past 63: Go/gogo
        # truncate to uint64, so 2^70-1 must decode as int64 -1 (in int32
        # range -> turn.idx keeps the value), not a >64-bit python int
        any_v = bytes([0x18]) + bytes([0xFF] * 9 + [0x7F])
        rec = _hand_len(6, _hand_len(1, b"turn.idx") + _hand_len(2, any_v))
        (row,) = list(_decode_envelope(encode_logs_request("c", [rec])))
        assert row[1] == -1
