"""Codecs: OTLP-JSON-style marshal/unmarshal + per-encoding dispatch.

The reference ships paired codecs — pdata <-> protobuf
(``model/otlp/pb_marshaler.go``) and pdata <-> OTLP-JSON
(``model/otlp/json_marshaler.go:27-60``, ``json_unmarshaler.go``) — and the
Kafka receiver picks one per configured encoding from a registry
(``receiver/kafkareceiver/unmarshaler.go``: otlp_proto / jaeger_proto /
jaeger_json / zipkin). Spark-side, Parquet/Iceberg already covers the binary
representation; what remains worth reproducing is:

- a **line-JSON codec** for transcript turns (`to_turn_json` /
  `parse_turn_json`) — the file-exporter wire format
  (``exporter/fileexporter/file_exporter.go:30-80`` writes one OTLP-JSON
  line per batch) and the landing-zone format a Kafka topic would carry;
- an **unmarshaler registry** keyed by encoding name, so a scan over a raw
  `value:string`/`binary` column (the Kafka message payload analog) is
  `UNMARSHALERS[encoding](df, col)` exactly like the Go dispatch.

Everything is built on `F.to_json`/`F.from_json` — JVM-side, codegen, no
Python in the path — so a 100 TB landing zone of JSON lines parses at scan
speed with full predicate pushdown on the post-parse columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.schema import TRANSCRIPTS_SCHEMA

TURN_COLS = [f.name for f in TRANSCRIPTS_SCHEMA.fields]

# Wire schema: like OTLP-JSON, the timestamp travels as integer unix nanos
# ("timeUnixNano", model/pdata/timestamp.go:23 heritage) — exact, locale-free,
# and immune to the millisecond truncation of text timestamp formats.
_WIRE_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, time_unix_nano bigint"
)


def to_turn_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Marshal each turn to one JSON line (file-exporter wire format,
    ``exporter/fileexporter/file_exporter.go:30-80``). Null fields are
    dropped by to_json, mirroring jsonpb's omit-empty."""
    wire = F.struct(
        *[F.col(c) for c in TURN_COLS if c != "ts"],
        # cast handles TIMESTAMP_NTZ inputs; the session is pinned UTC so
        # NTZ -> instant is the identity
        (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).alias("time_unix_nano"),
    )
    return df.select(F.to_json(wire).alias(out_col))


def parse_turn_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal JSON-line turns back to typed columns.

    Malformed lines yield a null struct (PERMISSIVE mode) and are counted by
    the caller via the refused-records metric rather than failing the batch —
    the receiver-side refused_log_records semantics
    (``internal/obsreportconfig/obsmetrics/obs_receiver.go:24-55``)."""
    parsed = F.from_json(F.col(col), _WIRE_SCHEMA)
    return df.select(parsed.alias("_t")).select(
        "_t.conv_id",
        "_t.turn_idx",
        "_t.role",
        "_t.text",
        "_t.tool",
        # integer `div`, not `/`: nanos ~1.7e18 exceed double's 2^53 exact
        # range, so float division is off by ±1 microsecond
        F.timestamp_micros(F.expr("_t.time_unix_nano div 1000")).alias("ts"),
    )


def parse_kv_text(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal `k=v` space-separated log lines (the zipkin/plain-text
    receiver analog, ``receiver/zipkinreceiver/trace_receiver.go:89-180``
    reduced to transcript fields): logfmt-ish fallback encoding."""

    def kv(key: str) -> Column:
        return F.regexp_extract(F.col(col), rf"(?:^|\s){key}=(\S*)", 1)

    nonempty = lambda c: F.when(c != "", c)  # noqa: E731
    return df.select(
        nonempty(kv("conv_id")).alias("conv_id"),
        nonempty(kv("turn_idx")).cast("int").alias("turn_idx"),
        nonempty(kv("role")).alias("role"),
        nonempty(F.regexp_replace(kv("text"), "_", " ")).alias("text"),
        nonempty(kv("tool")).alias("tool"),
        nonempty(kv("ts")).cast("timestamp").alias("ts"),
    )


# Per-encoding dispatch (receiver/kafkareceiver/unmarshaler.go:defaultLogsUnmarshalers)
UNMARSHALERS: dict[str, Callable[[DataFrame, str], DataFrame]] = {
    "turn_json": parse_turn_json,
    "kv_text": parse_kv_text,
}


def unmarshal(df: DataFrame, encoding: str, col: str = "value") -> DataFrame:
    if encoding not in UNMARSHALERS:
        raise ValueError(f"unknown encoding {encoding!r} (have {sorted(UNMARSHALERS)})")
    return UNMARSHALERS[encoding](df, col)
