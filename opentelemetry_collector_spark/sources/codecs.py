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

from pyspark.sql import Column, DataFrame, Window
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
        _nanos(F.col("ts")).alias("time_unix_nano"),
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
    # try_cast: one junk token ('turn_idx=abc', 'ts=garbage') must refuse
    # the FIELD, not ANSI-kill the batch — same contract as
    # parse_prometheus_text and the sampler's priority cast
    return df.select(
        nonempty(kv("conv_id")).alias("conv_id"),
        nonempty(kv("turn_idx")).try_cast("int").alias("turn_idx"),
        nonempty(kv("role")).alias("role"),
        nonempty(F.regexp_replace(kv("text"), "_", " ")).alias("text"),
        nonempty(kv("tool")).alias("tool"),
        nonempty(kv("ts")).try_cast("timestamp").alias("ts"),
    )


# --- Full OTLP-JSON envelope (3-level nesting) ---------------------------------
#
# The real OTLP-JSON wire shape (model/otlp/json_marshaler.go:27-60 via jsonpb):
# {"resourceLogs":[{"resource":{"attributes":[{"key":...,"value":{"stringValue":...}}]},
#   "instrumentationLibraryLogs":[{"logRecords":[{"timeUnixNano":"...","body":{...},
#   "attributes":[...]}]}]}]}
# Faithful details reproduced here: 64-bit ints (timeUnixNano, intValue) travel
# as JSON *strings* (jsonpb renders (u)int64 as string); attributes are an
# ordered KEY/VALUE LIST, not an object; absent fields are omitted.
# One conversation = one Resource (conv.id resource attribute); the scope is a
# fixed instrumentation library name; each turn = one LogRecord with the text
# as Body and role/tool/turn.idx as record attributes.

_OTLP_SCHEMA = (
    "resourceLogs array<struct<"
    "  resource: struct<attributes: array<struct<key: string, value: struct<stringValue: string>>>>,"
    "  instrumentationLibraryLogs: array<struct<"
    "    instrumentationLibrary: struct<name: string>,"
    "    logRecords: array<struct<"
    "      timeUnixNano: string,"
    "      body: struct<stringValue: string>,"
    "      attributes: array<struct<key: string,"
    "        value: struct<stringValue: string, intValue: string>>>"
    "    >>"
    "  >>"
    ">>"
)

_LIB_NAME = "otelcol-spark/transcripts"

# Extended schema for nested-attribute mode (SURVEY §1.3: a composite
# AnyValue — arrayValue/kvlistValue, common.pb.go:96-100 — survives as its
# canonical JSON rendering instead of vanishing). The composite members are
# captured as RAW jsonpb text (from_json's StringType raw-capture) and
# transcoded by an Arrow-batched kernel; the flat members stay JVM-side.
_OTLP_SCHEMA_NESTED = (
    "resourceLogs array<struct<"
    "  resource: struct<attributes: array<struct<key: string, value: struct<stringValue: string>>>>,"
    "  instrumentationLibraryLogs: array<struct<"
    "    instrumentationLibrary: struct<name: string>,"
    "    logRecords: array<struct<"
    "      timeUnixNano: string,"
    "      body: struct<stringValue: string, arrayValue: string, kvlistValue: string>,"
    "      attributes: array<struct<key: string,"
    "        value: struct<stringValue: string, intValue: string,"
    "                      arrayValue: string, kvlistValue: string>>>"
    "    >>"
    "  >>"
    ">>"
)


def _jsonpb_any_to_py(m, depth: int = 0):
    """Typed jsonpb AnyValue dict -> python object, the JSON-wire twin of
    otlp_proto._nested_value (same member semantics, same first-occurrence
    kvlist keys, same 64-level nesting cap; model/otlp/json_unmarshaler.go
    is the reference composition). Junk members degrade to None."""
    if depth > 64:
        raise ValueError("AnyValue nesting exceeds cap")
    if not isinstance(m, dict):
        return None
    if "stringValue" in m:
        v = m["stringValue"]
        return v if isinstance(v, str) else None
    if "boolValue" in m:
        v = m["boolValue"]
        if isinstance(v, bool):
            return v
        return {"true": True, "false": False}.get(v) if isinstance(v, str) else None
    if "intValue" in m:
        try:
            iv = int(m["intValue"])
        except (TypeError, ValueError):
            return None
        return iv if -(1 << 63) <= iv < 1 << 63 else None
    if "doubleValue" in m:
        try:
            return float(m["doubleValue"])
        except (TypeError, ValueError):
            return None
    if "arrayValue" in m:
        vals = (m["arrayValue"] or {}).get("values") or []
        return [_jsonpb_any_to_py(e, depth + 1) for e in vals]
    if "kvlistValue" in m:
        out: dict = {}
        for e in (m["kvlistValue"] or {}).get("values") or []:
            if not isinstance(e, dict):
                continue
            k = e.get("key")
            if isinstance(k, str) and k not in out:
                out[k] = _jsonpb_any_to_py(e.get("value"), depth + 1)
        return out
    return None


def _render_composites_series(s):
    """pandas kernel for the composite transcode: each input element is the
    to_json of {body, attributes} for one LogRecord (raw composite members
    captured as jsonpb text by the nested schema). Returns a struct of the
    CANONICAL JSON renderings (sorted keys at every level, compact
    separators — byte-identical to the proto wire's rendering of the same
    logical value) for a composite body / role / tool, NULL members when
    that slot is flat or junk. The UDF input is a plain to_json expression
    (no higher-order lambdas) so Catalyst's Python-UDF extraction handles
    it in any consumer position — filters included."""
    import json as _j

    import pandas as pd

    def _canon(member: str, raw: str):
        try:
            obj = _jsonpb_any_to_py({member: _j.loads(raw)})
        except (ValueError, TypeError):
            return None
        if not isinstance(obj, (list, dict)):
            return None
        return _j.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)

    def _slot(value) -> str | None:
        if not isinstance(value, dict):
            return None
        if value.get("arrayValue") is not None:
            return _canon("arrayValue", value["arrayValue"])
        if value.get("kvlistValue") is not None:
            return _canon("kvlistValue", value["kvlistValue"])
        return None

    def one(rec_json):
        if rec_json is None or (isinstance(rec_json, float) and rec_json != rec_json):
            return (None, None, None)
        try:
            rec = _j.loads(rec_json)
        except (ValueError, TypeError):
            return (None, None, None)
        out = {"role": None, "tool": None}
        seen: set = set()
        for kv in rec.get("attributes") or []:
            if not isinstance(kv, dict):
                continue
            k = kv.get("key")
            if k in ("role", "tool") and k not in seen:
                seen.add(k)  # first occurrence wins (pdata parity)
                out[k] = _slot(kv.get("value"))
        return (out["role"], out["tool"], _slot(rec.get("body")))

    rows = [one(x) for x in s]
    return pd.DataFrame(rows, columns=["role", "tool", "text"])


def _nanos(ts: Column) -> Column:
    """unix nanos from a timestamp column, overflow-safe: timestamps past
    2262-04-11 (int64 nano limit) degrade to NULL (field omitted on the
    wire) instead of an ANSI ArithmeticException killing the job — one
    backdated/garbage far-future row in a 10^12-row corpus must never
    abort the marshal. The cast handles TIMESTAMP_NTZ inputs; the session
    is pinned UTC so NTZ -> instant is the identity."""
    return F.try_multiply(F.unix_micros(ts.cast("timestamp")), F.lit(1000))


def kv_first_occurrence(entries: Column) -> Column:
    """First-occurrence, null-key-safe dedup of a KeyValue list.

    A malformed envelope can carry NULL or DUPLICATE attribute keys:
    map_from_entries would throw (default dedup policy EXCEPTION) and kill
    the whole scan. Keep the FIRST occurrence — pdata AttributeMap.Get
    returns the first match (model/pdata/common.go) — and drop null-key
    entries, so junk degrades per-record. eqNullSafe: a null-key entry in
    the prefix must read "not a duplicate" (False), not poison the
    exists() to NULL and drop every later entry. Shared by the logs,
    traces, and metrics envelope parsers so the junk policy is
    single-sourced."""
    return F.filter(
        entries,
        lambda kv, i: kv["key"].isNotNull()
        & ~F.exists(
            F.slice(entries, F.lit(1), i), lambda prev: prev["key"].eqNullSafe(kv["key"])
        ),
    )


def _kv_str(key: str, val: Column) -> Column:
    return F.struct(
        F.lit(key).alias("key"),
        F.struct(val.alias("stringValue"), F.lit(None).cast("string").alias("intValue")).alias(
            "value"
        ),
    )


def _kv_int(key: str, val: Column) -> Column:
    return F.struct(
        F.lit(key).alias("key"),
        F.struct(
            F.lit(None).cast("string").alias("stringValue"),
            val.cast("string").alias("intValue"),
        ).alias("value"),
    )


def to_otlp_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Marshal turns to one OTLP-JSON envelope per conversation (one
    ResourceLogs per conv_id — the grouping the OTLP receiver hands to
    ``nextConsumer``, receiver/otlpreceiver/internal/logs/otlp.go:60-69).

    The groupBy is a single shuffle on conv_id; array_sort keeps logRecords
    in stable turn order inside each envelope so marshal is deterministic.
    """
    # _ord leads the struct so array_sort orders records by turn_idx (the
    # stable (conv_id, turn_idx) ordering invariant); dropped after the sort.
    rec = F.struct(
        F.col("turn_idx").alias("_ord"),
        _nanos(F.col("ts")).cast("string").alias("timeUnixNano"),
        F.struct(F.col("text").alias("stringValue")).alias("body"),
        # omit-empty: null tool contributes no attribute entry (jsonpb parity)
        F.filter(
            F.array(
                _kv_str("role", F.col("role")),
                _kv_str("tool", F.col("tool")),
                _kv_int("turn.idx", F.col("turn_idx")),
            ),
            lambda kv: kv["value"]["stringValue"].isNotNull()
            | kv["value"]["intValue"].isNotNull(),
        ).alias("attributes"),
    )
    per_conv = df.groupBy("conv_id").agg(F.array_sort(F.collect_list(rec)).alias("recs"))
    envelope = F.struct(
        F.array(
            F.struct(
                F.struct(F.array(_kv_str("conv.id", F.col("conv_id"))).alias("attributes")).alias(
                    "resource"
                ),
                F.array(
                    F.struct(
                        F.struct(F.lit(_LIB_NAME).alias("name")).alias("instrumentationLibrary"),
                        F.transform(F.col("recs"), lambda r: r.dropFields("_ord")).alias(
                            "logRecords"
                        ),
                    )
                ).alias("instrumentationLibraryLogs"),
            )
        ).alias("resourceLogs")
    )
    return per_conv.select(F.to_json(envelope).alias(out_col))


def parse_otlp_json(df: DataFrame, col: str = "value", nested: bool = False) -> DataFrame:
    """Unmarshal OTLP-JSON envelopes back to flat turn rows: the 3-level
    explode (resourceLogs -> instrumentationLibraryLogs -> logRecords) that
    undoes the pdata nesting (model/pdata/logs.go:43-97), then attribute
    list -> typed columns. All JVM-side: from_json + explode + map_from_entries.

    ``nested=True`` additionally honors the SURVEY §1.3 composite-AnyValue
    contract on this wire: an arrayValue/kvlistValue body or role/tool
    attribute survives as its canonical JSON rendering (byte-identical to
    what the proto decoder produces for the same logical value) instead of
    reading as NULL. The composite transcode is an Arrow-batched kernel
    applied to columns that are NULL except where a producer actually
    shipped a composite; the default (flat) path stays pure JVM — opt in
    only on feeds whose producers emit nested attributes."""
    def _attr_map(entries, value_fn):
        # first-occurrence + null-key-drop junk policy, single-sourced in
        # kv_first_occurrence (shared with the traces/metrics parsers)
        return F.map_from_entries(F.transform(kv_first_occurrence(entries), value_fn))

    schema = _OTLP_SCHEMA_NESTED if nested else _OTLP_SCHEMA
    parsed = df.select(F.from_json(F.col(col), schema).alias("env"))
    rl = parsed.select(F.explode("env.resourceLogs").alias("rl"))
    ill = rl.select(
        _attr_map(
            F.col("rl.resource.attributes"),
            lambda kv: F.struct(kv["key"], kv["value"]["stringValue"]),
        ).alias("res_attrs"),
        F.explode("rl.instrumentationLibraryLogs").alias("ill"),
    )
    recs = ill.select("res_attrs", F.explode("ill.logRecords").alias("r"))
    attrs = _attr_map(
        F.col("r.attributes"),
        lambda kv: F.struct(kv["key"], F.coalesce(kv["value"]["stringValue"], kv["value"]["intValue"])),
    )
    # try_cast: jsonpb int64 strings are producer-controlled — junk refuses
    # the field, never the job
    flat = recs.select(
        F.col("res_attrs")["conv.id"].alias("conv_id"),
        attrs["turn.idx"].try_cast("int").alias("turn_idx"),
        attrs["role"].alias("role"),
        F.col("r.body.stringValue").alias("text"),
        attrs["tool"].alias("tool"),
        F.timestamp_micros(F.expr("TRY_CAST(r.timeUnixNano AS BIGINT) div 1000")).alias("ts"),
        *(
            [
                F.to_json(
                    F.struct(F.col("r.body").alias("body"), F.col("r.attributes").alias("attributes"))
                ).alias("_rec_json")
            ]
            if nested
            else []
        ),
    )
    if not nested:
        return flat
    # ONE Arrow-batched transcode over a PLAIN to_json input: a pandas UDF
    # whose argument contains higher-order lambdas (transform/filter) is
    # not extractable by Catalyst once projections collapse (INTERNAL_ERROR
    # "Cannot evaluate expression: PythonUDF" — hit in r4), so the kernel
    # re-parses the record JSON itself instead of receiving HOF-built maps
    from pyspark.sql.functions import pandas_udf

    render = pandas_udf(_render_composites_series, "role string, tool string, text string")
    rendered = flat.withColumn("_n", render(F.col("_rec_json")))
    return rendered.select(
        "conv_id",
        "turn_idx",
        F.coalesce(F.col("role"), F.col("_n.role")).alias("role"),
        F.coalesce(F.col("text"), F.col("_n.text")).alias("text"),
        F.coalesce(F.col("tool"), F.col("_n.tool")).alias("tool"),
        "ts",
    )


# Per-encoding dispatch (receiver/kafkareceiver/unmarshaler.go registries).
# Like the Go registry, the encoding decides the output model: the transcript
# encodings yield the turn frame, the trace encodings (jaeger_json /
# zipkin_json, receiver/kafkareceiver/unmarshaler.go:defaultTracesUnmarshalers)
# yield the flattened span frame (sources/zipkin.py SPAN_FRAME_COLS).
def _parse_zipkin(df: DataFrame, col: str = "value") -> DataFrame:
    from opentelemetry_collector_spark.sources.zipkin import parse_zipkin_json

    return parse_zipkin_json(df, col)


def _parse_jaeger(df: DataFrame, col: str = "value") -> DataFrame:
    from opentelemetry_collector_spark.sources.jaeger import parse_jaeger_json

    return parse_jaeger_json(df, col)


def _parse_oc(df: DataFrame, col: str = "value") -> DataFrame:
    from opentelemetry_collector_spark.sources.opencensus import parse_oc_json

    return parse_oc_json(df, col)


def _parse_oc_metrics(df: DataFrame, col: str = "value") -> DataFrame:
    from opentelemetry_collector_spark.sources.opencensus import parse_oc_metrics_json

    return parse_oc_metrics_json(df, col)


def _parse_otlp_proto(df: DataFrame, col: str = "value") -> DataFrame:
    from opentelemetry_collector_spark.sources.otlp_proto import parse_otlp_proto

    return parse_otlp_proto(df, col)


def _parse_jaeger_proto(df: DataFrame, col: str = "value") -> DataFrame:
    from opentelemetry_collector_spark.sources.jaeger_proto import parse_jaeger_proto

    return parse_jaeger_proto(df, col)


def _parse_zipkin_proto(df: DataFrame, col: str = "value") -> DataFrame:
    from opentelemetry_collector_spark.sources.zipkin_proto import parse_zipkin_proto

    return parse_zipkin_proto(df, col)


def _parse_zipkin_thrift(df: DataFrame, col: str = "value") -> DataFrame:
    from opentelemetry_collector_spark.sources.zipkin_thrift import parse_zipkin_thrift

    return parse_zipkin_thrift(df, col)


def _parse_otlp_traces_proto(df: DataFrame, col: str = "value") -> DataFrame:
    from opentelemetry_collector_spark.sources.otlp_trace_proto import parse_otlp_traces_proto

    return parse_otlp_traces_proto(df, col)


def _parse_otlp_metrics_proto(df: DataFrame, col: str = "value") -> DataFrame:
    from opentelemetry_collector_spark.sources.otlp_metric_proto import parse_otlp_metrics_proto

    return parse_otlp_metrics_proto(df, col)


UNMARSHALERS: dict[str, Callable[[DataFrame, str], DataFrame]] = {
    # the reference's DEFAULT Kafka encoding (factory.go:32,
    # unmarshaler.go:52-82) — binary OTLP protobuf
    "otlp_proto": _parse_otlp_proto,
    "turn_json": parse_turn_json,
    "kv_text": parse_kv_text,
    "otlp_json": parse_otlp_json,
    # variant entry (the Go registries are per-variant too): same envelope,
    # composite AnyValue attrs/bodies preserved as canonical JSON instead
    # of refused — costs one Arrow exchange (BENCH/NESTED_ATTRS.md)
    "otlp_json_nested": lambda df, col="value": parse_otlp_json(df, col, nested=True),
    "zipkin_json": _parse_zipkin,
    "jaeger_json": _parse_jaeger,
    # binary trace wires (unmarshaler.go:53-58): jaeger_proto is one
    # jaeger model Span per message; zipkin_proto is a proto3 ListOfSpans
    "jaeger_proto": _parse_jaeger_proto,
    "zipkin_proto": _parse_zipkin_proto,
    "zipkin_thrift": _parse_zipkin_thrift,
    # the Go registries are PER-SIGNAL, so "otlp_proto" appears in all
    # three (unmarshaler.go:52-82) with the pipeline type disambiguating;
    # this single dispatch table suffixes the signal instead
    "otlp_proto_traces": _parse_otlp_traces_proto,
    "otlp_proto_metrics": _parse_otlp_metrics_proto,
    # the OC receiver's two signals (the Kafka registry itself has no OC
    # encoding in the reference; these serve the jsonl/file receiver path)
    "oc_json": _parse_oc,
    "oc_metrics_json": _parse_oc_metrics,
}


def unmarshal(df: DataFrame, encoding: str, col: str = "value") -> DataFrame:
    if encoding not in UNMARSHALERS:
        raise ValueError(f"unknown encoding {encoding!r} (have {sorted(UNMARSHALERS)})")
    return UNMARSHALERS[encoding](df, col)


def to_prometheus_text(
    df: DataFrame,
    metric_name: str,
    value_col: str,
    label_cols: list[str],
    metric_type: str = "gauge",
    help_text: str | None = None,
) -> tuple[str, DataFrame]:
    """Prometheus exposition text (the prometheusexporter wire format,
    ``exporter/prometheusexporter/prometheus.go`` serving the accumulator's
    snapshot): one ``name{labels} value`` line per series, plus the
    # HELP / # TYPE header. Returns (header, lines_df) — the lines stay a
    distributed DataFrame (a real scrape endpoint would stream them);
    label values are escaped per the exposition format (backslash, quote,
    newline).
    """
    def _escaped(c: str) -> Column:
        v = F.coalesce(F.col(c).cast("string"), F.lit(""))
        v = F.regexp_replace(v, r"\\", r"\\\\")
        v = F.regexp_replace(v, '"', '\\\\"')
        return F.regexp_replace(v, "\n", r"\\n")

    pairs = [F.concat(F.lit(f'{name}="'), _escaped(name), F.lit('"')) for name in label_cols]
    labels = F.concat(F.lit("{"), F.concat_ws(",", *pairs), F.lit("}")) if pairs else F.lit("")
    line = F.concat(
        F.lit(metric_name), labels, F.lit(" "), F.col(value_col).cast("double").cast("string")
    )
    header = (
        f"# HELP {metric_name} {help_text or metric_name}\n# TYPE {metric_name} {metric_type}"
    )
    return header, df.select(line.alias("line"))


def parse_prometheus_text(df: DataFrame, col: str = "line") -> DataFrame:
    """Prometheus exposition-text parser — the scrape side of the
    prometheusreceiver analog (the reference embeds the Prom scrape manager
    and its textparse loop, ``receiver/prometheusreceiver/internal/
    metricsbuilder.go``; here the scraped payload is a DataFrame of lines).

    Emits one row per sample: ``(metric, labels map<string,string>, value
    double, ts_ms nullable bigint, metric_type, kind)``. ``# TYPE``
    metadata lines are joined (broadcast — metadata is tiny) onto their
    samples; metrics without one default to ``untyped``, which the
    reference's metric builder treats as a gauge, as does ``kind`` here
    (counter -> cumulative monotonic sum, everything else -> gauge).
    Label values are unescaped per the exposition format (backslash,
    quote, ``\\n``) — the exact inverse of :func:`to_prometheus_text`.
    All parsing is JVM regexp over columns; no Python in the loop.
    """
    line = F.trim(F.col(col))
    meta = (
        df.select(line.alias("_l"))
        .filter(F.col("_l").rlike(r"^# TYPE\s"))
        .select(
            F.regexp_extract("_l", r"^# TYPE\s+(\S+)\s+(\S+)", 1).alias("metric"),
            F.regexp_extract("_l", r"^# TYPE\s+(\S+)\s+(\S+)", 2).alias("metric_type"),
        )
        .distinct()
    )
    samples = df.select(line.alias("_l")).filter(
        (F.length("_l") > 0) & ~F.col("_l").startswith("#")
    )
    name = F.regexp_extract("_l", r"^([a-zA-Z_:][a-zA-Z0-9_:]*)", 1)
    blob = F.regexp_extract("_l", r"^[a-zA-Z_:][a-zA-Z0-9_:]*\{(.*)\}", 1)
    # value/timestamp = everything after the name (and the greedy {...}
    # label blob, so quoted label values may contain spaces and braces)
    rest = F.split(F.trim(F.regexp_replace("_l", r"^[a-zA-Z_:][a-zA-Z0-9_:]*(\{.*\})?", "")), r"\s+")
    pair_pat = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"'

    def _unescaped(v):
        # left-to-right escape processing via a sentinel for literal
        # backslashes (plain replace-chains would corrupt "\\n")
        v = F.regexp_replace(v, r"\\\\", "\x01")
        v = F.regexp_replace(v, r"\\n", "\n")
        v = F.regexp_replace(v, r'\\"', '"')
        return F.regexp_replace(v, "\x01", r"\\")

    parsed = samples.select(
        name.alias("metric"),
        F.map_from_arrays(
            F.regexp_extract_all(blob, F.lit(pair_pat), 1),
            F.transform(F.regexp_extract_all(blob, F.lit(pair_pat), 2), _unescaped),
        ).alias("labels"),
        # try_cast: textparse rejects a malformed SAMPLE, never the scrape —
        # a junk value/timestamp token becomes a NULL field on that row
        # (an ANSI cast would abort the whole job); +Inf/-Inf/NaN parse fine
        F.try_element_at(rest, F.lit(1)).try_cast("double").alias("value"),
        F.try_element_at(rest, F.lit(2)).try_cast("bigint").alias("ts_ms"),
    )
    out = parsed.join(F.broadcast(meta), "metric", "left").withColumn(
        "metric_type", F.coalesce(F.col("metric_type"), F.lit("untyped"))
    )
    return out.withColumn(
        "kind",
        F.when(F.col("metric_type") == "counter", F.lit("sum_cumulative_monotonic")).otherwise(
            F.lit("gauge")
        ),
    )


def to_prometheus_histogram_text(
    df: DataFrame,
    metric_name: str,
    value_col: str,
    label_cols: list[str],
    bounds: list[float],
    help_text: str | None = None,
) -> tuple[str, DataFrame]:
    """Histogram family in exposition text: per label set, cumulative
    ``name_bucket{...,le="b"}`` lines for each explicit bound plus
    ``le="+Inf"``, and the ``name_sum`` / ``name_count`` series — the
    shape the prometheusexporter serves for pdata Histogram points and
    the prometheusreceiver's metric builder reassembles. One grouped
    aggregate computes every bucket (map-side partial); the per-labelset
    line fan-out is an explode of an already-tiny frame.
    """
    # refuse junk observations per-row: a NULL value would land in _count
    # and +Inf but in no finite bucket (internally inconsistent histogram),
    # and one NaN would poison _sum for the whole labelset
    df = df.filter(F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col).cast("double")))
    aggs = [
        F.sum((F.col(value_col) <= F.lit(b)).cast("bigint")).alias(f"_le_{i}")
        for i, b in enumerate(bounds)
    ]
    g = df.groupBy(*label_cols).agg(
        *aggs,
        F.count(F.lit(1)).cast("bigint").alias("_cnt"),
        F.sum(F.col(value_col).cast("double")).alias("_sum"),
    )

    def _esc(c: str) -> Column:
        v = F.coalesce(F.col(c).cast("string"), F.lit(""))
        v = F.regexp_replace(v, r"\\", r"\\\\")
        v = F.regexp_replace(v, '"', '\\\\"')
        return F.regexp_replace(v, "\n", r"\\n")

    base_pairs = [F.concat(F.lit(f'{name}="'), _esc(name), F.lit('"')) for name in label_cols]

    def _line(suffix: str, extra: Column | None, value: Column) -> Column:
        pairs = base_pairs + ([extra] if extra is not None else [])
        labels = (
            F.concat(F.lit("{"), F.concat_ws(",", *pairs), F.lit("}")) if pairs else F.lit("")
        )
        return F.concat(F.lit(metric_name + suffix), labels, F.lit(" "), value.cast("string"))

    lines = [
        _line("_bucket", F.lit(f'le="{b}"'), F.col(f"_le_{i}").cast("double"))
        for i, b in enumerate(bounds)
    ]
    lines.append(_line("_bucket", F.lit('le="+Inf"'), F.col("_cnt").cast("double")))
    lines.append(_line("_sum", None, F.col("_sum")))
    lines.append(_line("_count", None, F.col("_cnt").cast("double")))
    header = (
        f"# HELP {metric_name} {help_text or metric_name}\n# TYPE {metric_name} histogram"
    )
    return header, g.select(F.explode(F.array(*lines)).alias("line"))


def scraped_histograms(df: DataFrame, col: str = "line") -> DataFrame:
    """Reassemble scraped histogram families — the prometheusreceiver
    metric-builder's job (``receiver/prometheusreceiver/internal/
    metricsbuilder.go`` / ``metricfamily.go``): a ``# TYPE f histogram``
    family owns the ``f_bucket`` / ``f_sum`` / ``f_count`` samples, whose
    shared label set (minus ``le``) identifies one datapoint.

    Returns one row per (family, labelset, bucket): ``(family, labels,
    le double — +Inf as null, cum_count, total_count, sum_value)``.
    The family registry is metadata (tiny) so it broadcast-joins onto the
    sample stream; grouping shuffles on the canonical (family, sorted
    labelset) key once.
    """
    line = F.trim(F.col(col))
    fams = (
        df.select(line.alias("_l"))
        .filter(F.col("_l").rlike(r"^# TYPE\s+\S+\s+histogram\s*$"))
        .select(F.regexp_extract("_l", r"^# TYPE\s+(\S+)", 1).alias("family"))
        .distinct()
    )
    suffixed = fams.select(
        "family",
        F.explode(
            F.array(
                F.struct(F.concat("family", F.lit("_bucket")).alias("metric"), F.lit("bucket").alias("part")),
                F.struct(F.concat("family", F.lit("_sum")).alias("metric"), F.lit("sum").alias("part")),
                F.struct(F.concat("family", F.lit("_count")).alias("metric"), F.lit("count").alias("part")),
            )
        ).alias("_s"),
    ).select("family", "_s.metric", "_s.part")
    samples = parse_prometheus_text(df, col=col).join(F.broadcast(suffixed), "metric")
    le_raw = F.element_at("labels", "le")
    keyed = samples.select(
        "family",
        "part",
        F.map_filter("labels", lambda k, _: k != "le").alias("labels"),
        F.to_json(F.array_sort(F.map_entries(F.map_filter("labels", lambda k, _: k != "le")))).alias("_lk"),
        F.when(le_raw != "+Inf", le_raw.try_cast("double")).alias("le"),
        le_raw.alias("_le_raw"),
        "value",
    ).filter(
        # a bucket whose le fails to parse is REFUSED (metricsbuilder skips
        # the sample) — it must not alias onto the le=NULL (+Inf) encoding
        ~(
            (F.col("part") == "bucket")
            & F.col("_le_raw").isNotNull()
            & (F.col("_le_raw") != "+Inf")
            & F.col("le").isNull()
        )
    ).drop("_le_raw")
    per_set = keyed.groupBy("family", "_lk").agg(
        F.first("labels").alias("labels"),
        # try_cast: a scraped count of 1e300 is junk — refuse the value,
        # never ANSI-overflow the job
        F.max(F.when(F.col("part") == "count", F.col("value"))).try_cast("bigint").alias("total_count"),
        F.max(F.when(F.col("part") == "sum", F.col("value"))).alias("sum_value"),
        F.collect_list(
            F.when(F.col("part") == "bucket", F.struct("le", F.col("value").alias("cum")))
        ).alias("_buckets"),
    )
    return per_set.select(
        "family",
        "labels",
        F.explode("_buckets").alias("_b"),
        "total_count",
        "sum_value",
    ).select(
        "family",
        "labels",
        F.col("_b.le").alias("le"),
        F.col("_b.cum").try_cast("bigint").alias("cum_count"),
        "total_count",
        "sum_value",
    )


def to_otlp_text(df: DataFrame, out_col: str = "line") -> DataFrame:
    """The logging exporter's debug dump (``internal/otlptext/logs.go:25-55``,
    ``databuffer.go:212-218``): one human-readable block per LogRecord.

    Field lines follow logLogRecord exactly — ``Timestamp:`` prints the
    pdata uint64 UNIX nanos (Go %s of pdata.Timestamp), ``ShortName:`` the
    record name, ``Body:`` the text payload, and each attribute renders as
    ``     -> key: STRING(value)`` (attributeValueToString; our attrs map
    is all-string by construction). ``LogRecord #k`` numbers records inside
    their batch — here the deterministic in-conversation index
    (``turn_idx``), since the batch boundary is the conversation. Attribute
    order is key-sorted (the Go map Range order is insertion order of the
    builder; sorting is the deterministic analog, same choice the golden
    tests make via Sort()). Pure JVM projection — this is a debug sink, but
    it must not become a Python tax when enabled on a wide pipeline.
    """
    attrs = F.coalesce(F.col("attrs"), F.create_map().cast("map<string,string>"))
    attr_lines = F.transform(
        F.array_sort(F.map_entries(attrs)),
        lambda e: F.concat(F.lit("     -> "), e["key"], F.lit(": STRING("), e["value"], F.lit(")")),
    )
    # every value coalesces to "" — the Go dump always prints the field
    # LABEL (databuffer.go writes `label: value` unconditionally); a bare
    # concat would propagate NULL and concat_ws would then DROP the whole
    # line, truncating the block for junk rows
    def _field(label: str, val: Column) -> Column:
        return F.concat(F.lit(label), F.coalesce(val.cast("string"), F.lit("")))

    block = F.concat_ws(
        "\n",
        _field("LogRecord #", F.col("turn_idx")),
        _field("Timestamp: ", F.unix_micros(F.col("ts")) * 1000),
        _field("Severity: ", F.col("role")),
        _field("ShortName: ", F.coalesce(F.col("tool"), F.col("role"))),
        _field("Body: ", F.col("text")),
        F.when(
            F.size(attrs) > 0,
            F.concat(F.lit("Attributes:\n"), F.array_join(attr_lines, "\n")),
        ),
    )
    return df.select(F.col("conv_id"), F.col("turn_idx"), block.alias(out_col))


_SPAN_KIND_NAMES = {
    0: "SPAN_KIND_UNSPECIFIED",
    1: "SPAN_KIND_INTERNAL",
    2: "SPAN_KIND_SERVER",
    3: "SPAN_KIND_CLIENT",
    4: "SPAN_KIND_PRODUCER",
    5: "SPAN_KIND_CONSUMER",
}
_STATUS_CODE_NAMES = {0: "STATUS_CODE_UNSET", 1: "STATUS_CODE_OK", 2: "STATUS_CODE_ERROR"}


def _enum_name(code: Column, names: dict[int, str]) -> Column:
    out = F.lit(names[0])
    for v, name in names.items():
        if v:
            out = F.when(code == v, F.lit(name)).otherwise(out)
    return out


def _log_attr(label: str, val: Column) -> Column:
    """databuffer.go:36-38 logAttr: ``    %-15s: %s`` — four spaces, label
    left-padded to 15, NULL value rendered as the empty string (Go prints the
    zero value; a NULL must not eat the whole concat_ws line)."""
    return F.concat(
        F.lit("    " + label.ljust(15) + ": "), F.coalesce(val.cast("string"), F.lit(""))
    )


def to_otlp_text_traces(df: DataFrame, out_col: str = "line") -> DataFrame:
    """The logging exporter's debug dump for TRACES
    (``internal/otlptext/traces.go:29-66``): one human-readable block per
    Span, field lines exactly as databuffer's ``logAttr`` renders them
    (``databuffer.go:36-38``: four-space indent, label padded to 15, colon).

    Input is the flattened span frame (``zipkin.spans_from_transcripts`` /
    any trace codec's parse output). ``Span #k`` numbers spans inside their
    trace — the deterministic in-conversation index carried by the
    ``turn.idx`` attribute when present, else 0 (the Go dump numbers by
    batch position, which shuffle order cannot reproduce). Start/End time
    print the underlying uint64 UNIX nanos rather than Go's
    ``time.Time.String()`` rendering — same deliberate divergence as the
    logs dump (`to_otlp_text`): integer nanos are exact and identical in
    Java, Python and DuckDB, where Go's trailing-zero-suppressed fractional
    seconds are not. Pure JVM projection — zero shuffle, zero Python.
    """
    attrs = F.coalesce(F.col("attrs"), F.create_map().cast("map<string,string>"))
    attr_lines = F.transform(
        F.array_sort(F.map_entries(attrs)),
        lambda e: F.concat(F.lit("     -> "), e["key"], F.lit(": STRING("), e["value"], F.lit(")")),
    )
    start_ns = F.unix_micros(F.col("ts")) * 1000
    end_ns = start_ns + F.coalesce(F.col("duration_us"), F.lit(0)).cast("bigint") * 1000
    block = F.concat_ws(
        "\n",
        F.concat(
            F.lit("Span #"),
            F.coalesce(F.element_at(attrs, "turn.idx"), F.lit("0")),
        ),
        _log_attr("Trace ID", F.col("trace_id")),
        _log_attr("Parent ID", F.col("parent_span_id")),
        _log_attr("ID", F.col("span_id")),
        _log_attr("Name", F.col("name")),
        _log_attr("Kind", _enum_name(F.col("kind"), _SPAN_KIND_NAMES)),
        _log_attr("Start time", start_ns),
        _log_attr("End time", end_ns),
        _log_attr("Status code", _enum_name(F.col("status_code"), _STATUS_CODE_NAMES)),
        _log_attr("Status message", F.col("status_message")),
        F.when(
            F.size(attrs) > 0,
            F.concat(F.lit("Attributes:\n"), F.array_join(attr_lines, "\n")),
        ),
    )
    return df.select(F.col("trace_id"), F.col("span_id"), block.alias(out_col))


def to_otlp_text_metrics(df: DataFrame, out_col: str = "line") -> DataFrame:
    """The logging exporter's debug dump for METRICS
    (``internal/otlptext/metrics.go:30-52`` + ``databuffer.go:71-137``):
    one block per Metric — a ``Descriptor:`` section (Name/Description/
    Unit/DataType, ``logMetricDescriptor``), the Sum-only
    ``IsMonotonic``/``AggregationTemporality`` lines
    (``logMetricDataPoints``), then every datapoint as a
    ``DoubleDataPoints #i`` section with its sorted ``Data point labels``,
    Start/Timestamp as uint64 nanos and ``Value: %f`` (Go fmt ``%f`` ==
    Java/DuckDB ``%f``: six decimals).

    Input is the scalar datapoint frame the metric codecs share
    (metric, labels map, value double, ts, kind in {"gauge",
    "sum_cumulative_monotonic"}). One Metric block per (metric, kind) like
    `to_otlp_metrics_json` — a single partial-aggregated groupBy; the
    ``Metric #k`` index is name-order over the post-aggregation frame
    (one row per distinct metric — the window is over dozens of rows, never
    the datapoints). Datapoints are (ts, labels) sorted: the Go dump prints
    arrival order, which a shuffle cannot reproduce; sorting is the same
    determinism choice the golden tests make via Sort().
    """
    label_key = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(F.coalesce(F.col("labels"), F.create_map()))),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        ",",
    )
    label_lines = F.transform(
        F.array_sort(F.map_entries(F.coalesce(F.col("labels"), F.create_map()))),
        lambda e: F.concat(F.lit("     -> "), e["key"], F.lit(": "), e["value"]),
    )
    point = F.struct(
        (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).alias("ts_ns"),
        label_key.alias("label_key"),
        F.col("value").alias("value"),
        F.when(F.size(F.coalesce(F.col("labels"), F.create_map())) > 0, F.array_join(label_lines, "\n")).alias("label_block"),
    )
    grouped = df.groupBy("metric", "kind").agg(
        F.array_sort(F.collect_list(point)).alias("points")
    )
    is_sum = F.col("kind") == "sum_cumulative_monotonic"
    descriptor = F.concat_ws(
        "\n",
        F.lit("Descriptor:"),
        F.concat(F.lit("     -> Name: "), F.col("metric")),
        F.lit("     -> Description: "),
        F.lit("     -> Unit: "),
        F.concat(
            F.lit("     -> DataType: "),
            F.when(is_sum, F.lit("DoubleSum")).otherwise(F.lit("DoubleGauge")),
        ),
        F.when(is_sum, F.lit("     -> IsMonotonic: true")),
        F.when(is_sum, F.lit("     -> AggregationTemporality: AGGREGATION_TEMPORALITY_CUMULATIVE")),
    )
    # zip the sorted points with their index: transform exposes (elem, i)
    point_blocks = F.array_join(
        F.transform(
            F.col("points"),
            lambda p, i: F.concat_ws(
                "\n",
                F.concat(F.lit("DoubleDataPoints #"), i.cast("string")),
                F.when(
                    p["label_block"].isNotNull(),
                    F.concat(F.lit("Data point labels:\n"), p["label_block"]),
                ),
                F.lit("StartTimestamp: 0"),
                F.concat(
                    F.lit("Timestamp: "), F.coalesce(p["ts_ns"].cast("string"), F.lit(""))
                ),
                F.concat(
                    F.lit("Value: "),
                    F.coalesce(F.format_string("%f", p["value"]), F.lit("")),
                ),
            ),
        ),
        "\n",
    )
    metric_idx = F.row_number().over(Window.orderBy("metric", "kind")) - 1
    block = F.concat_ws(
        "\n",
        F.concat(F.lit("Metric #"), metric_idx.cast("string")),
        descriptor,
        point_blocks,
    )
    return grouped.select(F.col("metric"), F.col("kind"), block.alias(out_col))
