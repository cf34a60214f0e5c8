"""OTLP-JSON traces envelope codec: the 3-level resourceSpans nesting.

Completes the OTLP-JSON codec family next to the logs envelope
(codecs.to_otlp_json / parse_otlp_json): the reference marshals all three
signals through one jsonpb marshaler (model/otlp/json_marshaler.go:26-60,
`jsonpb.Marshaler{}` defaults), so the traces wire shape follows the same
rules the logs envelope already pins, plus the trace-specific ones:

- camelCase field names, zero scalars omitted (EmitDefaults=false),
  int64/fixed64 rendered as STRINGS (startTimeUnixNano/endTimeUnixNano,
  attribute intValue);
- enums rendered as their NAMES (EnumsAsInts=false): kind =
  "SPAN_KIND_CLIENT"..., omitted entirely when UNSPECIFIED (zero value,
  trace.pb.go:353);
- traceId/spanId/parentSpanId are custom-typed bytes with hex
  MarshalJSON and NO omitempty (trace.pb.go:319-335,
  model/internal/data/traceid.go:93-99): always on the wire, the empty id
  rendering as "" — a root span carries "parentSpanId":"";
- Status is a NON-nullable embedded message (trace.pb.go:394
  `json:"status"`): always on the wire, "status":{} when unset. Setting
  an error code also sets the deprecated compat code, so an error status
  marshals all three fields in field-number order
  (model/pdata/traces.go:143-153): deprecatedCode, message, code.

Spark's ``to_json`` gives the omit-empty semantics for free (null fields
are dropped; an all-null struct still renders as ``{}``), so the whole
marshal is one JVM projection + two keyed aggregations — no Python.

Envelope grouping: OTLP hangs spans under a Resource, and in the
transcripts-as-traces frame (zipkin.spans_from_transcripts) the resource
identity is the per-span service (role) — so the envelope is one JSON per
trace with one resourceSpans entry per service, mirroring how the zipkin
and jaeger translators regroup flat spans by local service on unmarshal
(translator/trace/zipkinv2/to_translator.go, jaeger). Both groupBys hash
on trace_id(, service): two exchanges, partial-aggregated, and the span
arrays are array_sort'ed so marshal is deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from opentelemetry_collector_spark.sources.codecs import _LIB_NAME, _nanos, kv_first_occurrence

__all__ = ["to_otlp_traces_json", "parse_otlp_traces_json"]

# OTLP SpanKind enum (trace.pb.go:36-60) <-> the int kinds of the span frame
_KIND_NAMES = {
    1: "SPAN_KIND_INTERNAL",
    2: "SPAN_KIND_SERVER",
    3: "SPAN_KIND_CLIENT",
    4: "SPAN_KIND_PRODUCER",
    5: "SPAN_KIND_CONSUMER",
}
_STATUS_CODE_NAMES = {1: "STATUS_CODE_OK", 2: "STATUS_CODE_ERROR"}
# pdata SetCode keeps the deprecated compat field in lockstep
# (model/pdata/traces.go:148-153); UNSET/OK share DEPRECATED_..._OK, which
# is the zero value and therefore omitted — only the error shim is visible.
_DEPRECATED_ERROR = "DEPRECATED_STATUS_CODE_UNKNOWN_ERROR"


def _enum_name(col: Column, names: dict[int, str]) -> Column:
    """int -> enum NAME, null for the zero value (jsonpb omits it)."""
    expr = F.lit(None).cast("string")
    for value, name in names.items():
        expr = F.when(col == value, F.lit(name)).otherwise(expr)
    return expr


def _enum_value(col: Column, names: dict[int, str]) -> Column:
    """enum NAME -> int, 0 for null/unknown names (junk degrades per-row)."""
    expr = F.lit(0)
    for value, name in names.items():
        expr = F.when(col == name, F.lit(value)).otherwise(expr)
    return expr


def to_otlp_traces_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Marshal the flat span frame to one OTLP-JSON envelope per trace.

    Input is the spans_from_transcripts shape: trace_id, span_id,
    parent_span_id (null for root), name, kind int, status_code int,
    status_message, service_name, ts, duration_us, attrs map<str,str>.
    """
    nanos = _nanos(F.col("ts"))
    # try_*: junk durations / far-future spans degrade to an omitted field
    # per-row, never an ANSI overflow aborting the marshal
    end_nanos = F.try_add(nanos, F.try_multiply(F.col("duration_us"), F.lit(1000)))
    is_err = F.col("status_code") == 2
    # typed attribute list from the string map: turn.idx is an INT attr
    # (jaeger/oc translators carry it typed), everything else a string;
    # intValue is a jsonpb int64 -> STRING on the wire
    attr_list = F.transform(
        F.map_entries(F.col("attrs")),
        lambda kv: F.struct(
            kv["key"].alias("key"),
            F.struct(
                F.when(kv["key"] != "turn.idx", kv["value"]).alias("stringValue"),
                F.when(kv["key"] == "turn.idx", kv["value"]).alias("intValue"),
            ).alias("value"),
        ),
    )
    span = F.struct(
        # _ord leads so array_sort orders spans by start time then id
        F.struct(nanos.alias("n"), F.col("span_id").alias("s")).alias("_ord"),
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
        # no omitempty on ids: the empty parent renders as "" (root span)
        F.coalesce(F.col("parent_span_id"), F.lit("")).alias("parentSpanId"),
        F.col("name").alias("name"),
        _enum_name(F.col("kind"), _KIND_NAMES).alias("kind"),
        # fixed64 -> string; like the logs envelope, epoch-0 ships as "0"
        # (a deliberate deviation from jsonpb's zero-omission so NULL ts
        # [omitted -> NULL] and epoch-0 ts ["0" -> 0] stay distinguishable
        # on roundtrip; jsonpb's unmarshaler accepts the explicit "0")
        nanos.cast("string").alias("startTimeUnixNano"),
        end_nanos.cast("string").alias("endTimeUnixNano"),
        F.when(F.size(attr_list) > 0, attr_list).alias("attributes"),
        F.struct(
            F.when(is_err, F.lit(_DEPRECATED_ERROR)).alias("deprecatedCode"),
            F.when(is_err & (F.col("status_message") != ""), F.col("status_message")).alias(
                "message"
            ),
            _enum_name(F.col("status_code"), _STATUS_CODE_NAMES).alias("code"),
        ).alias("status"),
    )
    per_service = df.groupBy("trace_id", "service_name").agg(
        F.array_sort(F.collect_list(span)).alias("spans")
    )
    rs = F.struct(
        F.col("service_name").alias("_ord"),
        F.struct(
            F.array(
                F.struct(
                    F.lit("service.name").alias("key"),
                    F.struct(F.col("service_name").alias("stringValue")).alias("value"),
                )
            ).alias("attributes")
        ).alias("resource"),
        F.array(
            F.struct(
                F.struct(F.lit(_LIB_NAME).alias("name")).alias("instrumentationLibrary"),
                F.transform(F.col("spans"), lambda sp: sp.dropFields("_ord")).alias("spans"),
            )
        ).alias("instrumentationLibrarySpans"),
    )
    per_trace = per_service.groupBy("trace_id").agg(
        F.array_sort(F.collect_list(rs)).alias("rss")
    )
    envelope = F.struct(
        F.transform(F.col("rss"), lambda r: r.dropFields("_ord")).alias("resourceSpans")
    )
    return per_trace.select(F.to_json(envelope).alias(out_col))


_KV_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField(
            "value",
            StructType(
                [
                    StructField("stringValue", StringType()),
                    StructField("intValue", StringType()),
                ]
            ),
        ),
    ]
)

_SPAN_SCHEMA = StructType(
    [
        StructField("traceId", StringType()),
        StructField("spanId", StringType()),
        StructField("parentSpanId", StringType()),
        StructField("name", StringType()),
        StructField("kind", StringType()),
        StructField("startTimeUnixNano", StringType()),
        StructField("endTimeUnixNano", StringType()),
        StructField("attributes", ArrayType(_KV_SCHEMA)),
        StructField(
            "status",
            StructType(
                [
                    StructField("deprecatedCode", StringType()),
                    StructField("message", StringType()),
                    StructField("code", StringType()),
                ]
            ),
        ),
    ]
)

_TRACES_SCHEMA = StructType(
    [
        StructField(
            "resourceSpans",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "resource",
                            StructType([StructField("attributes", ArrayType(_KV_SCHEMA))]),
                        ),
                        StructField(
                            "instrumentationLibrarySpans",
                            ArrayType(
                                StructType(
                                    [
                                        StructField(
                                            "instrumentationLibrary",
                                            StructType([StructField("name", StringType())]),
                                        ),
                                        StructField("spans", ArrayType(_SPAN_SCHEMA)),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _first_attr(entries: Column, key: str) -> Column:
    """First occurrence of ``key`` in a KeyValue list (pdata AttributeMap.Get
    returns the first match, model/pdata/common.go) — null-safe on junk
    envelopes with null entries or null keys."""
    hits = F.filter(entries, lambda kv: kv["key"].eqNullSafe(key))
    # F.get (0-based) is NULL on an empty list; element_at(hits, 1) throws
    # INVALID_ARRAY_INDEX under ANSI when the key is absent, killing the
    # scan on one junk envelope
    return F.get(hits, 0)["value"]


def parse_otlp_traces_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal OTLP-JSON trace envelopes back to the flat span frame: the
    3-level explode (resourceSpans -> instrumentationLibrarySpans -> spans)
    undoing the pdata nesting (model/pdata/traces.go), resource
    service.name re-attached per span. All JVM-side: from_json + explode +
    higher-order array ops; junk degrades per-row (unparseable envelopes,
    non-numeric nano strings, and unknown enum names become NULL/0 on that
    row, never a job failure).
    """
    parsed = df.select(F.from_json(F.col(col), _TRACES_SCHEMA).alias("env"))
    rs = parsed.select(F.explode("env.resourceSpans").alias("rs"))
    ills = rs.select(
        _first_attr(F.col("rs.resource.attributes"), "service.name")["stringValue"].alias(
            "service_name"
        ),
        F.explode("rs.instrumentationLibrarySpans").alias("ill"),
    )
    sp = ills.select("service_name", F.explode("ill.spans").alias("s"))
    # decimal, not bigint: int64 nanos (~1.7e18) exceed double's 53-bit
    # mantissa, so a bigint/1000 division (double) can land one microsecond
    # off; decimal division is exact
    start = F.col("s.startTimeUnixNano").try_cast("decimal(20,0)")
    end = F.col("s.endTimeUnixNano").try_cast("decimal(20,0)")
    # first-occurrence, null-key-safe attr map (codecs.kv_first_occurrence,
    # shared junk policy); intValue and stringValue both land as strings
    entries = kv_first_occurrence(
        F.coalesce(F.col("s.attributes"), F.array().cast(ArrayType(_KV_SCHEMA)))
    )
    attrs = F.map_from_entries(
        F.transform(
            entries,
            lambda kv: F.struct(
                kv["key"],
                F.coalesce(kv["value"]["stringValue"], kv["value"]["intValue"]),
            ),
        )
    )
    return sp.select(
        F.col("s.traceId").alias("trace_id"),
        F.col("s.spanId").alias("span_id"),
        F.nullif(F.col("s.parentSpanId"), F.lit("")).alias("parent_span_id"),
        F.col("s.name").alias("name"),
        _enum_value(F.col("s.kind"), _KIND_NAMES).alias("kind"),
        _enum_value(F.col("s.status.code"), _STATUS_CODE_NAMES).alias("status_code"),
        F.coalesce(F.col("s.status.message"), F.lit("")).alias("status_message"),
        F.col("service_name"),
        F.timestamp_micros(F.floor(start / 1000).cast("bigint")).alias("ts"),
        F.floor((end - start) / 1000).cast("bigint").alias("duration_us"),
        attrs.alias("attrs"),
    )
