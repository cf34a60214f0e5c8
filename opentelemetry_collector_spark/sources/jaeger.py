"""Jaeger JSON span codec (the second trace-translator class of the reference).

The reference ships paired Jaeger translators — jaeger -> pdata
(``translator/trace/jaeger/jaegerproto_to_traces.go``) and pdata -> jaeger
(``traces_to_jaegerproto.go``) — used by the Jaeger receiver/exporter and the
Kafka ``jaeger_json`` unmarshaler (``receiver/kafkareceiver/unmarshaler.go``).
This module re-expresses the codec over the flattened span frame
(``sources/zipkin.py SPAN_FRAME_COLS`` — same frame, different wire), with
JVM-side ``to_json``/``from_json`` + higher-order array functions only.

Wire shape: the Jaeger UI/API JSON span (micros timestamps, typed tag LIST —
not a map like Zipkin): ``{traceID, spanID, operationName, references:
[{refType, traceID, spanID}], startTime, duration, tags: [{key, type,
value}], process: {serviceName}}``. Tag values travel as strings with a
``type`` discriminator (string/bool/int64/float64/binary), the encoding
Jaeger's own ES storage uses.

Reference semantics reproduced exactly (file:line cites):

- **kind tag** (``jaegerproto_to_traces.go:185-189, 294-309``): kind comes
  from a lowercase ``span.kind`` TAG (OpenTracing style — zipkin's is a
  first-class field), consumed; unknown strings -> UNSPECIFIED. Marshal
  (``traces_to_jaegerproto.go:360-380``) writes the tag only for
  non-UNSPECIFIED kinds.
- **status** (``jaegerproto_to_traces.go:220-263``): an ``error`` tag set to
  true forces ERROR and is consumed — but a FALSE ``error`` tag is kept as a
  plain attribute (the Delete sits inside the BoolVal() branch). A
  ``status.code`` tag (int or numeric string, ``getStatusCodeValFromAttr``)
  then overrides the code; ``status.message`` is read+consumed only when the
  code tag exists. With no code tag, ``http.status_code`` maps through
  ``StatusCodeFromHTTP`` (100..398 -> UNSET else ERROR,
  ``protospan_translation.go:141-146``) WITHOUT consuming the http tags.
- **marshal tag order** (``traces_to_jaegerproto.go:195-252``): attributes,
  then ``span.kind``, ``status.code`` (always, int64), ``error`` (only when
  ERROR), ``status.message`` (only non-empty).
- **parent** (``jaegerproto_to_traces.go:175-178, 337-359``): the first
  CHILD_OF reference is the parent span id; zero id -> no parent.
- **service name** (``jaegerproto_to_traces.go:98-113``): process.serviceName
  upserted as the resource service name; empty or the
  ``OTLPResourceNoServiceName`` sentinel contributes nothing (frame keeps the
  sentinel so the round trip is total).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.zipkin import (
    EVENTS_SCHEMA,
    LINKS_SCHEMA,
    RESOURCE_NO_SERVICE_NAME,
    SPAN_KIND_UNSPECIFIED,
)

# OpenTracing span.kind tag values <-> pdata kind ints
# (jaegerproto_to_traces.go:294-309 — note "internal" IS recognized here,
# unlike zipkin's kind field which has no internal variant).
JAEGER_KIND = {"client": 3, "server": 2, "producer": 4, "consumer": 5, "internal": 1}
KIND_TO_JAEGER = {v: k for k, v in JAEGER_KIND.items()}

_JAEGER_SCHEMA = (
    "traceID string, spanID string, operationName string,"
    " references array<struct<refType: string, traceID: string, spanID: string>>,"
    " startTime bigint, duration bigint,"
    " tags array<struct<key: string, type: string, value: string>>,"
    " process struct<serviceName: string>"
)

# with_events=True adds the span-log member (Jaeger logs ARE span events:
# jaegerproto_to_traces.go:197,310-334 / traces_to_jaegerproto.go:191,333-357)
_JAEGER_SCHEMA_EVENTS = (
    _JAEGER_SCHEMA
    + ", logs array<struct<timestamp: bigint,"
    " fields: array<struct<key: string, type: string, value: string>>>>"
)


def _tag(key: str, typ: str, val: Column) -> Column:
    return F.struct(F.lit(key).alias("key"), F.lit(typ).alias("type"), val.alias("value"))


def _ref(typ: str, trace: Column, span: Column) -> Column:
    return F.struct(
        F.lit(typ).alias("refType"), trace.alias("traceID"), span.alias("spanID")
    )


def _references(with_links: bool) -> Column:
    """makeJaegerProtoReferences (traces_to_jaegerproto.go:274-332): the
    parent rides FIRST as CHILD_OF ("usually backends look for it as the
    first CHILD_OF item"), then every span link as FOLLOWS_FROM carrying
    ONLY its ids — link trace_state/attrs/dropped do not travel on this
    wire (lossy; pdata never captures Jaeger's RefType either, hence the
    unconditional FOLLOWS_FROM). No parent and no links -> nil refs (no
    member on the wire)."""
    parent_ref = F.when(
        F.col("parent_span_id").isNotNull(),
        F.array(_ref("CHILD_OF", F.col("trace_id"), F.col("parent_span_id"))),
    )
    if not with_links:
        return parent_ref
    empty = F.array().cast("array<struct<refType:string,traceID:string,spanID:string>>")
    link_refs = F.transform(
        F.coalesce(F.col("links"), F.lit(None).cast(LINKS_SCHEMA)),
        lambda l: _ref("FOLLOWS_FROM", l["trace_id"], l["span_id"]),
    )
    refs = F.concat(F.coalesce(parent_ref, empty), F.coalesce(link_refs, empty))
    return F.when(F.size(refs) > 0, refs)


def to_jaeger_json(
    df: DataFrame,
    out_col: str = "value",
    with_events: bool = False,
    with_links: bool = False,
) -> DataFrame:
    """Marshal the span frame to Jaeger UI-JSON lines. Tag emission order and
    conditions follow ``traces_to_jaegerproto.go:195-252``: attributes first,
    then span.kind (non-unspecified only), status.code (always, int64),
    error=true (ERROR only), status.message (non-empty only)."""
    attr_tags = F.transform(
        F.map_entries(F.coalesce(F.col("attrs"), F.create_map())),
        lambda e: F.struct(
            e["key"].alias("key"), F.lit("string").alias("type"), e["value"].alias("value")
        ),
    )
    kind_val = F.create_map(
        *[x for v, s in KIND_TO_JAEGER.items() for x in (F.lit(v), F.lit(s))]
    )[F.col("kind")]
    extra = F.filter(
        F.array(
            _tag("span.kind", "string", kind_val),
            _tag("status.code", "int64", F.col("status_code").cast("string")),
            _tag("error", "bool", F.when(F.col("status_code") == 2, F.lit("true"))),
            _tag(
                "status.message",
                "string",
                F.when(F.col("status_message") != "", F.col("status_message")),
            ),
        ),
        lambda t: t["value"].isNotNull(),
    )
    span = F.struct(
        F.col("trace_id").alias("traceID"),
        F.col("span_id").alias("spanID"),
        F.col("name").alias("operationName"),
        _references(with_links).alias("references"),
        F.unix_micros(F.col("ts")).alias("startTime"),
        F.col("duration_us").alias("duration"),
        F.concat(attr_tags, extra).alias("tags"),
        F.struct(F.col("service_name").alias("serviceName")).alias("process"),
        *(
            # spanEventsToJaegerProtoLogs (traces_to_jaegerproto.go:333-357):
            # one log per event — a "message" field carries the name FIRST
            # (only when non-empty), then the attr fields; the dropped count
            # does not travel on this wire (lossy, unlike zipkin's format).
            # An empty events array emits no member (the events.Len() guard).
            [
                F.when(
                    F.size(F.coalesce(F.col("events"), F.lit(None).cast(EVENTS_SCHEMA))) > 0,
                    F.transform(
                        F.col("events"),
                        lambda e: F.struct(
                            F.unix_micros(e["ts"]).alias("timestamp"),
                            F.concat(
                                F.filter(
                                    F.array(_tag("message", "string", F.nullif(e["name"], F.lit("")))),
                                    lambda t: t["value"].isNotNull(),
                                ),
                                F.transform(
                                    F.map_entries(
                                        F.coalesce(e["attrs"], F.create_map().cast("map<string,string>"))
                                    ),
                                    lambda kv: F.struct(
                                        kv["key"].alias("key"),
                                        F.lit("string").alias("type"),
                                        kv["value"].alias("value"),
                                    ),
                                ),
                            ).alias("fields"),
                        ),
                    ),
                ).alias("logs")
            ]
            if with_events
            else []
        ),
    )
    return df.select(F.to_json(span).alias(out_col))


def parse_jaeger_json(
    df: DataFrame,
    col: str = "value",
    with_events: bool = False,
    with_links: bool = False,
) -> DataFrame:
    """Unmarshal Jaeger UI-JSON span lines to the flattened span frame with
    ``jaegerproto_to_traces.go`` semantics (see module docstring). Malformed
    lines yield a null struct (PERMISSIVE ``from_json``) and flow to the
    refused-records metric."""
    schema = _JAEGER_SCHEMA_EVENTS if with_events else _JAEGER_SCHEMA
    parsed = df.select(F.from_json(F.col(col), schema).alias("j"))
    tags = F.coalesce(
        F.col("j.tags"),
        F.array().cast("array<struct<key:string,type:string,value:string>>"),
    )

    def tag_val(key: str) -> Column:
        hits = F.filter(tags, lambda t: t["key"] == key)
        return F.try_element_at(hits, F.lit(1))["value"]

    error_true = tag_val("error") == "true"
    code_tag = tag_val("status.code")
    # getStatusCodeValFromAttr: int or numeric string; non-numeric -> tag
    # ignored (error path leaves the code as-is and keeps the tag)
    code_num = code_tag.try_cast("int")
    http_code = tag_val("http.status_code").try_cast("int")
    http_status = F.when(
        (http_code >= 100) & (http_code < 399), F.lit(0)
    ).otherwise(F.lit(2))
    # precedence (setInternalSpanStatus): a parsed status.code wins; else the
    # error tag; else an unparseable code tag still BLOCKS the http fallback
    # (the http branch is the `else if` of the code-tag lookup); else http.
    status_code = F.coalesce(
        code_num,
        F.when(error_true, F.lit(2)),
        F.when(code_tag.isNotNull(), F.lit(0)),
        F.when(http_code.isNotNull(), http_status),
        F.lit(0),
    )
    # message: read when the code TAG exists (even unparseable); on the http
    # path (no code tag, http code parses) from http.status_message — the
    # error tag does not gate the http message (:246-257)
    status_message = F.when(
        code_tag.isNotNull(), F.coalesce(tag_val("status.message"), F.lit(""))
    ).otherwise(
        F.when(
            http_code.isNotNull(),
            F.coalesce(tag_val("http.status_message"), F.lit("")),
        ).otherwise(F.lit(""))
    )
    kind = F.coalesce(
        F.create_map(*[x for s, v in JAEGER_KIND.items() for x in (F.lit(s), F.lit(v))])[
            tag_val("span.kind")
        ],
        F.lit(SPAN_KIND_UNSPECIFIED),
    )
    parent = F.try_element_at(
        F.filter(F.coalesce(F.col("j.references"), F.array()), lambda r: r["refType"] == "CHILD_OF"),
        F.lit(1),
    )["spanID"]
    # consumed tags (:185-189, :226-243): span.kind always; error only when
    # true (a false error tag survives as an attribute); status.code only
    # when it parsed; status.message whenever the code tag exists; the http
    # tags are never consumed
    remaining = F.filter(
        tags,
        lambda t: (t["key"] != "span.kind")
        & ~((t["key"] == "error") & F.coalesce(error_true, F.lit(False)))
        & ~((t["key"] == "status.code") & code_num.isNotNull())
        & ~((t["key"] == "status.message") & code_tag.isNotNull()),
    )
    attrs = F.map_from_entries(
        F.transform(remaining, lambda t: F.struct(t["key"], t["value"]))
    )
    return parsed.select(
        F.col("j.traceID").alias("trace_id"),
        F.col("j.spanID").alias("span_id"),
        parent.alias("parent_span_id"),
        F.col("j.operationName").alias("name"),
        kind.alias("kind"),
        status_code.alias("status_code"),
        status_message.alias("status_message"),
        F.coalesce(
            F.nullif(F.col("j.process.serviceName"), F.lit("")),
            F.lit(RESOURCE_NO_SERVICE_NAME),
        ).alias("service_name"),
        F.timestamp_micros(F.col("j.startTime")).alias("ts"),
        F.col("j.duration").alias("duration_us"),
        attrs.alias("attrs"),
        *(
            # jLogsToSpanEvents (jaegerproto_to_traces.go:310-334): one event
            # per log; a "message" field becomes the NAME and is deleted
            # from the attrs (an event attr literally named "message" is
            # therefore ambiguous on this wire — Go has the same loss);
            # no dropped count travels, it reads back 0.
            [
                F.transform(
                    F.coalesce(
                        F.col("j.logs"),
                        F.array().cast(
                            "array<struct<timestamp: bigint,"
                            " fields: array<struct<key: string, type: string, value: string>>>>"
                        ),
                    ),
                    lambda lg: F.struct(
                        F.timestamp_micros(lg["timestamp"]).alias("ts"),
                        F.coalesce(
                            F.try_element_at(
                                F.filter(
                                    F.coalesce(
                                        lg["fields"],
                                        F.array().cast(
                                            "array<struct<key:string,type:string,value:string>>"
                                        ),
                                    ),
                                    lambda t: t["key"] == "message",
                                ),
                                F.lit(1),
                            )["value"],
                            F.lit(""),
                        ).alias("name"),
                        F.map_from_entries(
                            F.transform(
                                F.filter(
                                    F.coalesce(
                                        lg["fields"],
                                        F.array().cast(
                                            "array<struct<key:string,type:string,value:string>>"
                                        ),
                                    ),
                                    lambda t: t["key"] != "message",
                                ),
                                lambda t: F.struct(t["key"], t["value"]),
                            )
                        ).alias("attrs"),
                        F.lit(0).cast("bigint").alias("dropped"),
                    ),
                ).alias("events")
            ]
            if with_events
            else []
        ),
        *(
            # jReferencesToSpanLinks (jaegerproto_to_traces.go:336-359): every
            # reference EXCEPT (spanID==parent AND CHILD_OF) becomes a link —
            # a FOLLOWS_FROM ref aimed at the parent is therefore KEPT (the
            # skip requires both conditions), and only ids travel: trace_state
            # reads back "", attrs {}, dropped 0 (this wire never carried
            # them; pdata never carries RefType either).
            [
                F.transform(
                    F.filter(
                        F.coalesce(
                            F.col("j.references"),
                            F.array().cast(
                                "array<struct<refType:string,traceID:string,spanID:string>>"
                            ),
                        ),
                        lambda r: ~(
                            (r["refType"] == "CHILD_OF")
                            & r["spanID"].eqNullSafe(parent)
                        ),
                    ),
                    lambda r: F.struct(
                        r["traceID"].alias("trace_id"),
                        r["spanID"].alias("span_id"),
                        F.lit("").alias("trace_state"),
                        F.create_map().cast("map<string,string>").alias("attrs"),
                        F.lit(0).cast("bigint").alias("dropped"),
                    ),
                ).alias("links")
            ]
            if with_links
            else []
        ),
    )
