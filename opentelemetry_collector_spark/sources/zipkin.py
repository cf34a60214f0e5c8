"""Zipkin v2 JSON span codec (the trace-translator class of the reference).

The reference ships paired Zipkin v2 translators — pdata -> zipkin
(``translator/trace/zipkinv2/from_translator.go``) and zipkin -> pdata
(``translator/trace/zipkinv2/to_translator.go``) — fed by the Zipkin HTTP
receiver (``receiver/zipkinreceiver/trace_receiver.go:89-180``). This module
re-expresses that codec over the flattened span frame our transcript model
uses (one row per span, SURVEY §1.3), entirely with JVM-side
``to_json``/``from_json`` + map functions, so a landing zone of Zipkin JSON
lines parses at scan speed with predicate pushdown on the post-parse columns.

Reference semantics reproduced exactly (file:line cites):

- **kind mapping** (``to_translator.go:185-204 zipkinKindToSpanKind``):
  CLIENT->3, SERVER->2, PRODUCER->4, CONSUMER->5; when the zipkin kind is
  absent, a ``span.kind == "internal"`` tag yields INTERNAL (1), consuming
  the tag; anything else is UNSPECIFIED (0).
- **internal marshal** (``from_translator.go:149-152``): SpanKindInternal
  emits NO zipkin kind and the ``span.kind: internal`` tag instead.
- **status tags** (``from_translator.go:160-166``, ``to_translator.go:166-183
  populateSpanStatus``): marshal always writes ``status.code`` as the enum
  NAME (STATUS_CODE_UNSET/OK/ERROR); ``status.message`` only when non-empty.
  Parse maps the name back through ``statusCodeValue`` (:485-489), reads the
  message ONLY when the code tag is present, then an ``error: "true"`` tag
  forces code ERROR; all three tags are consumed (never promoted to attrs).
- **self-parent dropped** (``to_translator.go:140-143``): parentId == id
  yields no parent.
- **tag promotion** (``to_translator.go:350-376 tagsToAttributeMap``):
  remaining tags become span attributes, minus the non-span keys
  (``to_translator.go:97-109 nonSpanAttributes``).
- **service name** (``to_translator.go:378-396``): localEndpoint.serviceName
  becomes the resource service name; absent -> ``OTLPResourceNoServiceName``
  (``protospan_translation.go:42``).
- **timestamps**: zipkin carries epoch MICROseconds (int) and duration in
  micros; pdata nanos are derived exactly (``from_translator.go:142-148``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pdata.SpanKind enum values (model/pdata/generated_trace.go SpanKind).
SPAN_KIND_UNSPECIFIED = 0
SPAN_KIND_INTERNAL = 1
SPAN_KIND_SERVER = 2
SPAN_KIND_CLIENT = 3
SPAN_KIND_PRODUCER = 4
SPAN_KIND_CONSUMER = 5

# zipkin kind string <-> pdata kind int (to_translator.go:185-204).
ZIPKIN_TO_KIND = {"CLIENT": 3, "SERVER": 2, "PRODUCER": 4, "CONSUMER": 5}
KIND_TO_ZIPKIN = {v: k for k, v in ZIPKIN_TO_KIND.items()}

# statusCodeValue (to_translator.go:485-489)
STATUS_NAMES = {0: "STATUS_CODE_UNSET", 1: "STATUS_CODE_OK", 2: "STATUS_CODE_ERROR"}
STATUS_VALUES = {v: k for k, v in STATUS_NAMES.items()}

RESOURCE_NO_SERVICE_NAME = "OTLPResourceNoServiceName"  # protospan_translation.go:42

# Tags the parser consumes into typed span fields (populateSpanStatus,
# zipkinKindToSpanKind, TagW3CTraceState) or resource scope
# (nonSpanAttributes, to_translator.go:97-109 — the subset meaningful in our
# flattened model) — never promoted to span attributes.
_CONSUMED_TAGS = [
    "status.code",
    "status.message",
    "error",
    "span.kind",
    "w3c.tracestate",
    "otlp.service.name.source",
    "otel.library.name",
    "otel.library.version",
    "service.name",
]

_ZIPKIN_SCHEMA = (
    "traceId string, id string, parentId string, kind string, name string,"
    " timestamp bigint, duration bigint,"
    " localEndpoint struct<serviceName: string>,"
    " tags map<string,string>"
)

# with_events=True adds the annotations member (zipkin JSON: micros timestamp
# + opaque value string carrying the span-event data format)
_ZIPKIN_SCHEMA_EVENTS = (
    _ZIPKIN_SCHEMA + ", annotations array<struct<timestamp: bigint, value: string>>"
)

EVENTS_SCHEMA = "array<struct<ts: timestamp, name: string, attrs: map<string,string>, dropped: bigint>>"


def _annotation_value(e: Column) -> Column:
    """``spanEventDataFormat = "%s|%s|%d"`` (from_translator.go:37,193-218):
    bare name when the event has no attributes and no dropped count, else
    ``name|{sorted-key json}|dropped`` — Go json.Marshal sorts map keys, so
    the map is rebuilt from sorted entries before to_json."""
    attrs = F.coalesce(e["attrs"], F.create_map().cast("map<string,string>"))
    dropped = F.coalesce(e["dropped"], F.lit(0))
    sorted_json = F.to_json(F.map_from_entries(F.array_sort(F.map_entries(attrs))))
    return F.when((F.size(attrs) == 0) & (dropped == 0), e["name"]).otherwise(
        F.concat(e["name"], F.lit("|"), sorted_json, F.lit("|"), dropped.cast("string"))
    )


def _parse_annotation(a: Column) -> Column:
    """Inverse of the data format (to_translator.go:266-301): split on ``|``;
    <3 parts -> bare name, ==3 -> parts[1] is the json, >3 -> the json
    itself contained pipes, rejoin the middle. The dropped count is the
    last part (a junk count degrades to NULL per-row instead of failing
    the whole batch like the Go strconv error path)."""
    arr = F.split(a["value"], r"\|")
    n = F.size(arr)
    attrs_json = F.when(n == 3, F.element_at(arr, 2)).when(
        n > 3, F.array_join(F.slice(arr, 2, n - 2), "|")
    )
    return F.struct(
        F.timestamp_micros(a["timestamp"]).alias("ts"),
        F.element_at(arr, 1).alias("name"),
        F.coalesce(
            F.from_json(attrs_json, "map<string,string>"),
            F.create_map().cast("map<string,string>"),
        ).alias("attrs"),
        F.when(n >= 3, F.element_at(arr, -1).try_cast("bigint"))
        .otherwise(F.lit(0))
        .alias("dropped"),
    )

SPAN_FRAME_COLS = [
    "trace_id",
    "span_id",
    "parent_span_id",
    "name",
    "kind",
    "status_code",
    "status_message",
    "service_name",
    "ts",
    "duration_us",
    "attrs",
]


def spans_from_transcripts(df: DataFrame) -> DataFrame:
    """Derive the flattened span frame from transcript turns: one span per
    turn, parented on the previous turn of the same conversation — the
    transcripts-as-traces mapping of SURVEY §1.3 (conv == trace, turn ==
    span). IDs are md5-derived (16-byte trace id = md5 hex of conv_id,
    8-byte span id = first 16 hex chars), matching idutils' fixed-width ids
    (``internal/idutils``) while staying engine-portable for the oracle.

    All expressions are deterministic JVM builtins — no shuffle: the parent
    id is recomputed from (conv_id, turn_idx-1), not looked up via a window.
    """
    idx_s = F.col("turn_idx").cast("string")
    prev_s = (F.col("turn_idx") - 1).cast("string")
    has_err = F.col("text").rlike(r"error code=\d+")
    return df.select(
        F.md5(F.col("conv_id")).alias("trace_id"),
        F.substring(F.md5(F.concat(F.col("conv_id"), F.lit(":"), idx_s)), 1, 16).alias("span_id"),
        F.when(
            F.col("turn_idx") > 0,
            F.substring(F.md5(F.concat(F.col("conv_id"), F.lit(":"), prev_s)), 1, 16),
        ).alias("parent_span_id"),
        F.coalesce(F.col("tool"), F.col("role")).alias("name"),
        F.when(F.col("role") == "user", F.lit(SPAN_KIND_CLIENT))
        .when(F.col("role") == "assistant", F.lit(SPAN_KIND_SERVER))
        .when(F.col("role") == "tool", F.lit(SPAN_KIND_CONSUMER))
        .when(F.col("role") == "system", F.lit(SPAN_KIND_INTERNAL))
        .otherwise(F.lit(SPAN_KIND_UNSPECIFIED))
        .alias("kind"),
        F.when(has_err, F.lit(2)).otherwise(F.lit(0)).alias("status_code"),
        F.when(has_err, F.regexp_extract(F.col("text"), r"error code=\d+", 0))
        .otherwise(F.lit(""))
        .alias("status_message"),
        F.col("role").alias("service_name"),
        F.col("ts").cast("timestamp").alias("ts"),
        (F.length("text") * 1000).cast("bigint").alias("duration_us"),
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit("turn.idx"), F.lit("tool")),
                F.array(idx_s, F.col("tool")),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("attrs"),
    )


LINKS_SCHEMA = (
    "array<struct<trace_id: string, span_id: string, trace_state: string,"
    " attrs: map<string,string>, dropped: bigint>>"
)


def _link_value(link: Column) -> Column:
    """``spanLinkDataFormat = "%s|%s|%s|%s|%d"`` (from_translator.go:36,
    220-231): traceId|spanId|traceState|{sorted-key json}|dropped."""
    attrs = F.coalesce(link["attrs"], F.create_map().cast("map<string,string>"))
    return F.concat_ws(
        "|",
        F.coalesce(link["trace_id"], F.lit("")),
        F.coalesce(link["span_id"], F.lit("")),
        F.coalesce(link["trace_state"], F.lit("")),
        F.to_json(F.map_from_entries(F.array_sort(F.map_entries(attrs)))),
        F.coalesce(link["dropped"], F.lit(0)).cast("string"),
    )


def _parse_link(v: Column) -> Column:
    """One otlp.link.N tag value -> link struct (to_translator.go:205-262):
    <5 parts is skipped by the caller; the json may itself carry pipes and
    is rejoined from the middle; a junk dropped count degrades to NULL
    per-row instead of the Go strconv batch error."""
    arr = F.split(v, r"\|")
    n = F.size(arr)
    attrs_json = F.when(n == 5, F.element_at(arr, 4)).when(
        n > 5, F.array_join(F.slice(arr, 4, n - 4), "|")
    )
    return F.when(
        n >= 5,
        F.struct(
            F.element_at(arr, 1).alias("trace_id"),
            F.element_at(arr, 2).alias("span_id"),
            F.element_at(arr, 3).alias("trace_state"),
            F.coalesce(
                F.from_json(attrs_json, "map<string,string>"),
                F.create_map().cast("map<string,string>"),
            ).alias("attrs"),
            F.element_at(arr, -1).try_cast("bigint").alias("dropped"),
        ),
    )


def _consumed_link_count(tags: Column) -> Column:
    """zTagsToSpanLinks consumes ``otlp.link.0..127`` as a CONSECUTIVE
    prefix — the loop returns at the first missing index, so a gap leaves
    later otlp.link.N tags behind as ordinary attributes (:205-213)."""
    present = F.transform(
        F.sequence(F.lit(0), F.lit(127)),
        lambda i: tags[F.concat(F.lit("otlp.link."), i.cast("string"))].isNull(),
    )
    # 1-based position of the first missing index == count of consumed links
    return F.coalesce(F.array_position(present, True) - 1, F.lit(128))


def with_transcript_events(spans: DataFrame) -> DataFrame:
    """Deterministic span events over the transcripts-as-traces frame: every
    turn opens with a bare ``turn.start`` annotation (the no-attrs fast path
    of from_translator.go:199-203), and tool turns add a ``tool.invoke``
    event 1 ms later whose attrs carry the tool name plus a pipe-bearing
    arg — exercising the data-format's json-rejoin on parse
    (to_translator.go:277-285) — and a nonzero dropped count."""
    start = F.struct(
        F.col("ts").alias("ts"),
        F.lit("turn.start").alias("name"),
        F.create_map().cast("map<string,string>").alias("attrs"),
        F.lit(0).cast("bigint").alias("dropped"),
    )
    tool_attr = F.element_at(F.col("attrs"), "tool")
    turn_idx = F.element_at(F.col("attrs"), "turn.idx").cast("bigint")
    tool_ev = F.when(
        tool_attr.isNotNull(),
        F.struct(
            F.timestamp_micros(F.unix_micros(F.col("ts")) + 1000).alias("ts"),
            F.lit("tool.invoke").alias("name"),
            F.map_from_arrays(
                F.array(F.lit("arg"), F.lit("tool")),
                F.array(F.concat(F.lit("a|"), F.col("service_name")), tool_attr),
            ).alias("attrs"),
            (turn_idx % 3).alias("dropped"),
        ),
    )
    return spans.withColumn(
        "events", F.filter(F.array(start, tool_ev), lambda e: e.isNotNull())
    )


def with_transcript_links(spans: DataFrame) -> DataFrame:
    """Deterministic span links over the transcripts-as-traces frame: every
    non-root turn links to its parent span (the FOLLOWS_FROM-style backlink)
    with a pipe-bearing attribute — exercising the spanLinkDataFormat's
    json-rejoin on parse — and an alternating dropped count."""
    turn_idx = F.element_at(F.col("attrs"), "turn.idx").cast("bigint")
    link = F.when(
        F.col("parent_span_id").isNotNull(),
        F.struct(
            F.col("trace_id").alias("trace_id"),
            F.col("parent_span_id").alias("span_id"),
            F.lit("").alias("trace_state"),
            F.create_map(F.lit("rel"), F.lit("follows|from")).alias("attrs"),
            (turn_idx % 2).alias("dropped"),
        ),
    )
    return spans.withColumn("links", F.filter(F.array(link), lambda l: l.isNotNull()))


def _status_name(code: Column) -> Column:
    out = F.lit(STATUS_NAMES[0])
    for v, name in STATUS_NAMES.items():
        if v:
            out = F.when(code == v, F.lit(name)).otherwise(out)
    return out


def to_zipkin_json(
    df: DataFrame,
    out_col: str = "value",
    with_events: bool = False,
    with_links: bool = False,
) -> DataFrame:
    """Marshal the span frame to Zipkin v2 JSON lines (one span object per
    line; the HTTP receiver's array body is just these joined with commas).

    Tag emission follows ``from_translator.go:140-166``: ``status.code`` is
    always present (enum name), ``status.message`` only when non-empty,
    SpanKindInternal drops the zipkin kind and adds ``span.kind: internal``,
    and span attributes merge into the tag map. ``to_json`` omits nulls —
    jsonpb omit-empty parity."""
    kind_col = F.create_map(
        *[x for v, z in KIND_TO_ZIPKIN.items() for x in (F.lit(v), F.lit(z))]
    )[F.col("kind")]
    status_tags = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("status.code"), F.lit("status.message"), F.lit("span.kind")),
            F.array(
                _status_name(F.col("status_code")),
                F.when(F.col("status_message") != "", F.col("status_message")),
                F.when(F.col("kind") == SPAN_KIND_INTERNAL, F.lit("internal")),
            ),
        ),
        lambda k, v: v.isNotNull(),
    )
    fields = [
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("id"),
        F.col("parent_span_id").alias("parentId"),
        kind_col.alias("kind"),
        F.col("name").alias("name"),
        F.unix_micros(F.col("ts")).alias("timestamp"),
        F.col("duration_us").alias("duration"),
        F.struct(F.col("service_name").alias("serviceName")).alias("localEndpoint"),
        F.map_concat(
            F.coalesce(F.col("attrs"), F.create_map()),
            status_tags,
            *(
                # spanLinksToZipkinTags (from_translator.go:220-231): one
                # otlp.link.{i} tag per link, in link order
                [
                    F.map_from_entries(
                        F.transform(
                            F.coalesce(F.col("links"), F.lit(None).cast(LINKS_SCHEMA)),
                            lambda l, i: F.struct(
                                F.concat(F.lit("otlp.link."), i.cast("string")).alias("key"),
                                _link_value(l).alias("value"),
                            ),
                        )
                    )
                ]
                if with_links
                else []
            ),
        ).alias("tags"),
    ]
    if with_events:
        # spanEventsToZipkinAnnotations (from_translator.go:193-218): one
        # annotation per event, micros timestamp, data-format value; an
        # empty/absent events array omits the member (to_json omit-null,
        # matching the `events.Len() > 0` guard)
        annos = F.when(
            F.size(F.coalesce(F.col("events"), F.lit(None).cast(EVENTS_SCHEMA))) > 0,
            F.transform(
                F.col("events"),
                lambda e: F.struct(
                    F.unix_micros(e["ts"]).alias("timestamp"),
                    _annotation_value(e).alias("value"),
                ),
            ),
        )
        fields.append(annos.alias("annotations"))
    return df.select(F.to_json(F.struct(*fields)).alias(out_col))


def parse_zipkin_json(
    df: DataFrame,
    col: str = "value",
    with_events: bool = False,
    with_links: bool = False,
) -> DataFrame:
    """Unmarshal Zipkin v2 JSON span lines to the flattened span frame with
    the reference's exact semantics (``to_translator.go:133-204``):

    - kind: zipkin kind string, else ``span.kind == internal`` tag -> 1,
      else 0;
    - status: ``status.code`` name -> enum; message read only when the code
      tag exists; ``error: "true"`` forces ERROR; tags consumed;
    - parentId == id dropped (:140-143);
    - serviceName default ``OTLPResourceNoServiceName`` (:378-382);
    - remaining tags -> ``attrs`` (non-span keys excluded, :97-109).

    Malformed lines yield a null struct (PERMISSIVE ``from_json``) and flow
    to the refused-records metric, like the receiver's 400 path."""
    schema = _ZIPKIN_SCHEMA_EVENTS if with_events else _ZIPKIN_SCHEMA
    parsed = df.select(F.from_json(F.col(col), schema).alias("z"))
    tags = F.coalesce(F.col("z.tags"), F.create_map().cast("map<string,string>"))
    status_tag = tags["status.code"]
    code_from_tag = F.create_map(
        *[x for name, v in STATUS_VALUES.items() for x in (F.lit(name), F.lit(v))]
    )[status_tag]
    status_code = F.when(
        tags["error"] == "true", F.lit(2)
    ).otherwise(F.coalesce(code_from_tag, F.lit(0)))
    status_message = F.when(
        status_tag.isNotNull(), F.coalesce(tags["status.message"], F.lit(""))
    ).otherwise(F.lit(""))
    kind_from_zipkin = F.create_map(
        *[x for z, v in ZIPKIN_TO_KIND.items() for x in (F.lit(z), F.lit(v))]
    )[F.col("z.kind")]
    kind = F.coalesce(
        kind_from_zipkin,
        F.when(tags["span.kind"] == "internal", F.lit(SPAN_KIND_INTERNAL)),
        F.lit(SPAN_KIND_UNSPECIFIED),
    )
    consumed = F.array(*[F.lit(k) for k in _CONSUMED_TAGS])
    return parsed.select(
        F.col("z.traceId").alias("trace_id"),
        F.col("z.id").alias("span_id"),
        F.when(F.col("z.parentId") != F.col("z.id"), F.col("z.parentId")).alias(
            "parent_span_id"
        ),
        F.col("z.name").alias("name"),
        kind.alias("kind"),
        status_code.alias("status_code"),
        status_message.alias("status_message"),
        F.coalesce(F.col("z.localEndpoint.serviceName"), F.lit(RESOURCE_NO_SERVICE_NAME)).alias(
            "service_name"
        ),
        F.timestamp_micros(F.col("z.timestamp")).alias("ts"),
        F.col("z.duration").alias("duration_us"),
        F.map_filter(
            tags,
            lambda k, v: ~F.array_contains(consumed, k)
            & (
                F.lit(not with_links)
                | ~(
                    k.rlike(r"^otlp\.link\.\d+$")
                    & (F.substring(k, 11, 10).try_cast("int") < _consumed_link_count(tags))
                )
            ),
        ).alias("attrs"),
        *(
            [
                F.filter(
                    F.transform(
                        F.slice(
                            F.transform(
                                F.sequence(F.lit(0), F.lit(127)),
                                lambda i: tags[
                                    F.concat(F.lit("otlp.link."), i.cast("string"))
                                ],
                            ),
                            F.lit(1),
                            _consumed_link_count(tags),
                        ),
                        _parse_link,
                    ),
                    # partCnt < 5 is skipped, not an error (:216-219)
                    lambda l: l.isNotNull(),
                ).alias("links")
            ]
            if with_links
            else []
        ),
        *(
            [
                F.transform(
                    F.coalesce(
                        F.col("z.annotations"),
                        F.lit(None).cast(
                            "array<struct<timestamp: bigint, value: string>>"
                        ),
                        F.array().cast(
                            "array<struct<timestamp: bigint, value: string>>"
                        ),
                    ),
                    _parse_annotation,
                ).alias("events")
            ]
            if with_events
            else []
        ),
    )
