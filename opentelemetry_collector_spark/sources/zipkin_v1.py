"""Zipkin v1 JSON span parser (the Zipkin receiver's legacy-wire path).

The reference's Zipkin receiver accepts BOTH API versions: v2 JSON
(``sources/zipkin.py`` here) and the v1 annotation model, which it converts
v1 -> OpenCensus -> pdata (``receiver/zipkinreceiver/trace_receiver.go:113-120``
via ``translator/trace/zipkinv1/json.go``). This module re-expresses that
COMPOSED conversion directly onto our flattened span frame
(``zipkin.SPAN_FRAME_COLS``) as pure JVM ``from_json`` + higher-order array
functions — one span object per row, no Python, scan-speed parse.

Reference semantics reproduced exactly (``translator/trace/zipkinv1/json.go``
unless noted; OC->pdata steps from ``translator/internaldata/oc_to_traces.go``
follow our ``sources/opencensus.py``):

- **ids** (:415-459): traceId must be 16- or 32-hex and nonzero (left-padded
  to 32), span id 16-hex nonzero; v1 has no self-parent drop. The Go code
  fails the whole batch on a bad id — a per-row engine degrades that row's
  id to NULL instead (refused-records path), like our other codecs.
- **kind from annotations** (:311-371 + the OC round): the FIRST annotation
  whose value is one of cs/cr/ms/mr/ss/sr decides: cs/cr -> CLIENT(3),
  ss/sr -> SERVER(2), ms -> PRODUCER(4), mr -> CONSUMER(5) (ms/mr travel
  OC-side as the consumed ``span.kind`` attr, json_test.go:704-772 pins the
  composition); no kind annotation -> UNSPECIFIED(0).
- **service name** (:311-413, :171-173, :225-271): the first annotation
  that has BOTH a kind value and an endpoint serviceName provides the
  endpoint; otherwise fall back to the LAST binaryAnnotation endpoint
  serviceName, then to the LAST ``lc`` (local component) value
  (testdata/zipkin_v1_local_component.json), else ``unknown-service``.
  Only an annotation-selected endpoint contributes ipv4/ipv6/port node
  attrs (:471-515), inserted into ``attrs`` only-if-absent (the
  oc_to_resource Insert semantics our opencensus parser uses).
- **status mapper** (``status_code.go:58-131``, goldens
  ``json_test.go:224-512``): precedence census.status_code >
  status.code > error-tag canonical name > http.status_code (mapped via
  ``grpc_http_mapper.go:38-65``) > unparseable-error-tag UNKNOWN(2).
  census.*/status.* tags are always consumed; http.* tags are NEVER
  consumed; the error tag is consumed only when empty (sets nothing) or a
  canonical code name. The selected OC code then collapses to the pdata
  enum: 0 -> UNSET(0), anything else -> ERROR(2) (oc_to_traces.go:169-195),
  message carried alongside.
- **timestamps** (:174-181, :517-537): timestamp==0/absent falls back to
  the earliest/latest annotation micros; when even that is absent the Go
  code stamps time.Now() + a ``otel.zipkin.absentField.startTime: true``
  attr — a batch engine must stay deterministic, so we keep ts NULL and
  set the same flag attr (divergence documented here).
- **attrs**: remaining binaryAnnotations, ``lc`` renamed ``component``
  (:243-247), duplicate keys last-wins (Go map overwrite).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# canonicalCodesMap (status_code.go:185-204)
CANONICAL_CODES = {
    "OK": 0, "CANCELLED": 1, "UNKNOWN": 2, "INVALID_ARGUMENT": 3,
    "DEADLINE_EXCEEDED": 4, "NOT_FOUND": 5, "ALREADY_EXISTS": 6,
    "PERMISSION_DENIED": 7, "RESOURCE_EXHAUSTED": 8, "FAILED_PRECONDITION": 9,
    "ABORTED": 10, "OUT_OF_RANGE": 11, "UNIMPLEMENTED": 12, "INTERNAL": 13,
    "UNAVAILABLE": 14, "DATA_LOSS": 15, "UNAUTHENTICATED": 16,
}

# httpToOCCodeMap (grpc_http_mapper.go:38-47)
HTTP_TO_OC = {401: 16, 403: 7, 404: 5, 429: 8, 499: 1, 501: 12, 503: 14, 504: 4}

UNKNOWN_SERVICE = "unknown-service"  # json.go:309
START_TIME_ABSENT = "otel.zipkin.absentField.startTime"  # internal/zipkin:26

_KIND_VALUES = ("cs", "cr", "ms", "mr", "ss", "sr")

_EP = "struct<serviceName: string, ipv4: string, ipv6: string, port: int>"
V1_SCHEMA = (
    "traceId string, name string, parentId string, id string,"
    " timestamp bigint, duration bigint, debug boolean,"
    f" annotations array<struct<timestamp: bigint, value: string, endpoint: {_EP}>>,"
    f" binaryAnnotations array<struct<key: string, value: string, endpoint: {_EP}>>"
)

def _empty_map():
    return F.create_map().cast("map<string,string>")


def _last_val(bans: Column, *keys: str) -> Column:
    """Value of the LAST binaryAnnotation whose key is in `keys` (the Go
    loop overwrites per-field state, so last occurrence wins)."""
    keyarr = F.array(*[F.lit(k) for k in keys])
    return F.try_element_at(F.filter(bans, lambda b: F.array_contains(keyarr, b["key"])), F.lit(-1))["value"]


def _http_to_oc(code: Column) -> Column:
    """ocStatusCodeFromHTTP (grpc_http_mapper.go:51-65)."""
    mapped = F.create_map(*[x for h, oc in HTTP_TO_OC.items() for x in (F.lit(h), F.lit(oc))])[code]
    return (
        F.when((code >= 100) & (code < 400), F.lit(0))
        .when(mapped.isNotNull(), mapped)
        .when((code >= 400) & (code < 500), F.lit(3))
        .when((code >= 500) & (code < 600), F.lit(13))
        .otherwise(F.lit(2))
    )


def parse_zipkin_v1_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal Zipkin v1 JSON span objects (one per row) to the flattened
    span frame — same output columns as ``zipkin.parse_zipkin_json`` so the
    two wire versions feed identical downstream pipelines, exactly like the
    receiver converging both on pdata."""
    parsed = df.select(F.from_json(F.col(col), V1_SCHEMA).alias("z"))
    z = F.col("z")

    # ---- ids (json.go:415-459) ----
    tid = z["traceId"]
    tid_ok = (
        tid.rlike("^[0-9a-fA-F]{16}$|^[0-9a-fA-F]{32}$") & ~tid.rlike("^0+$")
    )
    trace_id = F.when(tid_ok, F.lpad(F.lower(tid), 32, "0"))
    sid = z["id"]
    sid_ok = sid.rlike("^[0-9a-fA-F]{16}$") & ~sid.rlike("^0+$")
    span_id = F.when(sid_ok, F.lower(sid))
    pid = z["parentId"]
    parent_id = F.when(
        pid.isNotNull() & (pid != "") & pid.rlike("^[0-9a-fA-F]{16}$") & ~pid.rlike("^0+$"),
        F.lower(pid),
    )

    # ---- annotations (json.go:311-413) ----
    anns = F.coalesce(z["annotations"], F.expr("array()").cast(f"array<struct<timestamp: bigint, value: string, endpoint: {_EP}>>"))
    valid = F.filter(anns, lambda a: a["value"].isNotNull() & (a["value"] != ""))
    kindarr = F.array(*[F.lit(k) for k in _KIND_VALUES])
    kind_anns = F.filter(valid, lambda a: F.array_contains(kindarr, a["value"]))
    kv = F.try_element_at(kind_anns, F.lit(1))["value"]
    kind = (
        F.when(kv.isin("cs", "cr"), F.lit(3))
        .when(kv.isin("ss", "sr"), F.lit(2))
        .when(kv == "ms", F.lit(4))
        .when(kv == "mr", F.lit(5))
        .otherwise(F.lit(0))
    )
    ep = F.try_element_at(
        F.filter(
            valid,
            lambda a: F.array_contains(kindarr, a["value"])
            & a["endpoint"]["serviceName"].isNotNull()
            & (a["endpoint"]["serviceName"] != ""),
        ),
        F.lit(1),
    )["endpoint"]
    ann_ts = F.transform(valid, lambda a: a["timestamp"])
    early_us = F.array_min(ann_ts)
    late_us = F.array_max(ann_ts)

    # ---- binaryAnnotations: service fallback + status mapper ----
    bans = F.coalesce(z["binaryAnnotations"], F.expr("array()").cast(f"array<struct<key: string, value: string, endpoint: {_EP}>>"))
    fb_ep = F.try_element_at(
        F.filter(
            bans,
            lambda b: b["endpoint"]["serviceName"].isNotNull() & (b["endpoint"]["serviceName"] != ""),
        ),
        F.lit(-1),
    )["endpoint"]["serviceName"]
    lc_val = _last_val(bans, "lc")
    service_name = F.coalesce(ep["serviceName"], fb_ep, lc_val, F.lit(UNKNOWN_SERVICE))

    census_code = _last_val(bans, "census.status_code").try_cast("int")
    census_msg = _last_val(bans, "census.status_description", "opencensus.status_description")
    status_code_tag = _last_val(bans, "status.code").try_cast("int")
    status_msg = _last_val(bans, "status.message")
    http_raw = _last_val(bans, "http.status_code").try_cast("int")
    http_oc = F.when(http_raw.isNotNull(), _http_to_oc(http_raw))
    http_msg = _last_val(bans, "http.status_message")
    err_raw = _last_val(bans, "error")
    canon = F.create_map(*[x for n, c in CANONICAL_CODES.items() for x in (F.lit(n), F.lit(c))])
    err_canonical = canon[err_raw]
    # error tag: "" => consumed, no code; canonical => that code, consumed;
    # else => UNKNOWN(2) fallback-of-last-resort, tag kept (status_code.go:163-183)
    err_code = F.when(err_raw.isNotNull() & (err_raw != ""), err_canonical)
    err_unknown = F.when(err_raw.isNotNull() & (err_raw != "") & err_canonical.isNull(), F.lit(2))
    err_consumed = err_raw.isNotNull() & ((err_raw == "") | err_canonical.isNotNull())

    # ocStatus precedence (status_code.go:58-89)
    oc_code = F.coalesce(census_code, status_code_tag, err_code, http_oc, err_unknown)
    oc_msg = (
        F.when(census_code.isNotNull(), F.coalesce(census_msg, F.lit("")))
        .when(status_code_tag.isNotNull(), F.coalesce(status_msg, F.lit("")))
        .when(
            err_code.isNotNull(),
            F.coalesce(F.nullif(census_msg, F.lit("")), F.nullif(status_msg, F.lit("")), F.lit("")),
        )
        .when(http_oc.isNotNull(), F.coalesce(http_msg, F.lit("")))
        .otherwise(F.lit(""))
    )
    # OC -> pdata collapse (oc_to_traces.go:169-195): 0 -> UNSET, else ERROR
    status_code = F.when(oc_code.isNull(), F.lit(0)).when(oc_code == 0, F.lit(0)).otherwise(F.lit(2))
    status_message = F.when(oc_code.isNotNull(), oc_msg).otherwise(F.lit(""))

    # ---- timestamps (json.go:174-181, 517-537) ----
    has_ts = z["timestamp"].isNotNull() & (z["timestamp"] != 0)
    start_us = F.when(has_ts, z["timestamp"]).otherwise(
        F.when(early_us > 0, early_us)
    )
    end_us = F.when(has_ts, z["timestamp"] + F.coalesce(z["duration"], F.lit(0))).otherwise(
        F.when(late_us > 0, late_us)
    )

    # ---- attrs: unconsumed binaryAnnotations, lc -> component, last-wins ----
    consumed_always = F.array(
        F.lit("census.status_code"),
        F.lit("census.status_description"),
        F.lit("opencensus.status_description"),
        F.lit("status.code"),
        F.lit("status.message"),
    )
    kept = F.filter(
        bans,
        lambda b: b["key"].isNotNull()
        & ~F.array_contains(consumed_always, b["key"])
        & ~((b["key"] == F.lit("error")) & err_consumed),
    )
    # fold entries into a map so duplicate keys overwrite like the Go map
    attrs = F.aggregate(
        kept,
        _empty_map(),
        lambda m, b: F.map_concat(
            F.map_filter(
                m,
                lambda k, v: k != F.when(b["key"] == "lc", F.lit("component")).otherwise(b["key"]),
            ),
            F.map_from_arrays(
                F.array(F.when(b["key"] == "lc", F.lit("component")).otherwise(b["key"])),
                F.array(b["value"]),
            ),
        ),
    )
    # annotation-endpoint node attrs, inserted only-if-absent (json.go:499-515)
    ep_attrs = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("ipv4"), F.lit("ipv6"), F.lit("port")),
            F.array(
                F.nullif(ep["ipv4"], F.lit("")),
                F.nullif(ep["ipv6"], F.lit("")),
                F.when(ep["port"].isNotNull() & (ep["port"] != 0), ep["port"].cast("string")),
            ),
        ),
        lambda k, v: v.isNotNull(),
    )
    start_absent = F.when(
        start_us.isNull(),
        F.create_map(F.lit(START_TIME_ABSENT), F.lit("true")),
    ).otherwise(_empty_map())
    insert_only = F.map_concat(
        attrs,
        F.map_filter(
            F.map_concat(F.coalesce(ep_attrs, _empty_map()), start_absent),
            lambda k, v: ~F.map_contains_key(attrs, k),
        ),
    )

    return parsed.select(
        trace_id.alias("trace_id"),
        span_id.alias("span_id"),
        parent_id.alias("parent_span_id"),
        F.coalesce(z["name"], F.lit("")).alias("name"),
        kind.alias("kind"),
        status_code.cast("int").alias("status_code"),
        status_message.alias("status_message"),
        service_name.alias("service_name"),
        F.timestamp_micros(start_us).alias("ts"),
        (end_us - start_us).cast("bigint").alias("duration_us"),
        insert_only.alias("attrs"),
    )
