"""OpenCensus JSON span codec — the third trace-translator pair.

The reference translates OC agent batches (node + resource + spans) to pdata
in ``translator/internaldata/oc_to_traces.go`` / ``oc_to_resource.go`` and
back in ``traces_to_oc.go``; the OpenCensus receiver/exporter are thin
network wrappers around these. This module re-expresses the pair over the
flattened span frame (``sources/zipkin.py SPAN_FRAME_COLS`` + a ``resource``
map column) with JVM ``from_json``/``to_json`` + higher-order functions only.

Wire shape: one OC batch per JSON line —
``{node: {identifier, libraryInfo, serviceInfo, attributes},
resource: {type, labels}, spans: [...]}`` with proto-JSON field names;
span attributes are the OC typed union
``{attributeMap: {k: {stringValue: {value}|intValue|boolValue|doubleValue}}}``.

Reference semantics reproduced (file:line cites):

- **batch fan-out** (``oc_to_traces.go:47-119``): spans with a nil
  ``resource`` share the batch node+resource; a span-level resource
  OVERRIDES the batch resource but the node still applies
  (``ocSpanToResourceSpans`` passes node + ocSpan.Resource). Flattened:
  explode spans, per-span resource map = node-attrs + (span.resource or
  batch resource).
- **node/resource -> attrs** (``oc_to_resource.go:105-140``):
  serviceInfo.name -> ``service.name``; identifier.startTimestamp ->
  ``opencensus.starttime`` (RFC3339Nano); hostName -> ``host.name``; pid ->
  ``process.pid``; libraryInfo core/exporter version ->
  ``telemetry.sdk.version`` / ``opencensus.exporterversion``; language enum
  -> ``telemetry.sdk.language``; resource labels copied (``cloud.zone`` ->
  ``cloud.availability_zone``); resource type -> ``opencensus.resourcetype``.
- **typed attribute union** (``oc_to_traces.go:225-247``): string/int/bool/
  double branches -> canonical strings in our attrs map; an empty union ->
  ``<Unknown OpenCensus attribute value type>``.
- **kind** (``oc_to_traces.go:246-285``): SERVER/CLIENT are first-class;
  UNSPECIFIED falls back to a ``span.kind`` attr but ONLY the
  consumer/producer/internal values map (and are consumed) — "client"/
  "server" strings hit the default arm, leave UNSPECIFIED and KEEP the
  attr. Marshal (``traces_to_oc.go:236-250, 163-181``): SERVER/CLIENT to
  the field, consumer/producer/internal to the attr, unspecified neither.
- **status** (``oc_to_traces.go:169-195``): nil status -> code stays unset
  AND a ``status.code`` attr is NOT consumed; OC code 0 (OK) -> UNSET,
  anything else -> ERROR; a ``status.code`` attr (int) then overrides the
  code and is consumed. Marshal (``traces_to_oc.go:370-387``): UNSET ->
  OC OK without attr, OTLP OK -> OC OK + ``status.code``=1 attr (the
  distinguishing mark), ERROR -> OC code 2; message always carried.
- **sameProcessAsParentSpan** (``oc_to_traces.go:380-386``): wrapped bool ->
  ``opencensus.same_process_as_parent_span`` attr ("true"/"false").

Not carried by the flattened frame (as with the zipkin/jaeger modules):
tracestate entries, events/links (the frame is the transcript-turn span
analog; events would explode 1:N).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.zipkin import (
    RESOURCE_NO_SERVICE_NAME,
    SPAN_KIND_UNSPECIFIED,
)

UNKNOWN_OC_VALUE = "<Unknown OpenCensus attribute value type>"

# occommon.LibraryInfo_Language enum -> telemetry.sdk.language values
# (oc_to_resource.go:39-53)
OC_LANGUAGES = {
    1: "cpp", 2: "dotnet", 3: "erlang", 4: "go", 5: "java",
    6: "nodejs", 7: "php", 8: "python", 9: "ruby", 10: "webjs",
}

_ATTR_VAL = (
    "struct<stringValue: struct<value: string>, intValue: string,"
    " boolValue: boolean, doubleValue: double>"
)
_OC_SCHEMA = (
    "node struct<"
    " identifier: struct<hostName: string, pid: bigint, startTimestamp: string>,"
    " libraryInfo: struct<language: int, exporterVersion: string, coreLibraryVersion: string>,"
    " serviceInfo: struct<name: string>,"
    " attributes: map<string,string>>,"
    "resource struct<type: string, labels: map<string,string>>,"
    "spans array<struct<"
    " traceId: string, spanId: string, parentSpanId: string,"
    " name: struct<value: string>, kind: string,"
    " startTime: timestamp, endTime: timestamp,"
    f" attributes: struct<attributeMap: map<string,{_ATTR_VAL}>, droppedAttributesCount: int>,"
    " status: struct<code: int, message: string>,"
    " sameProcessAsParentSpan: boolean,"
    " resource: struct<type: string, labels: map<string,string>>>>"
)


def _oc_attr_to_string(v: Column) -> Column:
    """The typed-union stringify of oc_to_traces.go:225-247 (int64 travels
    as a string in proto-JSON; bool/double canonicalized like coerce.py)."""
    return F.coalesce(
        v["stringValue"]["value"],
        v["intValue"],
        F.when(v["boolValue"].isNotNull(), F.when(v["boolValue"], "true").otherwise("false")),
        # doubles stringify like Go strconv.FormatFloat(f,'f',-1,64): the
        # SHORTEST form, so integral values print BARE ("3", not "3.0") —
        # anything else breaks canonical_str matching (coerce.py) against
        # config literals (protospan_translation.go:73)
        F.when(
            v["doubleValue"].isNotNull(),
            F.when(
                v["doubleValue"] == v["doubleValue"].try_cast("bigint").cast("double"),
                v["doubleValue"].try_cast("bigint").cast("string"),
            ).otherwise(v["doubleValue"].cast("string")),
        ),
        F.lit(UNKNOWN_OC_VALUE),
    )


def _node_resource_attrs(node: Column, resource: Column) -> Column:
    """node+resource -> resource attr map (oc_to_resource.go:105-140).
    map_concat with later-wins overlay via map_from_entries of the union."""
    lang_map = F.create_map(
        *[x for code, s in OC_LANGUAGES.items() for x in (F.lit(code), F.lit(s))]
    )
    specials = F.filter(
        F.array(
            F.struct(F.lit("service.name").alias("key"),
                     node["serviceInfo"]["name"].alias("value")),
            F.struct(F.lit("opencensus.starttime").alias("key"),
                     node["identifier"]["startTimestamp"].alias("value")),
            F.struct(F.lit("host.name").alias("key"),
                     node["identifier"]["hostName"].alias("value")),
            F.struct(F.lit("process.pid").alias("key"),
                     F.when(node["identifier"]["pid"] != 0,
                            node["identifier"]["pid"].cast("string")).alias("value")),
            F.struct(F.lit("telemetry.sdk.version").alias("key"),
                     node["libraryInfo"]["coreLibraryVersion"].alias("value")),
            F.struct(F.lit("opencensus.exporterversion").alias("key"),
                     node["libraryInfo"]["exporterVersion"].alias("value")),
            F.struct(F.lit("telemetry.sdk.language").alias("key"),
                     lang_map[node["libraryInfo"]["language"]].alias("value")),
            F.struct(F.lit("opencensus.resourcetype").alias("key"),
                     F.when(resource["type"] != "", resource["type"]).alias("value")),
        ),
        lambda e: e["value"].isNotNull() & (e["value"] != ""),
    )
    # resource labels with the cloud.zone rename (oc_to_resource.go:128-133)
    labels = F.transform(
        F.map_entries(F.coalesce(resource["labels"], F.create_map())),
        lambda e: F.struct(
            F.when(e["key"] == "cloud.zone", F.lit("cloud.availability_zone"))
            .otherwise(e["key"])
            .alias("key"),
            e["value"].alias("value"),
        ),
    )
    node_attrs = F.map_entries(F.coalesce(node["attributes"], F.create_map()))
    # Go precedence: node attrs Inserted, specials Upserted OVER them,
    # labels Inserted only-if-absent (oc_to_resource.go:87-139) — i.e.
    # first-wins over [specials, node attrs, labels]. A fold keeps the
    # first value per key (the entry list is ~a dozen items per row).
    entries = F.concat(specials, node_attrs, labels)
    return F.aggregate(
        entries,
        F.create_map().cast("map<string,string>"),
        lambda acc, e: F.when(F.map_contains_key(acc, e["key"]), acc).otherwise(
            F.map_concat(acc, F.create_map(e["key"], e["value"]))
        ),
    )


def parse_oc_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal OC-batch JSON lines to the flattened span frame (+ a
    ``resource`` map column). One line = one batch; spans explode with the
    batch resource applied per oc_to_traces.go:47-119."""
    parsed = df.select(F.from_json(F.col(col), _OC_SCHEMA).alias("b"))
    sp = parsed.select(
        F.col("b.node").alias("node"),
        F.col("b.resource").alias("bres"),
        F.explode(F.coalesce(
            F.col("b.spans"),
            F.array().cast(
                # explode over an empty typed array keeps node-only batches out
                parsed.select(F.col("b.spans").alias("s")).schema["s"].dataType.simpleString()
            ),
        )).alias("s"),
    )
    amap = F.coalesce(
        F.col("s.attributes.attributeMap"),
        F.create_map().cast(f"map<string,{_ATTR_VAL}>"),
    )
    attrs = F.map_from_entries(
        F.transform(
            F.map_entries(amap),
            lambda e: F.struct(e["key"].alias("key"), _oc_attr_to_string(e["value"]).alias("value")),
        )
    )
    kind_field = F.when(F.col("s.kind") == "SERVER", 2).when(F.col("s.kind") == "CLIENT", 3)
    kind_attr_val = amap["span.kind"]["stringValue"]["value"]
    kind_from_attr = (
        F.when(kind_attr_val == "consumer", 5)
        .when(kind_attr_val == "producer", 4)
        .when(kind_attr_val == "internal", 1)
    )
    kind = F.coalesce(kind_field, kind_from_attr, F.lit(SPAN_KIND_UNSPECIFIED))
    # the span.kind attr is consumed ONLY when the fallback actually mapped
    consume_kind = kind_field.isNull() & kind_from_attr.isNotNull()

    has_status = F.col("s.status").isNotNull()
    oc_code = F.coalesce(F.col("s.status.code"), F.lit(0))
    # try_cast: jsonpb int64 travels as a string — an unparseable producer
    # value must drop THIS override (status falls back), not the job
    code_attr = amap["status.code"]["intValue"].try_cast("int")
    status_code = F.when(
        has_status, F.coalesce(code_attr, F.when(oc_code == 0, 0).otherwise(2))
    ).otherwise(F.lit(0))
    consume_code = has_status & code_attr.isNotNull()

    spaps = F.col("s.sameProcessAsParentSpan")
    attrs = F.when(
        spaps.isNotNull(),
        F.map_concat(
            F.map_filter(attrs, lambda k, _v: k != "opencensus.same_process_as_parent_span"),
            F.create_map(
                F.lit("opencensus.same_process_as_parent_span"),
                F.when(spaps, "true").otherwise("false"),
            ),
        ),
    ).otherwise(attrs)
    attrs = F.map_filter(
        attrs,
        lambda k, _v: ~(
            ((k == "span.kind") & consume_kind) | ((k == "status.code") & consume_code)
        ),
    )

    res = _node_resource_attrs(F.col("node"), F.coalesce(F.col("s.resource"), F.col("bres")))
    return sp.select(
        F.col("s.traceId").alias("trace_id"),
        F.col("s.spanId").alias("span_id"),
        F.when(F.col("s.parentSpanId") != "", F.col("s.parentSpanId")).alias("parent_span_id"),
        F.coalesce(F.col("s.name.value"), F.lit("")).alias("name"),
        kind.cast("int").alias("kind"),
        status_code.cast("int").alias("status_code"),
        F.when(has_status, F.coalesce(F.col("s.status.message"), F.lit("")))
        .otherwise(F.lit(""))
        .alias("status_message"),
        F.coalesce(res["service.name"], F.lit(RESOURCE_NO_SERVICE_NAME)).alias("service_name"),
        F.col("s.startTime").alias("ts"),
        (
            (F.unix_micros(F.col("s.endTime")) - F.unix_micros(F.col("s.startTime")))
        ).alias("duration_us"),
        attrs.alias("attrs"),
        res.alias("resource"),
    )


def to_oc_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Marshal the span frame to one single-span OC batch per line
    (traces_to_oc.go semantics; node carried only via resource-map keys).

    kind: SERVER/CLIENT -> the field; consumer/producer/internal -> the
    ``span.kind`` attr (:163-181, :236-250). status (statusToOC,
    traces_to_oc.go:370-387): UNSET -> OC OK, OTLP OK -> OC OK plus a
    ``status.code``=1 int attr (the distinguishing mark the parse side
    consumes back into code 1), ERROR -> OC code 2; message always
    carried.
    """
    def _sval(v):
        return F.struct(
            F.struct(v.alias("value")).alias("stringValue"),
            F.lit(None).cast("string").alias("intValue"),
        )

    typed = F.transform(
        F.map_entries(F.coalesce(F.col("attrs"), F.create_map())),
        lambda e: F.struct(e["key"].alias("key"), _sval(e["value"]).alias("value")),
    )
    kind_attr = (
        F.when(F.col("kind") == 5, "consumer")
        .when(F.col("kind") == 4, "producer")
        .when(F.col("kind") == 1, "internal")
    )
    # jsonpb int64 travels as a string; OTLP OK's marker attr is int 1
    ok_attr = F.when(F.col("status_code") == 1, F.lit("1"))
    typed = F.concat(
        typed,
        F.filter(
            F.array(
                F.struct(F.lit("span.kind").alias("key"), _sval(kind_attr).alias("value")),
                F.struct(
                    F.lit("status.code").alias("key"),
                    F.struct(
                        F.lit(None).cast("struct<value:string>").alias("stringValue"),
                        ok_attr.alias("intValue"),
                    ).alias("value"),
                ),
            ),
            lambda e: e["value"]["stringValue"]["value"].isNotNull()
            | e["value"]["intValue"].isNotNull(),
        ),
    )
    span = F.struct(
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
        F.coalesce(F.col("parent_span_id"), F.lit("")).alias("parentSpanId"),
        F.struct(F.col("name").alias("value")).alias("name"),
        F.when(F.col("kind") == 2, "SERVER")
        .when(F.col("kind") == 3, "CLIENT")
        .otherwise("SPAN_KIND_UNSPECIFIED")
        .alias("kind"),
        F.col("ts").alias("startTime"),
        F.timestamp_micros(F.unix_micros(F.col("ts")) + F.col("duration_us")).alias("endTime"),
        F.struct(F.map_from_entries(typed).alias("attributeMap")).alias("attributes"),
        F.struct(
            F.when(F.col("status_code") == 2, 2).otherwise(0).alias("code"),
            F.col("status_message").alias("message"),
        ).alias("status"),
    )
    batch = F.struct(
        F.struct(
            F.struct(
                F.when(
                    F.col("service_name") != RESOURCE_NO_SERVICE_NAME, F.col("service_name")
                ).alias("name")
            ).alias("serviceInfo")
        ).alias("node"),
        F.array(span).alias("spans"),
    )
    return df.select(F.to_json(batch, {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
                   # NTZ frames (parquet timestamp_ntz) use the separate option
                   "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"}).alias(out_col))


# ---------------------------------------------------------------------------
# metrics signal (translator/internaldata/oc_to_metrics.go / metrics_to_oc.go)
# ---------------------------------------------------------------------------

# MetricDescriptor_Type enum -> our datapoint-frame `kind`
# (descriptorTypeToMetrics, oc_to_metrics.go:170-202: cumulative scalars are
# MONOTONIC cumulative sums; distribution -> cumulative histogram; summary
# has no temporality)
OC_METRIC_KIND = {
    "GAUGE_INT64": "gauge",
    "GAUGE_DOUBLE": "gauge",
    "CUMULATIVE_INT64": "sum_cumulative_monotonic",
    "CUMULATIVE_DOUBLE": "sum_cumulative_monotonic",
    "CUMULATIVE_DISTRIBUTION": "histogram_cumulative",
    "SUMMARY": "summary",
}

_OC_METRICS_SCHEMA = (
    "node struct<"
    " identifier: struct<hostName: string, pid: bigint, startTimestamp: string>,"
    " libraryInfo: struct<language: int, exporterVersion: string, coreLibraryVersion: string>,"
    " serviceInfo: struct<name: string>,"
    " attributes: map<string,string>>,"
    "resource struct<type: string, labels: map<string,string>>,"
    "metrics array<struct<"
    " metricDescriptor: struct<name: string, description: string, unit: string,"
    "   type: string, labelKeys: array<struct<key: string>>>,"
    " timeseries: array<struct<"
    "   startTimestamp: timestamp,"
    "   labelValues: array<struct<value: string, hasValue: boolean>>,"
    "   points: array<struct<"
    "     timestamp: timestamp, int64Value: string, doubleValue: double,"
    "     distributionValue: struct<count: string, sum: double,"
    "       bucketOptions: struct<explicit: struct<bounds: array<double>>>,"
    "       buckets: array<struct<count: string>>>,"
    "     summaryValue: struct<count: struct<value: string>, sum: struct<value: double>,"
    "       snapshot: struct<percentileValues: array<struct<percentile: double, value: double>>>>"
    "   >>>>>>"
)


def parse_oc_metrics_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal OC metrics-batch JSON lines to one row per datapoint.

    Output frame: ``(metric, description, unit, kind, labels, start_ts, ts,
    value, bucket_counts, explicit_bounds, h_sum, h_count, quantiles,
    resource)`` — scalar points carry ``value`` (int64Value wins over
    doubleValue, matching the typed fill of oc_to_metrics.go:243-297);
    distributions carry the histogram columns (:299-330, :362-375);
    summaries carry ``quantiles`` + h_sum/h_count from the wrapped values
    (:331-360). Label maps pair ``labelKeys[i]`` with ``labelValues[i]``
    over the SHORTER of the two lists and skip entries with
    ``hasValue=false`` (fillLabelsMap, :221-241). Unknown descriptor types
    -> kind null (MetricDataTypeNone, :201) with the row kept for the
    refused-records taxonomy.
    """
    parsed = df.select(F.from_json(F.col(col), _OC_METRICS_SCHEMA).alias("b"))
    m = parsed.select(
        F.col("b.node").alias("node"),
        F.col("b.resource").alias("bres"),
        F.explode("b.metrics").alias("m"),
    )
    kind_map = F.create_map(
        *[x for t, k in OC_METRIC_KIND.items() for x in (F.lit(t), F.lit(k))]
    )
    keys = F.transform(
        F.coalesce(F.col("m.metricDescriptor.labelKeys"),
                   F.array().cast("array<struct<key:string>>")),
        lambda e: e["key"],
    )
    ts_ = m.select(
        F.col("m.metricDescriptor.name").alias("metric"),
        F.coalesce(F.col("m.metricDescriptor.description"), F.lit("")).alias("description"),
        F.coalesce(F.col("m.metricDescriptor.unit"), F.lit("")).alias("unit"),
        kind_map[F.col("m.metricDescriptor.type")].alias("kind"),
        keys.alias("_keys"),
        F.col("node").alias("node"),
        F.col("bres").alias("bres"),
        F.explode("m.timeseries").alias("t"),
    )
    # min(len(keys), len(values)) pairing with hasValue gating; the paired
    # slices go through map_from_arrays (null values allowed) and the
    # hasValue=false entries are dropped by map_filter — struct-building
    # inside HOF lambdas loses field aliases, so no entry structs here
    n_pairs = F.greatest(F.least(F.size("_keys"), F.size("t.labelValues")), F.lit(0))
    ks = F.slice(F.col("_keys"), 1, n_pairs)
    vs = F.transform(
        F.slice(F.col("t.labelValues"), 1, n_pairs),
        lambda v: F.when(v["hasValue"], v["value"]),
    )
    labels = F.map_filter(F.map_from_arrays(ks, vs), lambda _k, v: v.isNotNull())
    pt = ts_.select(
        "metric", "description", "unit", "kind",
        labels.alias("labels"),
        F.col("t.startTimestamp").alias("start_ts"),
        F.col("node").alias("node"),
        F.col("bres").alias("bres"),
        F.explode("t.points").alias("p"),
    )
    dist = F.col("p.distributionValue")
    summ = F.col("p.summaryValue")
    res = _node_resource_attrs(F.col("node"), F.col("bres"))
    return pt.select(
        "metric", "description", "unit", "kind", "labels", "start_ts",
        F.col("p.timestamp").alias("ts"),
        F.coalesce(
            F.col("p.int64Value").try_cast("double"), F.col("p.doubleValue")
        ).alias("value"),
        F.when(
            dist.isNotNull(),
            F.transform(F.coalesce(dist["buckets"],
                                   F.array().cast("array<struct<count:string>>")),
                        lambda b: F.coalesce(b["count"].try_cast("bigint"), F.lit(0))),
        ).alias("bucket_counts"),
        F.when(dist.isNotNull(), dist["bucketOptions"]["explicit"]["bounds"]).alias(
            "explicit_bounds"
        ),
        F.coalesce(dist["sum"], summ["sum"]["value"]).alias("h_sum"),
        F.coalesce(dist["count"].try_cast("bigint"), summ["count"]["value"].try_cast("bigint")).alias(
            "h_count"
        ),
        F.when(summ.isNotNull(), summ["snapshot"]["percentileValues"]).alias("quantiles"),
        res.alias("resource"),
    )


def to_oc_metrics_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Marshal a scalar datapoint frame ``(metric, labels, value, ts[,
    start_ts, kind, service_name])`` to one single-point OC batch per line
    (metrics_to_oc.go scalar path). Gauges emit GAUGE_DOUBLE; cumulative
    monotonic sums emit CUMULATIVE_DOUBLE; label keys are emitted sorted so
    the descriptor's key order is deterministic, every value hasValue=true.
    """
    kind = F.coalesce(F.col("kind") if "kind" in df.columns else F.lit(None), F.lit("gauge"))
    entries = F.array_sort(F.map_entries(F.coalesce(F.col("labels"), F.create_map())))
    desc = F.struct(
        F.col("metric").alias("name"),
        F.when(kind == "gauge", "GAUGE_DOUBLE")
        .otherwise("CUMULATIVE_DOUBLE")
        .alias("type"),
        F.transform(entries, lambda e: F.struct(e["key"].alias("key"))).alias("labelKeys"),
    )
    series = F.struct(
        (F.col("start_ts") if "start_ts" in df.columns else F.col("ts")).alias("startTimestamp"),
        F.transform(
            entries,
            lambda e: F.struct(e["value"].alias("value"), F.lit(True).alias("hasValue")),
        ).alias("labelValues"),
        F.array(
            F.struct(F.col("ts").alias("timestamp"),
                     F.col("value").cast("double").alias("doubleValue"))
        ).alias("points"),
    )
    batch = F.struct(
        F.struct(
            F.struct(
                (F.col("service_name") if "service_name" in df.columns else F.lit(None).cast("string")).alias("name")
            ).alias("serviceInfo")
        ).alias("node"),
        F.array(F.struct(desc.alias("metricDescriptor"),
                         F.array(series).alias("timeseries"))).alias("metrics"),
    )
    return df.select(
        F.to_json(batch, {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
                   # NTZ frames (parquet timestamp_ntz) use the separate option
                   "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"}).alias(out_col)
    )
