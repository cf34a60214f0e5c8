"""OTLP-JSON metrics envelope codec: the resourceMetrics nesting.

Third member of the OTLP-JSON codec family (logs: codecs.to_otlp_json,
traces: otlp_trace.py) — the reference marshals all three signals through
one jsonpb marshaler (model/otlp/json_marshaler.go:31-34,55-58). This is
the v0.5-era metrics proto the reference vendors
(model/internal/data/protogen/metrics/v1/metrics.pb.go): the `data` oneof
is per-VALUE-TYPE (intGauge/doubleGauge/intSum/doubleSum/...), datapoint
labels are flat StringKeyValue pairs (not typed attributes), and:

- the oneof renders as exactly one camelCase member ("doubleGauge":{...})
  — absent members never appear (jsonpb oneof);
- fixed64 nanos are strings; like the logs envelope, epoch-0 ships as
  an explicit "0" (deviation from jsonpb zero-omission so NULL ts and
  epoch-0 stay distinguishable on roundtrip); startTimeUnixNano stays
  unspecified (omitted) for our scalar frame, like the OC translator's
  gauge path (translator/internaldata/oc_to_metrics.go);
- `value` is a float64 with omit-empty (metrics.pb.go:1008-1009): a 0.0
  datapoint ships with NO value member and must read back as 0.0;
- DoubleSum carries aggregationTemporality as the enum NAME and
  isMonotonic only when true (metrics.pb.go:662-669);
- ResourceMetrics.Resource is non-nullable (metrics.pb.go:127
  `json:"resource"`): an empty resource still marshals as "resource":{}.

Wire-format note: Spark's to_json renders integral doubles as "123.0"
where Go's encoding/json emits "123" — byte-different, value-identical;
the parse side (both ours and jsonpb) accepts either, and the roundtrip
is value-checked by q73 against the q49 oracle derivation.

Input/output frame is the OC metrics codec's scalar shape (metric string,
labels map<string,string>, value double, ts timestamp, kind in
{"gauge", "sum_cumulative_monotonic"}), so the two wires are
interchangeable ends of the same pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from opentelemetry_collector_spark.sources.codecs import _LIB_NAME, _nanos, kv_first_occurrence

__all__ = [
    "to_otlp_metrics_json",
    "parse_otlp_metrics_json",
    "to_otlp_int_metrics_json",
    "parse_otlp_int_metrics_json",
    "to_otlp_histograms_json",
    "parse_otlp_histograms_json",
    "to_otlp_summaries_json",
    "parse_otlp_summaries_json",
]

_TEMPORALITY_CUMULATIVE = "AGGREGATION_TEMPORALITY_CUMULATIVE"


def _envelope(metric: Column) -> Column:
    """One resourceMetrics envelope around a single Metric message: empty
    non-nullable resource ("resource":{}, metrics.pb.go:127), one
    instrumentationLibraryMetrics entry carrying our library name — the
    shared outer nesting of every metrics marshaler here."""
    return F.struct(
        F.array(
            F.struct(
                F.struct(
                    F.lit(None)
                    .cast("array<struct<key:string,value:struct<stringValue:string>>>")
                    .alias("attributes")
                ).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(F.lit(_LIB_NAME).alias("name")).alias("instrumentationLibrary"),
                        F.array(metric).alias("metrics"),
                    )
                ).alias("instrumentationLibraryMetrics"),
            )
        ).alias("resourceMetrics")
    )


def _sorted_labels() -> Column:
    """labels map -> array_sort'ed StringKeyValue structs (flat v0.5 labels,
    not typed attributes)."""
    return F.array_sort(
        F.transform(
            F.map_entries(F.col("labels")),
            lambda kv: F.struct(kv["key"].alias("key"), kv["value"].alias("value")),
        )
    )


def to_otlp_metrics_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Marshal the scalar datapoint frame to one OTLP-JSON envelope per
    (metric, kind) — one Metric message carrying all its datapoints, the
    grouping the OTLP exporter hands to a push in practice. Single
    groupBy shuffle; datapoints array_sort'ed on (time, labels, value) so
    marshal is deterministic at any parallelism. Pure JVM projection.
    """
    nanos = _nanos(F.col("ts"))
    labels = _sorted_labels()
    dp = F.struct(
        # _ord leads for array_sort; labels serialized for a total order
        F.struct(nanos.alias("n"), F.to_json(labels).alias("l"), F.col("value").alias("v")).alias(
            "_ord"
        ),
        F.when(F.size(labels) > 0, labels).alias("labels"),
        # like the logs envelope, epoch-0 ships as "0" (NULL ts stays
        # omitted -> NULL) so the two stay distinguishable on roundtrip
        nanos.cast("string").alias("timeUnixNano"),
        # float64 omit-empty: a 0.0 value ships with no member at all
        F.when(F.col("value") != 0.0, F.col("value")).alias("value"),
    )
    grouped = df.groupBy("metric", "kind").agg(
        F.array_sort(F.collect_list(dp)).alias("dps")
    )
    dps = F.transform(F.col("dps"), lambda d: d.dropFields("_ord"))
    metric = F.struct(
        F.col("metric").alias("name"),
        F.when(F.col("kind") == "gauge", F.struct(dps.alias("dataPoints"))).alias("doubleGauge"),
        F.when(
            F.col("kind") == "sum_cumulative_monotonic",
            F.struct(
                dps.alias("dataPoints"),
                F.lit(_TEMPORALITY_CUMULATIVE).alias("aggregationTemporality"),
                F.lit(True).alias("isMonotonic"),
            ),
        ).alias("doubleSum"),
    )
    return grouped.select(F.to_json(_envelope(metric)).alias(out_col))


_LABEL_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("value", StringType())]
)

_DP_SCHEMA = StructType(
    [
        StructField("labels", ArrayType(_LABEL_SCHEMA)),
        StructField("startTimeUnixNano", StringType()),
        StructField("timeUnixNano", StringType()),
        StructField("value", DoubleType()),
    ]
)

_METRIC_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("doubleGauge", StructType([StructField("dataPoints", ArrayType(_DP_SCHEMA))])),
        StructField(
            "doubleSum",
            StructType(
                [
                    StructField("dataPoints", ArrayType(_DP_SCHEMA)),
                    StructField("aggregationTemporality", StringType()),
                    StructField("isMonotonic", BooleanType()),
                ]
            ),
        ),
    ]
)

_METRICS_SCHEMA = StructType(
    [
        StructField(
            "resourceMetrics",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "instrumentationLibraryMetrics",
                            ArrayType(
                                StructType(
                                    [
                                        StructField(
                                            "instrumentationLibrary",
                                            StructType([StructField("name", StringType())]),
                                        ),
                                        StructField("metrics", ArrayType(_METRIC_SCHEMA)),
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def _label_map(entries: Column) -> Column:
    """StringKeyValue list -> map, first occurrence wins, null keys dropped
    (pdata StringMap semantics; codecs.kv_first_occurrence, the junk policy
    shared with the logs/trace parsers)."""
    clean = kv_first_occurrence(F.coalesce(entries, F.array().cast(ArrayType(_LABEL_SCHEMA))))
    return F.map_from_entries(F.transform(clean, lambda kv: F.struct(kv["key"], kv["value"])))


def parse_otlp_metrics_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal OTLP-JSON metric envelopes back to the scalar frame:
    resourceMetrics -> instrumentationLibraryMetrics -> metrics ->
    dataPoints explode, oneof member decides the kind. Junk degrades
    per-row: unparseable envelopes vanish, non-numeric nanos become a NULL
    ts, a missing value member reads back as the omitted 0.0. A metric
    with NO recognized oneof member is dropped entirely (its dataPoints
    are unreadable, so explode emits nothing); only a recognized member
    with unrecognized semantics (e.g. a DELTA or non-monotonic doubleSum)
    yields rows with a NULL kind.
    """
    parsed = df.select(F.from_json(F.col(col), _METRICS_SCHEMA).alias("env"))
    rm = parsed.select(F.explode("env.resourceMetrics").alias("rm"))
    ilm = rm.select(F.explode("rm.instrumentationLibraryMetrics").alias("ilm"))
    m = ilm.select(F.explode("ilm.metrics").alias("m"))
    is_gauge = F.col("m.doubleGauge").isNotNull()
    is_mono_sum = (
        F.col("m.doubleSum").isNotNull()
        & (F.col("m.doubleSum.aggregationTemporality") == _TEMPORALITY_CUMULATIVE)
        & F.col("m.doubleSum.isMonotonic")
    )
    kind = (
        F.when(is_gauge, F.lit("gauge"))
        .when(is_mono_sum, F.lit("sum_cumulative_monotonic"))
        .otherwise(F.lit(None).cast("string"))
    )
    dps = F.coalesce(F.col("m.doubleGauge.dataPoints"), F.col("m.doubleSum.dataPoints"))
    rows = m.select(
        F.col("m.name").alias("metric"),
        kind.alias("kind"),
        F.explode(dps).alias("dp"),
    )
    # decimal, not bigint: int64 nanos exceed double's 53-bit mantissa
    # (same fix as otlp_trace.parse_otlp_traces_json)
    t = F.col("dp.timeUnixNano").try_cast("decimal(20,0)")
    return rows.select(
        "metric",
        "kind",
        _label_map(F.col("dp.labels")).alias("labels"),
        F.coalesce(F.col("dp.value"), F.lit(0.0)).alias("value"),
        F.timestamp_micros(F.floor(t / 1000).cast("bigint")).alias("ts"),
    )


# --- DoubleHistogram member (metrics.pb.go:1237-1280) -----------------------
#
# The fourth oneof member our pipelines produce (aggregate.bucket_index +
# histogram_merge build exactly this datapoint): explicit-bounds histograms.
# jsonpb rules on top of the scalar codec's:
# - count and each bucketCounts element are fixed64 -> STRINGS; count 0 is
#   omitted (reads back 0), empty/absent bucketCounts are indistinguishable
#   on the wire (jsonpb omits empty repeated fields) and read back NULL —
#   histogram_merge's posexplode_outer already treats NULL counts as
#   "scalars only", so the asymmetry is benign downstream;
# - sum is float64 omit-empty like `value` (0.0 ships memberless);
# - explicitBounds is []float64, omitted when empty;
# - startTimeUnixNano stays unspecified like the scalar path.

_HIST_FRAME_COLS = [
    "metric",
    "labels",
    "ts",
    "bucket_counts",
    "explicit_bounds",
    "h_sum",
    "h_count",
]


def to_otlp_histograms_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Marshal the histogram datapoint frame (metric, labels
    map<string,string>, ts, bucket_counts array<bigint>, explicit_bounds
    array<double>, h_sum, h_count) to one OTLP-JSON envelope per metric —
    the doubleHistogram oneof member, cumulative temporality. Single
    groupBy shuffle; datapoints array_sort'ed on (time, labels, count,
    sum, counts-json) so marshal is deterministic at any parallelism.
    Pure JVM projection."""
    nanos = _nanos(F.col("ts"))
    labels = _sorted_labels()
    counts_str = F.transform(F.col("bucket_counts"), lambda c: c.cast("string"))
    dp = F.struct(
        F.struct(
            nanos.alias("n"),
            F.to_json(labels).alias("l"),
            F.col("h_count").alias("c"),
            F.col("h_sum").alias("s"),
            F.to_json(counts_str).alias("b"),
        ).alias("_ord"),
        F.when(F.size(labels) > 0, labels).alias("labels"),
        nanos.cast("string").alias("timeUnixNano"),
        # fixed64 omit-zero: count 0 ships memberless and reads back 0
        F.when(F.col("h_count") != 0, F.col("h_count").cast("string")).alias("count"),
        F.when(F.col("h_sum") != 0.0, F.col("h_sum")).alias("sum"),
        F.when(F.size(counts_str) > 0, counts_str).alias("bucketCounts"),
        F.when(F.size(F.col("explicit_bounds")) > 0, F.col("explicit_bounds")).alias(
            "explicitBounds"
        ),
    )
    grouped = df.groupBy("metric").agg(F.array_sort(F.collect_list(dp)).alias("dps"))
    dps = F.transform(F.col("dps"), lambda d: d.dropFields("_ord"))
    metric = F.struct(
        F.col("metric").alias("name"),
        F.struct(
            dps.alias("dataPoints"),
            F.lit(_TEMPORALITY_CUMULATIVE).alias("aggregationTemporality"),
        ).alias("doubleHistogram"),
    )
    return grouped.select(F.to_json(_envelope(metric)).alias(out_col))


_HDP_SCHEMA = StructType(
    [
        StructField("labels", ArrayType(_LABEL_SCHEMA)),
        StructField("startTimeUnixNano", StringType()),
        StructField("timeUnixNano", StringType()),
        StructField("count", StringType()),
        StructField("sum", DoubleType()),
        StructField("bucketCounts", ArrayType(StringType())),
        StructField("explicitBounds", ArrayType(DoubleType())),
    ]
)

_HIST_SCHEMA = StructType(
    [
        StructField(
            "resourceMetrics",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "instrumentationLibraryMetrics",
                            ArrayType(
                                StructType(
                                    [
                                        StructField(
                                            "metrics",
                                            ArrayType(
                                                StructType(
                                                    [
                                                        StructField("name", StringType()),
                                                        StructField(
                                                            "doubleHistogram",
                                                            StructType(
                                                                [
                                                                    StructField(
                                                                        "dataPoints",
                                                                        ArrayType(_HDP_SCHEMA),
                                                                    ),
                                                                    StructField(
                                                                        "aggregationTemporality",
                                                                        StringType(),
                                                                    ),
                                                                ]
                                                            ),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        )
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def parse_otlp_histograms_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal doubleHistogram envelopes back to the histogram frame
    (plus the raw ``temporality`` enum name so callers can gate on
    CUMULATIVE like the doubleSum path). Junk degrades per-row:
    unparseable envelopes vanish, metrics without a doubleHistogram member
    explode to nothing, a non-numeric count or bucket element try_casts to
    NULL (the omitted count reads back 0), and NULL/omitted bucketCounts
    stay NULL — histogram_merge's posexplode_outer treats those datapoints
    as scalar-only, which is what an empty repeated field means."""
    parsed = df.select(F.from_json(F.col(col), _HIST_SCHEMA).alias("env"))
    rm = parsed.select(F.explode("env.resourceMetrics").alias("rm"))
    ilm = rm.select(F.explode("rm.instrumentationLibraryMetrics").alias("ilm"))
    m = ilm.select(F.explode("ilm.metrics").alias("m")).filter(
        F.col("m.doubleHistogram").isNotNull()
    )
    rows = m.select(
        F.col("m.name").alias("metric"),
        F.col("m.doubleHistogram.aggregationTemporality").alias("temporality"),
        F.explode("m.doubleHistogram.dataPoints").alias("dp"),
    )
    t = F.col("dp.timeUnixNano").try_cast("decimal(20,0)")
    return rows.select(
        "metric",
        "temporality",
        _label_map(F.col("dp.labels")).alias("labels"),
        F.timestamp_micros(F.floor(t / 1000).cast("bigint")).alias("ts"),
        F.transform(F.col("dp.bucketCounts"), lambda c: c.try_cast("bigint")).alias(
            "bucket_counts"
        ),
        F.col("dp.explicitBounds").alias("explicit_bounds"),
        F.coalesce(F.col("dp.sum"), F.lit(0.0)).alias("h_sum"),
        F.coalesce(F.col("dp.count").try_cast("bigint"), F.lit(0)).alias("h_count"),
    )


# --- IntGauge / IntSum members (metrics.pb.go:498-604, IntDataPoint :889-914)
#
# The v0.5 data model types the VALUE into the oneof member: integer scalars
# travel as intGauge/intSum whose IntDataPoint.value is an sfixed64 int64 —
# jsonpb renders every 64-bit integer as a STRING, and omit-empty drops a 0
# (reads back 0). This keeps int64 counters exact beyond double's 53-bit
# mantissa, which is the entire reason the int members exist
# (model/pdata/metrics.go:129-141 keeps IntGauge/IntSum distinct pdata types).


def to_otlp_int_metrics_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Marshal the INTEGER scalar datapoint frame (metric, labels
    map<string,string>, value bigint, ts, kind in {"gauge",
    "sum_cumulative_monotonic"}) to one OTLP-JSON envelope per
    (metric, kind) — the intGauge/intSum oneof members. Same single-shuffle
    deterministic marshal as the double codec; value rides as a jsonpb
    int64 string with omit-zero. Pure JVM projection."""
    nanos = _nanos(F.col("ts"))
    labels = _sorted_labels()
    dp = F.struct(
        F.struct(nanos.alias("n"), F.to_json(labels).alias("l"), F.col("value").alias("v")).alias(
            "_ord"
        ),
        F.when(F.size(labels) > 0, labels).alias("labels"),
        nanos.cast("string").alias("timeUnixNano"),
        # sfixed64 int64 -> jsonpb STRING; omit-zero ships 0 memberless
        F.when(F.col("value") != 0, F.col("value").cast("string")).alias("value"),
    )
    grouped = df.groupBy("metric", "kind").agg(
        F.array_sort(F.collect_list(dp)).alias("dps")
    )
    dps = F.transform(F.col("dps"), lambda d: d.dropFields("_ord"))
    metric = F.struct(
        F.col("metric").alias("name"),
        F.when(F.col("kind") == "gauge", F.struct(dps.alias("dataPoints"))).alias("intGauge"),
        F.when(
            F.col("kind") == "sum_cumulative_monotonic",
            F.struct(
                dps.alias("dataPoints"),
                F.lit(_TEMPORALITY_CUMULATIVE).alias("aggregationTemporality"),
                F.lit(True).alias("isMonotonic"),
            ),
        ).alias("intSum"),
    )
    return grouped.select(F.to_json(_envelope(metric)).alias(out_col))


_IDP_SCHEMA = StructType(
    [
        StructField("labels", ArrayType(_LABEL_SCHEMA)),
        StructField("startTimeUnixNano", StringType()),
        StructField("timeUnixNano", StringType()),
        StructField("value", StringType()),
    ]
)

_INT_METRIC_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("intGauge", StructType([StructField("dataPoints", ArrayType(_IDP_SCHEMA))])),
        StructField(
            "intSum",
            StructType(
                [
                    StructField("dataPoints", ArrayType(_IDP_SCHEMA)),
                    StructField("aggregationTemporality", StringType()),
                    StructField("isMonotonic", BooleanType()),
                ]
            ),
        ),
    ]
)

_INT_METRICS_SCHEMA = StructType(
    [
        StructField(
            "resourceMetrics",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "instrumentationLibraryMetrics",
                            ArrayType(
                                StructType(
                                    [StructField("metrics", ArrayType(_INT_METRIC_SCHEMA))]
                                )
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def parse_otlp_int_metrics_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal intGauge/intSum envelopes back to the integer scalar frame.
    Junk degrades per-row like the double parser: unparseable envelopes
    vanish, metrics with neither int member explode to nothing, a
    non-numeric value string try_casts to NULL (distinguishable from the
    omitted 0, which reads back 0), non-numeric nanos -> NULL ts, and a
    DELTA or non-monotonic intSum keeps its rows with a NULL kind."""
    parsed = df.select(F.from_json(F.col(col), _INT_METRICS_SCHEMA).alias("env"))
    rm = parsed.select(F.explode("env.resourceMetrics").alias("rm"))
    ilm = rm.select(F.explode("rm.instrumentationLibraryMetrics").alias("ilm"))
    m = ilm.select(F.explode("ilm.metrics").alias("m"))
    is_gauge = F.col("m.intGauge").isNotNull()
    is_mono_sum = (
        F.col("m.intSum").isNotNull()
        & (F.col("m.intSum.aggregationTemporality") == _TEMPORALITY_CUMULATIVE)
        & F.col("m.intSum.isMonotonic")
    )
    kind = (
        F.when(is_gauge, F.lit("gauge"))
        .when(is_mono_sum, F.lit("sum_cumulative_monotonic"))
        .otherwise(F.lit(None).cast("string"))
    )
    dps = F.coalesce(F.col("m.intGauge.dataPoints"), F.col("m.intSum.dataPoints"))
    rows = m.select(
        F.col("m.name").alias("metric"),
        kind.alias("kind"),
        F.explode(dps).alias("dp"),
    )
    t = F.col("dp.timeUnixNano").try_cast("decimal(20,0)")
    return rows.select(
        "metric",
        "kind",
        _label_map(F.col("dp.labels")).alias("labels"),
        F.when(F.col("dp.value").isNull(), F.lit(0))
        .otherwise(F.col("dp.value").try_cast("bigint"))
        .alias("value"),
        F.timestamp_micros(F.floor(t / 1000).cast("bigint")).alias("ts"),
    )


# --- DoubleSummary member (metrics.pb.go:843-844, datapoint :1385-1413,
#     ValueAtQuantile :1499-1504) ---------------------------------------------
#
# The last oneof member: pre-aggregated quantile summaries. Datapoint wire
# rules on top of the scalar codec's: count is fixed64 -> STRING omit-zero,
# sum is float64 omit-empty, quantileValues is a repeated
# {quantile, value} (both float64 omit-empty — a 0.0 quantile, i.e. the
# minimum, legitimately ships memberless and reads back 0.0), omitted
# entirely when empty. Quantiles live in [0,1] in this model; the OC wire's
# percentiles are /100 on translation (oc_to_metrics.go:386), which is the
# caller's job, not this codec's.


def to_otlp_summaries_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Marshal the summary datapoint frame (metric, labels
    map<string,string>, ts, h_sum double, h_count bigint, quantiles
    array<struct<quantile:double,value:double>>) to one OTLP-JSON envelope
    per metric — the doubleSummary oneof member. Single groupBy shuffle;
    datapoints array_sort'ed on (time, labels, count, sum, quantiles-json)
    so marshal is deterministic at any parallelism. Pure JVM projection."""
    nanos = _nanos(F.col("ts"))
    labels = _sorted_labels()
    qvs = F.transform(
        F.col("quantiles"),
        lambda q: F.struct(
            F.when(q["quantile"] != 0.0, q["quantile"]).alias("quantile"),
            F.when(q["value"] != 0.0, q["value"]).alias("value"),
        ),
    )
    dp = F.struct(
        F.struct(
            nanos.alias("n"),
            F.to_json(labels).alias("l"),
            F.col("h_count").alias("c"),
            F.col("h_sum").alias("s"),
            F.to_json(F.col("quantiles")).alias("q"),
        ).alias("_ord"),
        F.when(F.size(labels) > 0, labels).alias("labels"),
        nanos.cast("string").alias("timeUnixNano"),
        F.when(F.col("h_count") != 0, F.col("h_count").cast("string")).alias("count"),
        F.when(F.col("h_sum") != 0.0, F.col("h_sum")).alias("sum"),
        F.when(F.size(qvs) > 0, qvs).alias("quantileValues"),
    )
    grouped = df.groupBy("metric").agg(F.array_sort(F.collect_list(dp)).alias("dps"))
    dps = F.transform(F.col("dps"), lambda d: d.dropFields("_ord"))
    metric = F.struct(
        F.col("metric").alias("name"),
        F.struct(dps.alias("dataPoints")).alias("doubleSummary"),
    )
    return grouped.select(F.to_json(_envelope(metric)).alias(out_col))


_QV_SCHEMA = StructType(
    [StructField("quantile", DoubleType()), StructField("value", DoubleType())]
)

_SDP_SCHEMA = StructType(
    [
        StructField("labels", ArrayType(_LABEL_SCHEMA)),
        StructField("startTimeUnixNano", StringType()),
        StructField("timeUnixNano", StringType()),
        StructField("count", StringType()),
        StructField("sum", DoubleType()),
        StructField("quantileValues", ArrayType(_QV_SCHEMA)),
    ]
)

_SUMMARY_SCHEMA = StructType(
    [
        StructField(
            "resourceMetrics",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "instrumentationLibraryMetrics",
                            ArrayType(
                                StructType(
                                    [
                                        StructField(
                                            "metrics",
                                            ArrayType(
                                                StructType(
                                                    [
                                                        StructField("name", StringType()),
                                                        StructField(
                                                            "doubleSummary",
                                                            StructType(
                                                                [
                                                                    StructField(
                                                                        "dataPoints",
                                                                        ArrayType(_SDP_SCHEMA),
                                                                    )
                                                                ]
                                                            ),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        )
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def parse_otlp_summaries_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal doubleSummary envelopes back to the summary frame. Junk
    degrades per-row: unparseable envelopes vanish, metrics without a
    doubleSummary member explode to nothing, a non-numeric count try_casts
    to NULL (the omitted count reads back 0), omitted sum reads back 0.0,
    and each quantileValues element's omitted members read back 0.0 while
    an absent/empty list stays NULL (jsonpb can't tell empty from absent)."""
    parsed = df.select(F.from_json(F.col(col), _SUMMARY_SCHEMA).alias("env"))
    rm = parsed.select(F.explode("env.resourceMetrics").alias("rm"))
    ilm = rm.select(F.explode("rm.instrumentationLibraryMetrics").alias("ilm"))
    m = ilm.select(F.explode("ilm.metrics").alias("m")).filter(
        F.col("m.doubleSummary").isNotNull()
    )
    rows = m.select(
        F.col("m.name").alias("metric"),
        F.explode("m.doubleSummary.dataPoints").alias("dp"),
    )
    t = F.col("dp.timeUnixNano").try_cast("decimal(20,0)")
    qvs = F.transform(
        F.col("dp.quantileValues"),
        lambda q: F.struct(
            F.coalesce(q["quantile"], F.lit(0.0)).alias("quantile"),
            F.coalesce(q["value"], F.lit(0.0)).alias("value"),
        ),
    )
    return rows.select(
        "metric",
        _label_map(F.col("dp.labels")).alias("labels"),
        F.timestamp_micros(F.floor(t / 1000).cast("bigint")).alias("ts"),
        F.coalesce(F.col("dp.sum"), F.lit(0.0)).alias("h_sum"),
        # omitted count reads back 0; a PRESENT non-numeric one stays NULL
        F.when(F.col("dp.count").isNull(), F.lit(0))
        .otherwise(F.col("dp.count").try_cast("bigint"))
        .alias("h_count"),
        qvs.alias("quantiles"),
    )


# --- IntHistogram member (metric oneof field 8; IntHistogram
#     metrics.pb.go:727-732, IntHistogramDataPoint :1087-1124) ---------------
#
# The seventh and last pdata metric data type (model/pdata/metrics.go:138
# MetricDataTypeIntHistogram; oneof arm Metric_IntHistogram
# metrics.pb.go:381-382). Identical bucket dialect to doubleHistogram with
# ONE wire difference: the datapoint sum is an sfixed64 int64
# (metrics.pb.go:1115 `Sum int64 protobuf:"fixed64,5"`), so like the
# intGauge/intSum scalars it rides jsonpb as an int64 STRING with
# omit-zero and stays exact beyond double's 53-bit mantissa — the reason
# the int member exists. explicit_bounds stay float64 (:1124).


def to_otlp_int_histograms_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Marshal the INT histogram datapoint frame (metric, labels
    map<string,string>, ts, bucket_counts array<bigint>, explicit_bounds
    array<double>, h_sum bigint, h_count bigint) to one OTLP-JSON envelope
    per metric — the intHistogram oneof member, cumulative temporality.
    Same single-shuffle deterministic marshal as the double codec; the
    int64 sum rides as a jsonpb string with omit-zero. Pure JVM
    projection."""
    nanos = _nanos(F.col("ts"))
    labels = _sorted_labels()
    counts_str = F.transform(F.col("bucket_counts"), lambda c: c.cast("string"))
    dp = F.struct(
        F.struct(
            nanos.alias("n"),
            F.to_json(labels).alias("l"),
            F.col("h_count").alias("c"),
            F.col("h_sum").alias("s"),
            F.to_json(counts_str).alias("b"),
        ).alias("_ord"),
        F.when(F.size(labels) > 0, labels).alias("labels"),
        nanos.cast("string").alias("timeUnixNano"),
        F.when(F.col("h_count") != 0, F.col("h_count").cast("string")).alias("count"),
        # sfixed64 int64 -> jsonpb STRING; omit-zero ships 0 memberless
        F.when(F.col("h_sum") != 0, F.col("h_sum").cast("string")).alias("sum"),
        F.when(F.size(counts_str) > 0, counts_str).alias("bucketCounts"),
        F.when(F.size(F.col("explicit_bounds")) > 0, F.col("explicit_bounds")).alias(
            "explicitBounds"
        ),
    )
    grouped = df.groupBy("metric").agg(F.array_sort(F.collect_list(dp)).alias("dps"))
    dps = F.transform(F.col("dps"), lambda d: d.dropFields("_ord"))
    metric = F.struct(
        F.col("metric").alias("name"),
        F.struct(
            dps.alias("dataPoints"),
            F.lit(_TEMPORALITY_CUMULATIVE).alias("aggregationTemporality"),
        ).alias("intHistogram"),
    )
    return grouped.select(F.to_json(_envelope(metric)).alias(out_col))


_IHDP_SCHEMA = StructType(
    [
        StructField("labels", ArrayType(_LABEL_SCHEMA)),
        StructField("startTimeUnixNano", StringType()),
        StructField("timeUnixNano", StringType()),
        StructField("count", StringType()),
        StructField("sum", StringType()),
        StructField("bucketCounts", ArrayType(StringType())),
        StructField("explicitBounds", ArrayType(DoubleType())),
    ]
)

_INT_HIST_SCHEMA = StructType(
    [
        StructField(
            "resourceMetrics",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "instrumentationLibraryMetrics",
                            ArrayType(
                                StructType(
                                    [
                                        StructField(
                                            "metrics",
                                            ArrayType(
                                                StructType(
                                                    [
                                                        StructField("name", StringType()),
                                                        StructField(
                                                            "intHistogram",
                                                            StructType(
                                                                [
                                                                    StructField(
                                                                        "dataPoints",
                                                                        ArrayType(_IHDP_SCHEMA),
                                                                    ),
                                                                    StructField(
                                                                        "aggregationTemporality",
                                                                        StringType(),
                                                                    ),
                                                                ]
                                                            ),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        )
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def parse_otlp_int_histograms_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Unmarshal intHistogram envelopes back to the INT histogram frame.
    Junk degrades per-row exactly like the double parser, with the int
    twist: a non-numeric sum string try_casts to NULL while the omitted
    sum reads back 0 (the omit-zero contract), and the value survives
    bigint-exact — no double mantissa on the path."""
    parsed = df.select(F.from_json(F.col(col), _INT_HIST_SCHEMA).alias("env"))
    rm = parsed.select(F.explode("env.resourceMetrics").alias("rm"))
    ilm = rm.select(F.explode("rm.instrumentationLibraryMetrics").alias("ilm"))
    m = ilm.select(F.explode("ilm.metrics").alias("m")).filter(
        F.col("m.intHistogram").isNotNull()
    )
    rows = m.select(
        F.col("m.name").alias("metric"),
        F.col("m.intHistogram.aggregationTemporality").alias("temporality"),
        F.explode("m.intHistogram.dataPoints").alias("dp"),
    )
    t = F.col("dp.timeUnixNano").try_cast("decimal(20,0)")
    return rows.select(
        "metric",
        "temporality",
        _label_map(F.col("dp.labels")).alias("labels"),
        F.timestamp_micros(F.floor(t / 1000).cast("bigint")).alias("ts"),
        F.transform(F.col("dp.bucketCounts"), lambda c: c.try_cast("bigint")).alias(
            "bucket_counts"
        ),
        F.col("dp.explicitBounds").alias("explicit_bounds"),
        F.when(F.col("dp.sum").isNull(), F.lit(0).cast("bigint"))
        .otherwise(F.col("dp.sum").try_cast("bigint"))
        .alias("h_sum"),
        F.coalesce(F.col("dp.count").try_cast("bigint"), F.lit(0)).alias("h_count"),
    )


__all__ += ["to_otlp_int_histograms_json", "parse_otlp_int_histograms_json"]
