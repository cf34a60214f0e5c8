"""Prometheus scrape-manager semantics over parsed sample frames.

The reference embeds the Prometheus scrape manager, so three behaviors sit
between "text parsed" and "metrics emitted" that the plain textparse loop
(`sources/codecs.parse_prometheus_text`) doesn't cover:

- **relabel_configs** (`prometheus/pkg/relabel`, applied by the scrape
  manager the reference vendors): keep/drop/replace/labelmap/labeldrop/
  labelkeep/hashmod over the label set, with the metric name addressable
  as the ``__name__`` meta-label. Here each config compiles to column
  transforms over the ``labels`` map — regexes are ANCHORED like
  Prometheus (``^(?:re)$``), ``$1`` group references use the same Java
  replacement syntax, and labels relabeled to "" are dropped from the set
  exactly like Prometheus prunes empty labels.
- **honor_labels** (`receiver/prometheusreceiver` scrape config): merging
  target-provided labels (job/instance/...) with scraped ones. true →
  the scraped value wins; false → the target value wins and the scraped
  conflicting label is preserved as ``exported_<name>``.
- **staleness markers** (`receiver/prometheusreceiver/internal/
  staleness_store.go:21-90`): a series seen in scrape N-1 but absent in
  scrape N yields a marker at scrape N. The store's two-generation hash
  set is a per-target anti-join between consecutive scrape generations —
  exactly a window + left-anti join here, with NO driver state. Prometheus
  encodes the marker as a special NaN payload; relationally that value
  would poison equality/hashing, so markers carry ``value NULL, stale
  true`` (the flag IS the marker; a NaN sentinel is one projection away
  for a wire-faithful sink).

Scale shape: relabeling is pure per-row projection (scan-speed, no
shuffle); the staleness anti-join shuffles once on the series key —
bounded by distinct series per scrape pair, not by samples.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NAME_LABEL = "__name__"


@dataclass
class RelabelConfig:
    """One relabel rule, field-for-field the prometheus/pkg/relabel shape
    (defaults match Prometheus' config defaults)."""

    action: str = "replace"
    source_labels: list[str] = field(default_factory=list)
    separator: str = ";"
    regex: str = "(.*)"
    target_label: str = ""
    replacement: str = "$1"
    modulus: int = 0

    def __post_init__(self) -> None:
        ok = {"replace", "keep", "drop", "labelmap", "labeldrop", "labelkeep", "hashmod"}
        if self.action not in ok:
            raise ValueError(f"relabel: unknown action {self.action!r}")
        if self.action == "hashmod" and self.modulus <= 0:
            raise ValueError("relabel: hashmod requires a positive modulus")
        # Prometheus config load rejects replace/hashmod without a target
        # label (prometheus/pkg/relabel config.go Validate); without this,
        # hashmod would silently insert a label with an empty NAME (which
        # _prune_empty does not strip — it prunes empty VALUES).
        if self.action in ("replace", "hashmod") and not self.target_label:
            raise ValueError(f"relabel: {self.action} requires a target_label")
        # Fail at config-load time, not job runtime, on a bad pattern.
        try:
            re.compile(self.anchored)
        except re.error as e:
            raise ValueError(f"relabel: invalid regex {self.regex!r}: {e}") from None

    @property
    def anchored(self) -> str:
        return f"^(?:{self.regex})$"


def _get_label(labels: Column, metric: Column, name: str) -> Column:
    """labels.Get semantics: missing reads as "" (Go zero value); the
    metric name is addressable as the __name__ meta-label."""
    if name == _NAME_LABEL:
        return F.coalesce(metric, F.lit(""))
    return F.coalesce(F.element_at(labels, F.lit(name)), F.lit(""))


def _src(labels: Column, metric: Column, cfg: RelabelConfig) -> Column:
    return F.concat_ws(cfg.separator, *[_get_label(labels, metric, n) for n in cfg.source_labels])


def _put(labels: Column, key: str, value: Column) -> Column:
    """Set labels[key] = value (replace semantics, no dup-key map_concat
    trap): rebuild from entries minus the key, plus the new entry."""
    kept = F.filter(F.map_entries(labels), lambda e: e["key"] != key)
    entry = F.struct(F.lit(key).alias("key"), value.alias("value"))
    return F.map_from_entries(F.concat(kept, F.array(entry)))


def _prune_empty(labels: Column) -> Column:
    """Prometheus removes labels whose value relabeled to "" from the set."""
    return F.map_from_entries(
        F.filter(F.map_entries(labels), lambda e: e["value"] != "")
    )


def _hashmod(src: Column, modulus: int) -> Column:
    """Deterministic md5-based shard in [0, modulus): same double-hash
    word the sketches use (portable to any engine — Prometheus' sum64-of-
    md5 differs in byte packing only; the contract, a stable shard of the
    label set, is identical)."""
    h = F.conv(F.substring(F.md5(src), 1, 13), 16, 10).cast("bigint")
    return (h % modulus).cast("string")


def apply_relabel_configs(
    df: DataFrame,
    configs: list[RelabelConfig],
    labels_col: str = "labels",
    metric_col: str = "metric",
) -> DataFrame:
    """Apply a relabel_configs chain in order, as pure projections.

    keep/drop filter ROWS (samples); the label-shaping actions rewrite the
    map column. Writing ``__name__`` rewrites the metric column. Rows
    whose labels column is NULL are treated as the empty label set, like
    an empty Prometheus label batch."""
    out = df
    for cfg in configs:
        labels = F.coalesce(
            F.col(labels_col), F.map_from_arrays(F.array(), F.array())
        ).cast("map<string,string>")
        metric = F.col(metric_col)
        if cfg.action in ("keep", "drop"):
            m = _src(labels, metric, cfg).rlike(cfg.anchored)
            out = out.filter(m if cfg.action == "keep" else ~m)
            continue
        if cfg.action == "replace":
            src = _src(labels, metric, cfg)
            matched = src.rlike(cfg.anchored)
            val = F.regexp_replace(src, cfg.anchored, cfg.replacement)
            if cfg.target_label == _NAME_LABEL:
                out = out.withColumn(
                    metric_col, F.when(matched, val).otherwise(metric)
                )
            else:
                new = _prune_empty(_put(labels, cfg.target_label, val))
                out = out.withColumn(
                    labels_col, F.when(matched, new).otherwise(labels)
                )
            continue
        if cfg.action == "hashmod":
            val = _hashmod(_src(labels, metric, cfg), cfg.modulus)
            out = out.withColumn(labels_col, _put(labels, cfg.target_label, val))
            continue
        if cfg.action == "labelmap":
            mapped = F.transform(
                F.filter(F.map_entries(labels), lambda e: e["key"].rlike(cfg.anchored)),
                lambda e: F.struct(
                    F.regexp_replace(e["key"], cfg.anchored, cfg.replacement).alias("key"),
                    e["value"].alias("value"),
                ),
            )
            # mapped names overwrite originals of the same name (last wins)
            kept = F.filter(
                F.map_entries(labels),
                lambda e: ~F.exists(mapped, lambda m: m["key"] == e["key"]),
            )
            out = out.withColumn(labels_col, F.map_from_entries(F.concat(kept, mapped)))
            continue
        # labeldrop / labelkeep
        keepfn = (
            (lambda e: ~e["key"].rlike(cfg.anchored))
            if cfg.action == "labeldrop"
            else (lambda e: e["key"].rlike(cfg.anchored))
        )
        out = out.withColumn(
            labels_col, F.map_from_entries(F.filter(F.map_entries(labels), keepfn))
        )
    return out


def merge_target_labels(
    df: DataFrame,
    target_labels: dict[str, str],
    honor_labels: bool = False,
    labels_col: str = "labels",
) -> DataFrame:
    """Attach scrape-target labels (job/instance/...) to every sample.

    honor_labels=true: a scraped label of the same name WINS (the target
    value is not applied to that row). false (Prometheus default): the
    target value wins and the scraped value survives as
    ``exported_<name>`` — the documented conflict rule."""
    out = df
    for name, value in target_labels.items():
        labels = F.coalesce(
            F.col(labels_col), F.map_from_arrays(F.array(), F.array())
        ).cast("map<string,string>")
        has = F.coalesce(F.map_contains_key(labels, F.lit(name)), F.lit(False))
        if honor_labels:
            new = F.when(has, labels).otherwise(_put(labels, name, F.lit(value)))
        else:
            moved = F.when(
                has,
                _put(labels, f"exported_{name}", F.element_at(labels, F.lit(name))),
            ).otherwise(labels)
            new = _put(moved, name, F.lit(value))
        out = out.withColumn(labels_col, new)
    return out


def series_key(
    metric_col: str = "metric", labels_col: str = "labels"
) -> Column:
    """Canonical series identity string: metric + sorted k=v label pairs —
    the relational stand-in for labels.Hash() (maps can't be join keys)."""
    entries = F.array_sort(
        F.transform(
            F.map_entries(F.coalesce(F.col(labels_col), F.map_from_arrays(F.array(), F.array()))),
            lambda e: F.concat(e["key"], F.lit("\x01"), e["value"]),
        )
    )
    return F.concat_ws("\x02", F.coalesce(F.col(metric_col), F.lit("")), F.concat_ws("\x03", entries))


def staleness_markers(
    df: DataFrame,
    scrape_col: str = "scrape_idx",
    metric_col: str = "metric",
    labels_col: str = "labels",
) -> DataFrame:
    """Series seen at scrape N-1 but absent at scrape N -> one marker row
    per (series, N): the stalenessStore's two-generation diff
    (staleness_store.go:68-90) as a window + left-anti join. "Next scrape"
    means the next scrape ordinal PRESENT in the frame (the store only
    diffs generations that actually happened). Output: (scrape_col,
    metric, labels, stale=true) rows."""
    from pyspark.sql import Window as W

    present = df.select(
        F.col(scrape_col).alias("_s"),
        F.col(metric_col).alias("_m"),
        F.col(labels_col).alias("_l"),
        series_key(metric_col, labels_col).alias("_k"),
    ).dropDuplicates(["_s", "_k"])
    scrapes = present.select("_s").distinct()
    nxt = scrapes.withColumn("_next", F.lead("_s").over(W.orderBy("_s")))
    cand = (
        present.join(nxt, "_s")
        .filter(F.col("_next").isNotNull())
        .select("_m", "_l", "_k", F.col("_next").alias("_s2"))
    )
    alive = present.select(F.col("_k").alias("_k2"), F.col("_s").alias("_s3"))
    markers = cand.join(
        alive,
        (cand["_k"] == alive["_k2"]) & (cand["_s2"] == alive["_s3"]),
        "left_anti",
    )
    return markers.select(
        F.col("_s2").alias(scrape_col),
        F.col("_m").alias(metric_col),
        F.col("_l").alias(labels_col),
        F.lit(True).alias("stale"),
    )


def with_staleness(
    df: DataFrame,
    scrape_col: str = "scrape_idx",
    metric_col: str = "metric",
    labels_col: str = "labels",
    value_col: str = "value",
) -> DataFrame:
    """Samples + their staleness markers in one frame: live rows keep
    their value with stale=false; markers carry value NULL, stale=true
    (the NaN-sentinel encoding, made hash-safe)."""
    live = df.select(
        scrape_col, metric_col, labels_col,
        F.col(value_col).cast("double").alias(value_col),
        F.lit(False).alias("stale"),
    )
    marks = staleness_markers(df, scrape_col, metric_col, labels_col).select(
        scrape_col, metric_col, labels_col,
        F.lit(None).cast("double").alias(value_col),
        F.col("stale"),
    )
    return live.unionByName(marks)


#: label names the metric builder strips before emitting datapoints
#: (metricsbuilder.go isUsefulLabel:177-190): wire/meta identity lives on
#: the resource/target, not on every point.
_WIRE_LABELS = ("__name__", "instance", "job", "__scheme__", "__metrics_path__")


def is_internal_metric(metric: Column) -> Column:
    """``up`` and every ``scrape_*`` series are scrape bookkeeping, not
    target data (metricsbuilder.go isInternalMetric:320-327)."""
    return (metric == "up") | metric.startswith("scrape_")


def split_internal_metrics(
    df: DataFrame, metric_col: str = "metric"
) -> tuple[DataFrame, DataFrame]:
    """(data, internal): the metric builder's routing — internal series
    never become datapoints but are not errors either (hasInternalMetric
    suppresses the no-data complaint)."""
    flag = is_internal_metric(F.col(metric_col))
    return df.filter(~flag), df.filter(flag)


def drop_wire_labels(
    df: DataFrame,
    labels_col: str = "labels",
    metric_type_col: str | None = "metric_type",
) -> DataFrame:
    """isUsefulLabel (metricsbuilder.go:177-190) as a projection: strip the
    wire/meta labels from every point; additionally drop ``le`` on
    histogram-family points and ``quantile`` on summaries (those encode
    the POSITION of the sample inside its reassembled family, which the
    family reassembly has already consumed — see scraped_histograms)."""
    labels = F.coalesce(
        F.col(labels_col), F.map_from_arrays(F.array(), F.array())
    ).cast("map<string,string>")
    drop = F.array(*[F.lit(x) for x in _WIRE_LABELS])
    if metric_type_col is not None:
        mt = F.col(metric_type_col)
        drop = F.concat(
            drop,
            F.when(mt == "histogram", F.array(F.lit("le"))).otherwise(F.array().cast("array<string>")),
            F.when(mt == "summary", F.array(F.lit("quantile"))).otherwise(F.array().cast("array<string>")),
        )
    return df.withColumn(
        labels_col,
        F.map_from_entries(
            F.filter(F.map_entries(labels), lambda e: ~F.array_contains(drop, e["key"]))
        ),
    )


def scrape_health(
    df: DataFrame,
    scrape_col: str = "scrape_idx",
    metric_col: str = "metric",
    labels_col: str = "labels",
    value_col: str = "value",
) -> DataFrame:
    """Per-(target, generation) health from the automatic ``up`` series
    (metricsbuilder.go:117-130: up==1 healthy, up==0 scrape failed,
    anything else invalid — the two warn branches become a status column
    instead of log lines). Target identity = the job/instance labels."""
    up = df.filter(F.col(metric_col) == "up")
    labels = F.coalesce(
        F.col(labels_col), F.map_from_arrays(F.array(), F.array())
    ).cast("map<string,string>")
    v = F.col(value_col)
    return up.select(
        F.col(scrape_col),
        F.coalesce(F.element_at(labels, F.lit("job")), F.lit("")).alias("job"),
        F.coalesce(F.element_at(labels, F.lit("instance")), F.lit("")).alias("instance"),
        F.when(v == 1.0, "healthy")
        .when(v == 0.0, "scrape_failed")
        .otherwise("invalid_up_value")
        .alias("status"),
        v.cast("double").alias("up_value"),
    )
