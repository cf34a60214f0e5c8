"""Scrape-manager semantics: relabel_configs, honor_labels, staleness.

Reference behaviors: prometheus/pkg/relabel actions as applied by the
vendored scrape manager; receiver/prometheusreceiver/internal/
staleness_store.go:21-90 (two-generation diff -> NaN marker).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.prometheus import (
    RelabelConfig,
    apply_relabel_configs,
    merge_target_labels,
    series_key,
    staleness_markers,
    with_staleness,
)


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        ("http_requests_total", {"code": "200", "path": "/a"}, 4.0),
        ("http_requests_total", {"code": "500", "path": "/b"}, 1.0),
        ("process_cpu_seconds", {"mode": "user"}, 2.5),
        ("up", None, 1.0),
    ]
    return spark.createDataFrame(rows, "metric string, labels map<string,string>, value double")


def _rows(df):
    return [(r.metric, dict(r.labels) if r.labels is not None else None) for r in df.collect()]


def test_keep_drop_filter_samples(samples):
    kept = apply_relabel_configs(
        samples, [RelabelConfig(action="keep", source_labels=["code"], regex="2..")]
    )
    assert {m for m, _ in _rows(kept)} == {"http_requests_total"}
    assert len(_rows(kept)) == 1
    dropped = apply_relabel_configs(
        samples, [RelabelConfig(action="drop", source_labels=["__name__"], regex="up")]
    )
    assert "up" not in {m for m, _ in _rows(dropped)}


def test_replace_with_group_reference_and_no_match_leaves_row(samples):
    out = apply_relabel_configs(
        samples,
        [
            RelabelConfig(
                action="replace", source_labels=["code", "path"], separator=":",
                regex=r"(\d)..:/(\w)", target_label="bucket", replacement="$1xx-$2",
            )
        ],
    )
    rows = [l for m, l in _rows(out) if l and l.get("code") == "200"]
    assert rows[0]["bucket"] == "2xx-a"
    # non-matching rows keep their labels untouched (no bucket label)
    cpu = [l for m, l in _rows(out) if m == "process_cpu_seconds"][0]
    assert "bucket" not in cpu


def test_replace_can_rewrite_metric_name_via_name_label(samples):
    out = apply_relabel_configs(
        samples,
        [
            RelabelConfig(
                action="replace", source_labels=["__name__"], regex="(.*)_total",
                target_label="__name__", replacement="$1",
            )
        ],
    )
    assert "http_requests" in {m for m, _ in _rows(out)}
    assert "process_cpu_seconds" in {m for m, _ in _rows(out)}


def test_replace_to_empty_prunes_label_like_prometheus(samples):
    out = apply_relabel_configs(
        samples,
        [
            RelabelConfig(
                action="replace", source_labels=["code"], regex="(.*)",
                target_label="path", replacement="",
            )
        ],
    )
    for _, l in _rows(out):
        if l is not None:
            assert "path" not in l


def test_labelmap_labeldrop_labelkeep(samples):
    out = apply_relabel_configs(
        samples, [RelabelConfig(action="labelmap", regex="co(de)", replacement="status_$1")]
    )
    l = [l for m, l in _rows(out) if l and "code" in l][0]
    assert l["status_de"] == l["code"]
    out = apply_relabel_configs(samples, [RelabelConfig(action="labeldrop", regex="pa.*")])
    assert all(l is None or "path" not in l for _, l in _rows(out))
    out = apply_relabel_configs(samples, [RelabelConfig(action="labelkeep", regex="code")])
    for _, l in _rows(out):
        assert l is None or set(l) <= {"code"}


def test_hashmod_shards_deterministically(samples):
    out = apply_relabel_configs(
        samples,
        [RelabelConfig(action="hashmod", source_labels=["path"], target_label="shard", modulus=4)],
    )
    shards = {l["shard"] for _, l in _rows(out) if l and "shard" in l}
    assert shards <= {"0", "1", "2", "3"} and shards
    again = apply_relabel_configs(
        samples,
        [RelabelConfig(action="hashmod", source_labels=["path"], target_label="shard", modulus=4)],
    )
    assert _rows(out) == _rows(again)


def test_relabel_rejects_bad_configs():
    with pytest.raises(ValueError, match="unknown action"):
        RelabelConfig(action="nope")
    with pytest.raises(ValueError, match="modulus"):
        RelabelConfig(action="hashmod")


def test_honor_labels_conflict_rules(spark):
    df = spark.createDataFrame(
        [("m", {"job": "scraped"}, 1.0), ("m", {"x": "1"}, 2.0)],
        "metric string, labels map<string,string>, value double",
    )
    # false (default): target wins, scraped survives as exported_job
    out = merge_target_labels(df, {"job": "tgt"}, honor_labels=False)
    got = {frozenset(dict(r.labels).items()) for r in out.collect()}
    assert frozenset({("job", "tgt"), ("exported_job", "scraped")}) in got
    assert frozenset({("x", "1"), ("job", "tgt")}) in got
    # true: scraped wins, target applies only where absent
    out = merge_target_labels(df, {"job": "tgt"}, honor_labels=True)
    got = {frozenset(dict(r.labels).items()) for r in out.collect()}
    assert frozenset({("job", "scraped")}) in got
    assert frozenset({("x", "1"), ("job", "tgt")}) in got


def test_staleness_two_generation_diff(spark):
    # series A lives in scrapes 1,2,3; B only 1; C flaps 1 and 3
    rows = [
        (1, "m", {"s": "A"}, 1.0), (2, "m", {"s": "A"}, 1.0), (3, "m", {"s": "A"}, 1.0),
        (1, "m", {"s": "B"}, 1.0),
        (1, "m", {"s": "C"}, 1.0), (3, "m", {"s": "C"}, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "scrape_idx int, metric string, labels map<string,string>, value double"
    )
    marks = {(r.scrape_idx, dict(r.labels)["s"]) for r in staleness_markers(df).collect()}
    # B dies at 2; C dies at 2 and is NOT re-marked at 3 (it's back)
    assert marks == {(2, "B"), (2, "C")}
    out = with_staleness(df)
    stale = out.filter(F.col("stale")).collect()
    assert all(r.value is None for r in stale) and len(stale) == 2
    assert out.filter(~F.col("stale")).count() == len(rows)


def test_series_key_is_label_order_insensitive(spark):
    a = spark.createDataFrame([("m", {"x": "1", "y": "2"})], "metric string, labels map<string,string>")
    b = spark.createDataFrame([("m", {"y": "2", "x": "1"})], "metric string, labels map<string,string>")
    ka = a.select(series_key().alias("k")).first()["k"]
    kb = b.select(series_key().alias("k")).first()["k"]
    assert ka == kb


def test_internal_metric_split_and_scrape_health(spark):
    """isInternalMetric routing (up/scrape_* are bookkeeping, not data)
    and the up-series health table with the reference's three outcomes:
    1 healthy, 0 scrape_failed, anything else invalid."""
    from opentelemetry_collector_spark.sources.prometheus import (
        scrape_health,
        split_internal_metrics,
    )

    rows = [
        (1, "http_requests_total", {"job": "j", "instance": "i1"}, 4.0),
        (1, "up", {"job": "j", "instance": "i1"}, 1.0),
        (2, "up", {"job": "j", "instance": "i1"}, 0.0),
        (3, "up", {"job": "j", "instance": "i2"}, 7.0),
        (1, "scrape_duration_seconds", {"job": "j", "instance": "i1"}, 0.02),
        (1, "upstream_bytes", {"job": "j", "instance": "i1"}, 9.0),  # NOT internal
    ]
    df = spark.createDataFrame(
        rows, "scrape_idx int, metric string, labels map<string,string>, value double"
    )
    data, internal = split_internal_metrics(df)
    assert {r.metric for r in data.collect()} == {"http_requests_total", "upstream_bytes"}
    assert {r.metric for r in internal.collect()} == {"up", "scrape_duration_seconds"}
    health = {(r.scrape_idx, r.instance): r.status for r in scrape_health(df).collect()}
    assert health == {
        (1, "i1"): "healthy",
        (2, "i1"): "scrape_failed",
        (3, "i2"): "invalid_up_value",
    }


def test_drop_wire_labels_respects_family_position(spark):
    """isUsefulLabel: wire/meta labels drop everywhere; le drops only on
    histogram-family points, quantile only on summaries."""
    from opentelemetry_collector_spark.sources.prometheus import drop_wire_labels

    rows = [
        ("a_bucket", "histogram", {"job": "j", "le": "0.5", "path": "/x", "__name__": "a_bucket"}),
        ("b", "summary", {"instance": "i", "quantile": "0.9", "k": "v"}),
        ("c", "counter", {"le": "7", "quantile": "0.5", "k": "v", "__metrics_path__": "/m"}),
    ]
    df = spark.createDataFrame(rows, "metric string, metric_type string, labels map<string,string>")
    got = {r.metric: dict(r.labels) for r in drop_wire_labels(df).collect()}
    assert got["a_bucket"] == {"path": "/x"}
    assert got["b"] == {"k": "v"}
    # a counter keeps le/quantile — they are ordinary labels there
    assert got["c"] == {"le": "7", "quantile": "0.5", "k": "v"}
