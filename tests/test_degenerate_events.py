"""Degenerate-events sweep over the transcripts-family queries: NULL
event_type/value/props, extreme timestamps, negative and huge values, a
single-event user, and one hot user — no-crash + sane-output assertions
(per-query value semantics live in each query's oracle)."""

from __future__ import annotations

import datetime

import pytest

from opentelemetry_collector_spark.plans.queries import QUERIES

EVENT_QUERIES = [
    "q00_pipeline_e2e",
    "q01_parse_extract",
    "q02_filter_strict",
    "q03_filter_regexp",
    "q04_attributes_actions",
    "q05_enrich_broadcast",
    "q06_route_counts",
    "q07_turn_counts",
    "q08_accumulate_last",
    "q09_timeseries_group",
    "q10_sampler_priority",
    "q11_span_to_attributes",
    "q23_session_latency",
    "q24_grok_pack",
    "q26_conv_digest",
    "q27_severity_counts",
    "q28_json_roundtrip",
    "q29_expr_filter",
    "q31_otlp_roundtrip",
    "q32_batch_split",
    "q33_histogram_merge",
    "q34_memory_limiter",
    "q42_pack_sequences",
    "q43_stratified_sample",
    "q51_asof_enrich",
    "q210_chat_render",
    "q211_loss_mask_spans",
    "q212_context_trim",
    "q52_route_rollup",
    "q53_latency_quantiles",
    "q54_sessionize",
    "q77_otlp_histogram_roundtrip",
    "q49_oc_metrics_roundtrip",
    "q72_otlp_trace_roundtrip",
    "q73_otlp_metrics_roundtrip",
    "q78_otlp_int_metrics_roundtrip",
    "q79_otlp_summary_roundtrip",
    "q87_counter_adjust",
    "q88_slo_burn",
    "q89_zipkinv1_roundtrip",
    "q90_log_templates",
    "q91_delta_to_cumulative",
    "q92_split_metrics",
    "q93_otlp_text_traces",
    "q94_otlp_text_metrics",
    "q96_zipkin_span_events",
    "q97_zipkin_span_links",
    "q152_ohlc_downsample",
    "q153_gapfill_locf",
    "q154_interpolate_linear",
    "q155_ewma",
    "q156_tail_sampling",
    "q157_span_red_metrics",
    "q158_counter_rate",
    "q159_sliding_burst",
    "q160_span_self_time",
    "q161_triangles",
    "q162_trending_templates",
    "q163_cusum_drift",
    "q164_covisitation",
    "q165_k_anonymity",
    "q166_qi_suppression",
    "q167_winsorize",
    "q168_vocab_growth",
    "q169_attr_cardinality",
    "q170_hysteresis_alerts",
    "q171_hot_keys",
    "q172_equi_depth_bins",
    "q174_join_size_guard",
    "q175_volume_trend",
    "q176_trend_residual_anomalies",
    "q177_seasonal_deviation",
    "q178_rank_normalize",
]


@pytest.fixture(scope="module")
def weird_events_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_weird_events")
    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    eid = 0

    def ev(uid, etype, value, ts, props='{"k":1}'):
        nonlocal eid
        eid += 1
        return (eid, ts, uid, etype, value, props)

    # NULL event_type / value / props
    rows.append(ev(1, None, None, t0, None))
    rows.append(ev(1, "click", 1.0, t0 + datetime.timedelta(seconds=1)))
    # extreme timestamps
    rows.append(ev(2, "view", 2.0, datetime.datetime(1970, 1, 1)))
    rows.append(ev(2, "purchase", 1e18, datetime.datetime(2200, 12, 31)))
    # negative / NaN-free extreme values
    rows.append(ev(3, "error", -42.5, t0))
    rows.append(ev(3, "error", -0.0, t0 + datetime.timedelta(microseconds=1)))
    # single-event user
    rows.append(ev(4, "signup", 0.0, t0))
    # hot user: many same-timestamp events (ordering ties)
    for _ in range(50):
        rows.append(ev(5, "click", 1.0, t0))
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(dst / "events.parquet"))
    for name in ["customer", "orders", "documents", "embeddings"]:
        spark.read.parquet(f"{src}/{name}.parquet").coalesce(1).write.parquet(
            str(dst / f"{name}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_survives_degenerate_rows(spark, weird_events_dir, name):
    out = QUERIES[name](spark, weird_events_dir)
    # collect() IS the check (no ANSI abort on any degenerate row); the
    # schema must also stay stable for the driver contract
    rows = out.collect()
    assert out.columns, name
    del rows
