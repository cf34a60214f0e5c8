"""Goldens for tail-based trace sampling (sample.tail_sample*) and span
RED metrics (aggregate.span_red_metrics). The q156/q157 DuckDB oracles
prove whole-query cross-engine equality; these pin the policy semantics
on hand-built traces where every decision is known."""

from __future__ import annotations

import datetime as dt

import pytest

from opentelemetry_collector_spark.operators.aggregate import span_red_metrics
from opentelemetry_collector_spark.operators.sample import (
    tail_sample,
    tail_sample_decisions,
)

COLS = (
    "trace_id string, span_id string, service_name string, name string, "
    "status_code int, ts timestamp, duration_us long"
)
BASE = dt.datetime(2024, 1, 1)


def _t(seconds):
    return BASE + dt.timedelta(seconds=seconds)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def traces(spark):
    """Four traces: err (error + slow), slow (clean, 10s wall), fast2
    (clean, 1.5s), quick (single span). Wall time = max(start+dur)-min(start),
    so 'slow' is 10s end-to-end even though each span is 1s."""
    rows = [
        ("err", "s1", "api", "op", 0, _t(0), 1_000_000),
        ("err", "s2", "db", "op", 2, _t(5), 1_000_000),
        ("slow", "s1", "api", "op", 0, _t(0), 1_000_000),
        ("slow", "s2", "db", "op", 0, _t(9), 1_000_000),
        ("fast2", "s1", "api", "op", 0, _t(0), 500_000),
        ("fast2", "s2", "db", "op", 0, _t(0), 1_500_000),
        ("quick", "s1", "api", "op", 0, _t(0), 100_000),
    ]
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _decisions(spark, rows, **kw):
    out = tail_sample_decisions(_df(spark, rows), **kw)
    return {r["trace_id"]: (r["reason"], r["keep"], r["trace_duration_us"]) for r in out.collect()}


def test_policy_precedence_status_beats_latency(spark, traces):
    got = _decisions(spark, traces, latency_ms=5_000, rate_pm=0)
    assert got["err"][0] == "status_code"  # error AND slow: status wins
    assert got["slow"][0] == "latency"
    assert got["fast2"] == (None, 0, 1_500_000)
    assert got["quick"][0] is None


def test_trace_wall_time_is_end_to_end(spark, traces):
    got = _decisions(spark, traces, latency_ms=None, rate_pm=0, keep_error_traces=False)
    assert got["slow"][2] == 10_000_000  # 9s offset + 1s duration
    assert got["fast2"][2] == 1_500_000  # overlapping spans: max end - min start
    assert got["quick"][2] == 100_000


def test_keep_error_traces_false_skips_status_policy(spark, traces):
    got = _decisions(spark, traces, latency_ms=5_000, rate_pm=0, keep_error_traces=False)
    assert got["err"][0] == "latency"  # err is also slow; status policy off


def test_probabilistic_edges(spark, traces):
    all_kept = _decisions(spark, traces, rate_pm=1000, keep_error_traces=False)
    assert {v[0] for v in all_kept.values()} == {"probabilistic"}
    none_kept = _decisions(spark, traces, rate_pm=0, keep_error_traces=False)
    assert {v[0] for v in none_kept.values()} == {None}
    with pytest.raises(ValueError, match="rate_pm"):
        _decisions(spark, traces, rate_pm=1001)


def test_tail_sample_is_all_or_nothing_per_trace(spark, traces):
    out = tail_sample(_df(spark, traces), latency_ms=5_000, rate_pm=0).collect()
    by_trace = {}
    for r in out:
        by_trace.setdefault(r["trace_id"], []).append(r["reason"])
    assert sorted(by_trace) == ["err", "slow"]
    assert by_trace["err"] == ["status_code"] * 2  # every span, reason attached
    assert by_trace["slow"] == ["latency"] * 2


def test_decisions_partial_aggregate_before_shuffle(spark, traces):
    plan = _plan(tail_sample_decisions(_df(spark, traces), latency_ms=1, rate_pm=0))
    assert "partial_" in plan and plan.index("partial_") > plan.index("Exchange")


def test_red_metrics_golden(spark):
    rows = [
        ("t1", "s1", "api", "get", 0, _t(0), 40_000),
        ("t1", "s2", "api", "get", 2, _t(1), 200_000),
        ("t2", "s1", "api", "get", 2, _t(2), 600_000),
        ("t2", "s2", "db", "put", 0, _t(3), 50_000),
    ]
    out = span_red_metrics(
        _df(spark, rows), bounds_ms=[50, 200, 500], keys=("service_name", "name")
    )
    got = {(r["service_name"], r["name"]): r.asDict() for r in out.collect()}
    api = got[("api", "get")]
    assert (api["calls"], api["errors"], api["duration_sum_us"]) == (3, 2, 840_000)
    # cumulative le-buckets: 40ms<=50; 200ms<=200; 600ms beyond all bounds
    assert (api["le_50ms"], api["le_200ms"], api["le_500ms"]) == (1, 2, 2)
    assert api["err_pm"] == 666  # floor(2000/3)
    db = got[("db", "put")]
    assert (db["calls"], db["errors"], db["err_pm"]) == (1, 0, 0)
    assert (db["le_50ms"], db["le_200ms"], db["le_500ms"]) == (1, 1, 1)


def test_red_metrics_bucket_boundary_is_inclusive(spark):
    rows = [("t", "s", "api", "op", 0, _t(0), 50_000)]
    r = span_red_metrics(_df(spark, rows), bounds_ms=[50]).collect()[0]
    assert r["le_50ms"] == 1  # le = less-or-equal, prometheus style


def test_red_metrics_bounds_validation(spark):
    df = _df(spark, [("t", "s", "api", "op", 0, _t(0), 1)])
    for bad in ([], [200, 50], [50, 50], [-1]):
        with pytest.raises(ValueError, match="bounds_ms"):
            span_red_metrics(df, bounds_ms=bad)


def test_red_metrics_single_exchange_hash_agg(spark):
    df = _df(spark, [("t", "s", "api", "op", 0, _t(0), 1)])
    plan = _plan(span_red_metrics(df, bounds_ms=[50]))
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final around the shuffle


def test_red_metrics_exemplar_is_slowest_span(spark):
    rows = [
        ("t1", "s1", "api", "get", 0, _t(0), 40_000),
        ("t2", "s9", "api", "get", 0, _t(1), 900_000),
        ("t3", "s3", "api", "get", 2, _t(2), 200_000),
    ]
    r = span_red_metrics(
        _df(spark, rows), bounds_ms=[500], with_exemplar=True
    ).collect()[0]
    ex = r["exemplar"]
    assert (ex["trace_id"], ex["span_id"], ex["duration_us"]) == ("t2", "s9", 900_000)
    # exemplar rides the SAME single-shuffle aggregate
    plan = _plan(span_red_metrics(_df(spark, rows), bounds_ms=[500], with_exemplar=True))
    assert plan.count("Exchange") == 1


def test_red_metrics_exemplar_tie_is_stated_rule(spark):
    # equal durations: the (duration, trace_id, span_id) struct order picks
    # the lexicographically greatest ids — deterministic, not shuffle luck
    rows = [
        ("a", "s1", "api", "op", 0, _t(0), 100_000),
        ("b", "s2", "api", "op", 0, _t(1), 100_000),
    ]
    ex = span_red_metrics(
        _df(spark, rows), bounds_ms=[500], with_exemplar=True
    ).collect()[0]["exemplar"]
    assert (ex["trace_id"], ex["span_id"]) == ("b", "s2")


def test_span_self_times_golden(spark):
    """Hand-built tree: root(10ms) -> a(3ms), b(4ms); a -> leaf(1ms).
    Self: root 10-7=3, a 3-1=2, b 4, leaf 1. A second trace reusing the
    same span ids must not leak child sums across traces."""
    from opentelemetry_collector_spark.operators.aggregate import span_self_times

    cols = "trace_id string, span_id string, parent_span_id string, duration_us long"
    rows = [
        ("T", "root", None, 10_000),
        ("T", "a", "root", 3_000),
        ("T", "b", "root", 4_000),
        ("T", "leaf", "a", 1_000),
        ("U", "root", None, 5_000),  # same ids, different trace: no leak
    ]
    out = {
        (r["trace_id"], r["span_id"]): (r["self_us"], r["child_sum_us"], r["over_parallel"])
        for r in span_self_times(spark.createDataFrame(rows, cols)).collect()
    }
    assert out[("T", "root")] == (3_000, 7_000, 0)
    assert out[("T", "a")] == (2_000, 1_000, 0)
    assert out[("T", "b")] == (4_000, 0, 0)
    assert out[("T", "leaf")] == (1_000, 0, 0)
    assert out[("U", "root")] == (5_000, 0, 0)


def test_span_self_times_over_parallel_clamps(spark):
    """Async children summing past the parent clamp self time at zero and
    raise the flag — never a negative self time."""
    from opentelemetry_collector_spark.operators.aggregate import span_self_times

    cols = "trace_id string, span_id string, parent_span_id string, duration_us long"
    rows = [
        ("T", "p", None, 2_000),
        ("T", "c1", "p", 1_500),
        ("T", "c2", "p", 1_500),
    ]
    out = {r["span_id"]: r for r in span_self_times(spark.createDataFrame(rows, cols)).collect()}
    assert (out["p"]["self_us"], out["p"]["over_parallel"]) == (0, 1)
    assert out["p"]["child_sum_us"] == 3_000


def test_span_self_times_plan_is_hash_join_not_nlj(spark):
    from opentelemetry_collector_spark.operators.aggregate import span_self_times

    cols = "trace_id string, span_id string, parent_span_id string, duration_us long"
    df = spark.createDataFrame([("T", "r", None, 1)], cols)
    plan = _plan(span_self_times(df))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # equi hash/sort-merge join on (trace, span)
