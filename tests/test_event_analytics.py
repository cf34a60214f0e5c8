"""Event analytics (operators/aggregate.funnel / retention_cohorts):
strictly-ordered funnel semantics and weekly retention cohorting."""

from __future__ import annotations

import datetime as dt

import pytest

from opentelemetry_collector_spark.operators.aggregate import (
    funnel,
    retention_cohorts,
)

T0 = dt.datetime(2026, 1, 5)  # a Monday


def _ts(h):
    return T0 + dt.timedelta(hours=h)


def test_funnel_strict_ordering_golden(spark):
    rows = [
        # u1 completes in order
        ("u1", _ts(0), "signup"), ("u1", _ts(1), "view"), ("u1", _ts(2), "click"),
        # u2 clicks BEFORE viewing: click must not count (strict order)
        ("u2", _ts(0), "signup"), ("u2", _ts(1), "click"), ("u2", _ts(2), "view"),
        # u3 never signs up: invisible to every step
        ("u3", _ts(0), "view"), ("u3", _ts(1), "click"),
        # u4 signup only
        ("u4", _ts(5), "signup"),
        # u5: simultaneous signup+view — strict > excludes the tie
        ("u5", _ts(0), "signup"), ("u5", _ts(0), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    got = {
        r["step"]: (r["step_idx"], r["n_users"])
        for r in funnel(df, "user_id", "ts", "event_type", ["signup", "view", "click"]).collect()
    }
    # signup: u1,u2,u4,u5; view-after-signup: u1,u2; click-after-view: u1
    assert got == {"signup": (0, 4), "view": (1, 2), "click": (2, 1)}

    with pytest.raises(ValueError, match="non-empty"):
        funnel(df, "user_id", "ts", "event_type", [])


def test_retention_cohorts_golden(spark):
    wk = 24 * 7
    rows = [
        # u1: first week 0, active weeks 0 and 2
        ("u1", _ts(1)), ("u1", _ts(2)), ("u1", _ts(2 * wk + 1)),
        # u2: first week 0, active week 0 only
        ("u2", _ts(3)),
        # u3: first week 1
        ("u3", _ts(wk + 1)), ("u3", _ts(wk + 2)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in retention_cohorts(df, "user_id", "ts").collect()
    }
    assert got == {
        ("2026-01-05 00:00:00", 0): 2,
        ("2026-01-05 00:00:00", 2): 1,
        ("2026-01-12 00:00:00", 0): 1,
    }


def _py_winsorize(values, low_pm, high_pm):
    """Pure-Python reference: percentile-disc bounds at ceil(p*n), clip."""
    nn = sorted(v for v in values if v is not None)
    n = len(nn)
    lo = nn[max((low_pm * n + 999) // 1000, 1) - 1]
    hi = nn[max((high_pm * n + 999) // 1000, 1) - 1]
    return [None if v is None else min(max(v, lo), hi) for v in values], lo, hi


def test_winsorize_matches_python_reference(spark):
    from opentelemetry_collector_spark.operators.aggregate import winsorize

    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 100.0, -50.0, 4.0]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, id int, value double")
    out = {r["id"]: (r["winsorized_cents"], r["lo_cents"], r["hi_cents"])
           for r in winsorize(df, ["k"], "value", low_pm=100, high_pm=900).collect()}
    cents = [int(v * 100) for v in vals]
    ref, lo, hi = _py_winsorize(cents, 100, 900)
    for i, want in enumerate(ref):
        assert out[i] == (want, lo, hi)
    # the extremes were clipped to observed values, not interpolations
    assert lo in cents and hi in cents


def test_winsorize_null_isolation_and_key_split(spark):
    from opentelemetry_collector_spark.operators.aggregate import winsorize

    rows = [("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 3.0), ("a", 3, None),
            ("b", 4, 1000.0)]
    df = spark.createDataFrame(rows, "k string, id int, value double")
    out = {r["id"]: (r["value_cents"], r["winsorized_cents"])
           for r in winsorize(df, ["k"], "value", low_pm=0, high_pm=1000).collect()}
    assert len(out) == 5                      # row count preserved
    assert out[3] == (None, None)             # NULL in, NULL out
    # full range [p0->pos1, p100->pos n]: nothing clipped
    assert out[0] == (100, 100) and out[2] == (300, 300)
    # key b: its own (degenerate) distribution, untouched by key a
    assert out[4] == (100000, 100000)

    with pytest.raises(ValueError, match="low_pm"):
        winsorize(df, ["k"], "value", low_pm=500, high_pm=400)
    with pytest.raises(ValueError, match="key"):
        winsorize(df, [], "value")


def test_winsorize_single_exchange_no_join(spark):
    from opentelemetry_collector_spark.operators.aggregate import winsorize

    df = spark.createDataFrame([("a", 0, 1.0)], "k string, id int, value double")
    plan = (winsorize(df, ["k"], "value")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_key_skew_report_golden(spark):
    from opentelemetry_collector_spark.operators.aggregate import key_skew_report

    # key a: 6 rows, b: 3, c: 1  -> total 10, sumsq 36+9+1=46 -> HHI 460000
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    got = {r["k"]: (r["n_rows"], r["rank"], r["share_pm"], r["cum_share_pm"],
                    r["hhi_ppm"]) for r in key_skew_report(df, ["k"], top_k=2).collect()}
    assert got == {
        "a": (6, 1, 600, 600, 460000),
        "b": (3, 2, 300, 900, 460000),   # top_k=2: c truncated, shares exact
    }

    import pytest as _pytest
    with _pytest.raises(ValueError, match="top_k"):
        key_skew_report(df, ["k"], top_k=0)


def test_key_skew_uniform_vs_hot(spark):
    """HHI discriminates: uniform 10x10 -> 100000 ppm; one key owning all
    rows -> 1000000 ppm."""
    from opentelemetry_collector_spark.operators.aggregate import key_skew_report

    uniform = spark.createDataFrame([(f"k{i % 10}",) for i in range(100)], "k string")
    hot = spark.createDataFrame([("h",)] * 100, "k string")
    assert key_skew_report(uniform, ["k"], 1).collect()[0]["hhi_ppm"] == 100000
    r = key_skew_report(hot, ["k"], 1).collect()[0]
    assert (r["hhi_ppm"], r["share_pm"]) == (1000000, 1000)


def test_key_skew_topk_plan_take_ordered(spark):
    """The top-k must plan as TakeOrderedAndProject (per-task local k),
    never a global Sort over the distinct-key frame."""
    from opentelemetry_collector_spark.operators.aggregate import key_skew_report

    df = spark.createDataFrame([("a",)], "k string")
    plan = (key_skew_report(df, ["k"], top_k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_equi_depth_bins_golden(spark):
    from opentelemetry_collector_spark.operators.aggregate import equi_depth_bins

    # 10 values into 4 bins -> sizes 2,3,2,3 via (rn-1)*4 div 10 + 1
    rows = [("a", i, float(i + 1)) for i in range(10)] + [("a", 99, None)]
    df = spark.createDataFrame(rows, "k string, id int, value double")
    got = {r["id"]: r["bin"] for r in
           equi_depth_bins(df, ["k"], "value", n_bins=4, tiebreak=["id"]).collect()}
    ref = {i: (i * 4) // 10 + 1 for i in range(10)}
    assert {i: got[i] for i in range(10)} == ref
    assert got[99] is None                       # NULL isolates
    # every bin populated, monotone in value
    assert sorted(set(ref.values())) == [1, 2, 3, 4]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_bins"):
        equi_depth_bins(df, ["k"], "value", n_bins=1)


def test_equi_depth_bins_single_exchange(spark):
    from opentelemetry_collector_spark.operators.aggregate import equi_depth_bins

    df = spark.createDataFrame([("a", 0, 1.0)], "k string, id int, value double")
    plan = (equi_depth_bins(df, ["k"], "value", tiebreak=["id"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_trend_slope_exact_rational(spark):
    from opentelemetry_collector_spark.operators.aggregate import trend_slope

    # y = 3x + 7 exactly -> slope 3.0, intercept 7.0 (in ppm)
    rows = [("a", x, 3 * x + 7) for x in range(10)]
    # declining series: y = -2x + 100 -> negative slope must truncate
    # toward zero identically in both engines
    rows += [("b", x, -2 * x + 100) for x in range(10)]
    # constant x: vertical fit has no slope
    rows += [("c", 5, 1), ("c", 5, 9)]
    df = spark.createDataFrame(rows, "k string, x int, y int")
    got = {r["k"]: (r["slope_ppm"], r["intercept_ppm"])
           for r in trend_slope(df, ["k"], "x", "y").collect()}
    assert got["a"] == (3_000_000, 7_000_000)
    assert got["b"] == (-2_000_000, 100_000_000)
    assert got["c"] == (None, None)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="key"):
        trend_slope(df, [], "x", "y")


def test_trend_slope_nonexact_truncates_toward_zero(spark):
    from opentelemetry_collector_spark.operators.aggregate import trend_slope

    # slope -1/3: ppm quotient -333333.33 -> truncation gives -333333
    # (floor division would give -333334 — the cross-engine trap)
    rows = [("k", 0, 1), ("k", 3, 0)]
    df = spark.createDataFrame(rows, "k string, x int, y int")
    r = trend_slope(df, ["k"], "x", "y").collect()[0]
    assert r["slope_ppm"] == -333_333
    assert r["intercept_ppm"] == 1_000_000


def test_trend_slope_moments_merge_partition_invariant(spark):
    from opentelemetry_collector_spark.operators.aggregate import trend_slope

    rows = [("k", i % 17, (i * 31) % 23) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, x int, y int")
    a = trend_slope(df.coalesce(1), ["k"], "x", "y").collect()[0]
    b = trend_slope(df.repartition(16), ["k"], "x", "y").collect()[0]
    assert tuple(a) == tuple(b)


def test_trend_residual_detector_ignores_steady_growth(spark, tmp_path):
    """The q176 composition property: a perfectly growing series has zero
    residuals everywhere — nothing flags; the same series with one crashed
    day flags exactly that day."""
    import datetime as dt
    from opentelemetry_collector_spark.plans.queries import (
        q176_trend_residual_anomalies,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(12):
        # steady growth: 10 + 2*day events on each day
        n = 10 + 2 * day
        # crashed day for the 'crash' type: day 6 loses most of its volume
        n_crash = 2 if day == 6 else n
        for i in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day, seconds=i), 1, "steady", 1.0, "{}"))
        for i in range(n_crash):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day, seconds=i), 2, "crash", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    sf = str(tmp_path / "sf")
    import os
    os.makedirs(sf)
    df.write.parquet(f"{sf}/events.parquet")
    out = q176_trend_residual_anomalies(spark, sf).collect()
    steady = [r for r in out if r["event_type"] == "steady"]
    crash = [r for r in out if r["event_type"] == "crash"]
    assert steady and not any(r["is_anomaly"] for r in steady)
    flagged = [r["day_idx"] for r in crash if r["is_anomaly"]]
    assert 6 in flagged


def test_rank_normalize_ties_share_cdf_without_tiebreak(spark):
    from opentelemetry_collector_spark.operators.aggregate import rank_normalize

    # values 1,2,2,2,3 + NULL: min-rank -> cdf 200, 400, 400, 400, 1000
    rows = [("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 2.0), ("a", 3, 2.0),
            ("a", 4, 3.0), ("a", 5, None)]
    df = spark.createDataFrame(rows, "k string, id int, value double")
    got = {r["id"]: r["cdf_pm"] for r in
           rank_normalize(df, ["k"], "value").collect()}
    assert got == {0: 200, 1: 400, 2: 400, 3: 400, 4: 1000, 5: None}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="key"):
        rank_normalize(df, [], "value")


def test_rank_normalize_single_exchange_and_partition_invariance(spark):
    from opentelemetry_collector_spark.operators.aggregate import rank_normalize

    rows = [("k", i, float((i * 13) % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, id int, value double")
    a = {r["id"]: r["cdf_pm"] for r in rank_normalize(df.coalesce(1), ["k"], "value").collect()}
    b = {r["id"]: r["cdf_pm"] for r in rank_normalize(df.repartition(16), ["k"], "value").collect()}
    assert a == b
    plan = (rank_normalize(df, ["k"], "value")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1 and "Join" not in plan
