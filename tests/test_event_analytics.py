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
