"""Bucketed interval join (operators/rangejoin.py).

Gate: exactly the naive inequality join's rows, through a binned EQUI-join
plan (no BroadcastNestedLoopJoin) — the range-join trap Catalyst itself
does not solve.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.rangejoin import interval_join

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)


def _ts(minutes, seconds=0):
    return T0 + dt.timedelta(minutes=minutes, seconds=seconds)


def _frames(spark):
    events = spark.createDataFrame(
        [
            ("e1", _ts(0)),
            ("e2", _ts(4, 59)),
            ("e3", _ts(5)),       # closed-interval boundary of w1
            ("e4", _ts(5, 1)),    # just outside w1
            ("e5", _ts(61)),      # inside w2 only
            ("e6", _ts(200)),     # inside nothing
            ("e7", None),         # NULL ts never matches
        ],
        "event_id string, ts timestamp",
    )
    windows = spark.createDataFrame(
        [
            ("w1", _ts(0), _ts(5)),
            ("w2", _ts(60), _ts(90)),
            ("w3", _ts(3), _ts(70)),   # overlaps w1+w2 — events match BOTH
            ("w4", None, _ts(10)),     # NULL bound never matches
        ],
        "window_id string, w_start timestamp, w_end timestamp",
    )
    return events, windows


def _naive(events, windows):
    return events.join(
        windows,
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end")),
        "inner",
    )


def test_matches_naive_inequality_join_across_bin_sizes(spark):
    events, windows = _frames(spark)
    want = {(r.event_id, r.window_id) for r in _naive(events, windows).collect()}
    assert ("e3", "w1") in want and ("e5", "w3") in want  # fixture sanity
    for bin_seconds in (30, 300, 3600):
        got = {
            (r.event_id, r.window_id)
            for r in interval_join(
                events, windows, "ts", "w_start", "w_end", bin_seconds
            ).collect()
        }
        assert got == want, f"bin={bin_seconds}"


def test_plan_is_equi_join_not_nested_loop(spark):
    events, windows = _frames(spark)
    out = interval_join(events, windows, "ts", "w_start", "w_end", 300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    naive_plan = _naive(events, windows)._jdf.queryExecution().executedPlan().toString()
    # the trap this avoids: the bare inequality join has no equi keys
    assert "BroadcastNestedLoopJoin" in naive_plan or "CartesianProduct" in naive_plan


def test_extra_key_restricts_matches(spark):
    events = spark.createDataFrame(
        [("a", "e1", _ts(1)), ("b", "e2", _ts(1))], "tenant string, event_id string, ts timestamp"
    )
    windows = spark.createDataFrame(
        [("a", "w1", _ts(0), _ts(5))], "tenant string, window_id string, w_start timestamp, w_end timestamp"
    )
    got = interval_join(
        events, windows, "ts", "w_start", "w_end", 60, extra_keys=["tenant"]
    ).collect()
    assert [(r.event_id, r.window_id) for r in got] == [("e1", "w1")]


def test_duplicate_event_rows_survive_as_multiset(spark):
    events = spark.createDataFrame(
        [("e1", _ts(1)), ("e1", _ts(1))], "event_id string, ts timestamp"
    )
    windows = spark.createDataFrame(
        [("w1", _ts(0), _ts(5))], "window_id string, w_start timestamp, w_end timestamp"
    )
    assert interval_join(events, windows, "ts", "w_start", "w_end", 60).count() == 2


def test_oversized_window_and_ambiguous_columns_rejected(spark):
    import pytest

    events, windows = _frames(spark)
    # a window wider than bin*65536 RAISES — silently dropping it would
    # silently drop matches
    huge = spark.createDataFrame(
        [("wx", _ts(0), _ts(0) + dt.timedelta(days=400))],
        "window_id string, w_start timestamp, w_end timestamp",
    )
    with pytest.raises(ValueError, match="wider than"):
        interval_join(events, huge, "ts", "w_start", "w_end", 1)
    with pytest.raises(ValueError, match="ambiguous"):
        interval_join(events, events, "ts", "w_start", "w_end", 60)
    with pytest.raises(ValueError, match="reserved"):
        interval_join(
            events.withColumn("__itv_bin", F.lit(1)), windows, "ts", "w_start", "w_end", 60
        )


def test_inverted_window_matches_nothing_like_naive(spark):
    events, _ = _frames(spark)
    inverted = spark.createDataFrame(
        [("wx", _ts(10), _ts(0))], "window_id string, w_start timestamp, w_end timestamp"
    )
    assert interval_join(events, inverted, "ts", "w_start", "w_end", 60).count() == 0
    assert _naive(events, inverted).count() == 0
