"""Goldens for the time-series regridding operators (timeseries.py):
OHLC downsample, gap-fill + LOCF, grid linear interpolation, EWMA.

The DuckDB oracles (q152-q155) prove whole-query cross-engine equality;
these tests pin the semantics on hand-built series where every bucket's
fate is known — in-bucket tie rules, gap shapes, exact interpolation
arithmetic, and the recurrence vs a pure-Python replay.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from opentelemetry_collector_spark.operators.timeseries import (
    ewma,
    gapfill_locf,
    interpolate_linear,
    ohlc_downsample,
)

COLS = "series string, ts timestamp, value double"
BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(seconds):
    return BASE + dt.timedelta(seconds=seconds)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _by_bucket(df, *extra):
    rows = df.collect()
    return {
        (r["series"], r["bucket"]): tuple(r[c] for c in extra) for r in rows
    }


def test_ohlc_golden_with_tie_rules(spark):
    # bucket 0 (0..3600s): obs at t=10 (2.00), t=10 (1.00) [ts tie], t=100 (9.00)
    #   open: ts tie at t=10 -> min value 100 cents; close: t=100 -> 900
    # bucket 1: single obs
    df = spark.createDataFrame(
        [
            ("a", _t(10), 2.00),
            ("a", _t(10), 1.00),
            ("a", _t(100), 9.00),
            ("a", _t(3700), 5.00),
            ("b", _t(50), 3.00),
        ],
        COLS,
    )
    out = ohlc_downsample(df, ["series"], ts="ts", value="value", step_seconds=3600)
    got = _by_bucket(
        out, "open_cents", "close_cents", "high_cents", "low_cents", "sum_cents", "n_obs"
    )
    b0 = int(_t(0).replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert got[("a", b0)] == (100, 900, 900, 100, 1200, 3)
    assert got[("a", b0 + 1)] == (500, 500, 500, 500, 500, 1)
    assert got[("b", b0)] == (300, 300, 300, 300, 300, 1)


def test_ohlc_close_tie_takes_max_value(spark):
    # two obs at the SAME timestamp: close = max value, open = min value
    df = spark.createDataFrame(
        [("a", _t(10), 4.00), ("a", _t(10), 7.00)], COLS
    )
    row = ohlc_downsample(df, ["series"], step_seconds=3600).collect()[0]
    assert (row["open_cents"], row["close_cents"]) == (400, 700)


def test_ohlc_single_corpus_exchange_with_partial_agg(spark):
    df = spark.createDataFrame([("a", _t(10), 1.0)], COLS)
    plan = _plan(ohlc_downsample(df, ["series"], step_seconds=3600))
    assert plan.count("Exchange") == 1
    # struct-ordered min_by/max_by compiles to SortAggregate (struct agg
    # buffers are not hash-able); what matters at scale is that the PARTIAL
    # aggregate runs before the one shuffle, so only per-bucket partials move
    assert "partial_min_by" in plan
    assert plan.index("partial_min_by") > plan.index("Exchange")  # map side


def test_gapfill_locf_golden(spark):
    # hourly buckets: obs in bucket 0 (val 1.00 then 2.00) and bucket 3 (9.00)
    # -> grid 0..3, buckets 1,2 filled with bucket 0's LAST value (2.00)
    df = spark.createDataFrame(
        [
            ("a", _t(100), 1.00),
            ("a", _t(200), 2.00),
            ("a", _t(3 * 3600 + 5), 9.00),
        ],
        COLS,
    )
    out = gapfill_locf(df, ["series"], step_seconds=3600)
    rows = sorted(out.collect(), key=lambda r: r["bucket"])
    assert [r["value_cents"] for r in rows] == [200, 200, 200, 900]
    assert [r["filled"] for r in rows] == [0, 1, 1, 0]
    assert [r["n_obs"] for r in rows] == [2, 0, 0, 1]
    assert all(r["value_cents"] is not None for r in rows)


def test_gapfill_leading_bucket_always_observed(spark):
    # grid starts at the first OBSERVED bucket, so LOCF never yields NULL
    df = spark.createDataFrame(
        [("a", _t(10 * 3600), 5.00), ("a", _t(12 * 3600), 7.00)], COLS
    )
    out = gapfill_locf(df, ["series"], step_seconds=3600)
    assert out.count() == 3
    assert out.filter("value_cents IS NULL").count() == 0


def test_interpolate_golden_exact_arithmetic(spark):
    # obs bucket 0 -> 1.00 (100c), bucket 3 -> 10.00 (1000c); gap at 1, 2:
    #   b1: (100*2 + 1000*1) div 3 = 1200 div 3 = 400
    #   b2: (100*1 + 1000*2) div 3 = 2100 div 3 = 700
    df = spark.createDataFrame(
        [("a", _t(100), 1.00), ("a", _t(3 * 3600 + 10), 10.00)], COLS
    )
    out = interpolate_linear(df, ["series"], step_seconds=3600)
    rows = sorted(out.collect(), key=lambda r: r["bucket"])
    assert [r["value_cents"] for r in rows] == [100, 400, 700, 1000]
    assert [r["filled"] for r in rows] == [0, 1, 1, 0]


def test_interpolate_floor_division(spark):
    # obs 0 -> 0.00, bucket 2 -> 0.01 (1 cent): midpoint 0.5c floors to 0
    df = spark.createDataFrame(
        [("a", _t(100), 0.00), ("a", _t(2 * 3600), 0.01)], COLS
    )
    out = interpolate_linear(df, ["series"], step_seconds=3600)
    rows = sorted(out.collect(), key=lambda r: r["bucket"])
    assert [r["value_cents"] for r in rows] == [0, 0, 1]


def test_interpolate_observed_bucket_keeps_anchor(spark):
    # an observed bucket keeps its own last-observation anchor even when
    # neighbors would interpolate differently
    df = spark.createDataFrame(
        [
            ("a", _t(100), 1.00),
            ("a", _t(3600 + 10), 50.00),
            ("a", _t(2 * 3600), 2.00),
        ],
        COLS,
    )
    out = interpolate_linear(df, ["series"], step_seconds=3600)
    rows = sorted(out.collect(), key=lambda r: r["bucket"])
    assert [r["value_cents"] for r in rows] == [100, 5000, 200]
    assert [r["filled"] for r in rows] == [0, 0, 0]


def _ewma_ref(values, alpha):
    acc = float(values[0])
    out = [acc]
    for v in values[1:]:
        acc = (1.0 - alpha) * acc + alpha * float(v)
        out.append(acc)
    return [math.floor(x * 10_000.0) for x in out]


def test_ewma_matches_pure_python_recurrence(spark):
    vals = [1.00, 5.00, 2.00, 8.00, 3.00, 3.00, 100.00, 0.50]
    df = spark.createDataFrame(
        [("a", _t(i * 60), v) for i, v in enumerate(vals)], COLS
    )
    out = ewma(df, ["series"], alpha=0.25)
    rows = sorted(out.collect(), key=lambda r: r["ts_us"])
    assert [r["ewma_centi"] for r in rows] == _ewma_ref(
        [int(v * 100) for v in vals], 0.25
    )


def test_ewma_tie_order_is_value_sorted(spark):
    # two obs at the same timestamp: recurrence consumes min value first
    df = spark.createDataFrame(
        [("a", _t(0), 8.00), ("a", _t(0), 2.00)], COLS
    )
    rows = ewma(df, ["series"], alpha=0.5).collect()
    by_val = {r["value_cents"]: r["ewma_centi"] for r in rows}
    assert by_val[200] == 200 * 10_000  # first row seeds the recurrence
    assert by_val[800] == math.floor((0.5 * 200 + 0.5 * 800) * 10_000)


def test_ewma_rejects_out_of_range_alpha(spark):
    df = spark.createDataFrame([("a", _t(0), 1.0)], COLS)
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, ["series"], alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, ["series"], alpha=1.5)


def test_ewma_non_dyadic_alpha_still_matches_recurrence(spark):
    # the pandas kernel's trailing division is by exactly 1.0 for ANY
    # alpha in (0,1], so even non-dyadic alphas replay bit-for-bit
    vals = [3.00, 1.00, 4.00, 1.00, 5.00]
    df = spark.createDataFrame(
        [("a", _t(i * 60), v) for i, v in enumerate(vals)], COLS
    )
    rows = sorted(ewma(df, ["series"], alpha=0.3).collect(), key=lambda r: r["ts_us"])
    assert [r["ewma_centi"] for r in rows] == _ewma_ref(
        [int(v * 100) for v in vals], 0.3
    )


def test_ewma_plan_is_grouped_arrow_not_per_row_python(spark):
    df = spark.createDataFrame([("a", _t(0), 1.0)], COLS)
    plan = _plan(ewma(df, ["series"], alpha=0.5))
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan  # never per-row Python


def test_step_and_key_validation(spark):
    df = spark.createDataFrame([("a", _t(0), 1.0)], COLS)
    with pytest.raises(ValueError, match="step_seconds"):
        ohlc_downsample(df, ["series"], step_seconds=0)
    with pytest.raises(ValueError, match="key"):
        gapfill_locf(df, [], step_seconds=60)


def test_null_rows_are_refused_per_row(spark):
    df = spark.createDataFrame(
        [("a", _t(10), 1.00), ("a", None, 9.00), ("a", _t(20), None)], COLS
    )
    out = ohlc_downsample(df, ["series"], step_seconds=3600)
    row = out.collect()[0]
    assert (row["n_obs"], row["sum_cents"]) == (1, 100)


def _cusum_ref(values, target, slack, threshold):
    """Pure-Python recurrence: C_i = max(0, C_{i-1} + x - target - slack)."""
    c, out = 0, []
    for x in values:
        c = max(0, c + x - target - slack)
        out.append((c, c > threshold))
    return out


def test_cusum_matches_pure_python_recurrence(spark):
    from opentelemetry_collector_spark.operators.timeseries import cusum_drift

    vals = [50, 80, 10, 90, 90, 90, 5, 5, 70, 200]
    rows = [("s", i, _t(i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "series string, id int, ts timestamp, value double")
    got = {
        r["id"]: (r["cusum_cents"], r["alarm"])
        for r in cusum_drift(
            df, ["series"], target_cents=5000, slack_cents=500,
            threshold_cents=8000, tiebreak=["id"],
        ).collect()
    }
    ref = _cusum_ref([v * 100 for v in vals], 5000, 500, 8000)
    assert got == dict(enumerate(ref))


def test_cusum_resets_through_running_min(spark):
    """After a deep negative excursion the detector must restart from zero,
    not from the (clamped-away) negative mass."""
    from opentelemetry_collector_spark.operators.timeseries import cusum_drift

    vals = [100, 100, 0, 0, 0, 0, 100, 100]   # target 50: up, drain, up again
    rows = [("s", i, _t(i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "series string, id int, ts timestamp, value double")
    got = [
        r["cusum_cents"]
        for r in cusum_drift(
            df, ["series"], target_cents=5000, threshold_cents=9000, tiebreak=["id"]
        ).collect()
    ]
    assert got == [c for c, _ in _cusum_ref([v * 100 for v in vals], 5000, 0, 9000)]
    # the two post-drain climbs are identical to the first two steps
    assert got[6:8] == got[0:2]


def test_cusum_series_isolation_and_junk(spark):
    from opentelemetry_collector_spark.operators.timeseries import cusum_drift

    rows = [
        ("a", 0, _t(0), 100.0),
        ("b", 0, _t(0), 100.0),
        ("a", 1, None, 100.0),      # NULL ts: refused per-row
        ("a", 2, _t(2), None),      # NULL value: refused per-row
    ]
    df = spark.createDataFrame(rows, "series string, id int, ts timestamp, value double")
    out = cusum_drift(df, ["series"], target_cents=0, threshold_cents=1,
                      tiebreak=["id"]).collect()
    assert {(r["series"], r["id"]) for r in out} == {("a", 0), ("b", 0)}
    assert all(r["cusum_cents"] == 10000 for r in out)

    with pytest.raises(ValueError, match="threshold"):
        cusum_drift(df, ["series"], threshold_cents=0)
    with pytest.raises(ValueError, match="key"):
        cusum_drift(df, [], threshold_cents=1)


def test_cusum_single_exchange_windows(spark):
    """Both window aggregates (running sum + running min) must share ONE
    hashpartitioning(series) exchange — no join, no Python."""
    from opentelemetry_collector_spark.operators.timeseries import cusum_drift

    df = spark.createDataFrame(
        [("s", 0, _t(0), 1.0)], "series string, id int, ts timestamp, value double"
    )
    plan = _plan(cusum_drift(df, ["series"], threshold_cents=1, tiebreak=["id"]))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Python" not in plan and "InPandas" not in plan


def test_hysteresis_golden_with_dead_band_hold(spark):
    from opentelemetry_collector_spark.operators.timeseries import threshold_hysteresis

    # hi=1000, lo=500: rise, hold in band, drop OFF, hold, rise again
    vals = [7.0, 12.0, 8.0, 8.0, 4.0, 7.0, 11.0]
    rows = [("s", i, _t(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "series string, id int, ts timestamp, value double")
    got = {r["id"]: (r["alert"], r["is_edge"])
           for r in threshold_hysteresis(
               df, ["series"], hi_cents=1000, lo_cents=500, tiebreak=["id"]
           ).collect()}
    assert got == {
        0: (False, False),   # dead band, initial OFF
        1: (True, True),     # crossed hi
        2: (True, False),    # dead band holds ON (no flapping)
        3: (True, False),
        4: (False, True),    # dropped below lo
        5: (False, False),   # dead band holds OFF
        6: (True, True),
    }


def test_hysteresis_vs_naive_threshold_flaps_less(spark):
    """The whole point: a series oscillating inside the band produces zero
    edges after the first, where a single-threshold alert would flap."""
    from opentelemetry_collector_spark.operators.timeseries import threshold_hysteresis

    vals = [12.0] + [7.0, 11.0, 7.0, 11.0, 7.0]
    rows = [("s", i, _t(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "series string, id int, ts timestamp, value double")
    out = threshold_hysteresis(df, ["series"], hi_cents=1000, lo_cents=500,
                               tiebreak=["id"]).collect()
    assert sum(r["is_edge"] for r in out) == 1
    assert all(r["alert"] for r in out)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="hi_cents"):
        threshold_hysteresis(df, ["series"], hi_cents=500, lo_cents=500)


def test_hysteresis_single_exchange(spark):
    from opentelemetry_collector_spark.operators.timeseries import threshold_hysteresis

    df = spark.createDataFrame(
        [("s", 0, _t(0), 1.0)], "series string, id int, ts timestamp, value double"
    )
    plan = _plan(threshold_hysteresis(df, ["series"], hi_cents=2, lo_cents=1,
                                      tiebreak=["id"]))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Python" not in plan


def test_counter_rate_overflow_guard_and_negative_floor(spark):
    """Differential-fuzz regression: (1) a window whose increase*1000
    overflows bigint yields a NULL rate, not an ANSI crash; (2) a reset
    landing on a NEGATIVE sample floor-divides identically in both
    engines (pmod vs truncated %)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.aggregate import counter_rate

    base = dt.datetime(2024, 1, 1)
    rows = [
        # series 'big': birth then a gigantic jump inside one 6h window
        ("big", 1, base, 0.0),
        ("big", 2, base + dt.timedelta(minutes=1), 8.9e16),
        # series 'neg': birth at 10, reset down to -42.5 (post-reset sample
        # contributes its own value -> increase includes -4250 cents)
        ("neg", 3, base, 10.0),
        ("neg", 4, base + dt.timedelta(minutes=1), -42.5),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id int, ts timestamp, value double"
    ).select(
        "event_type", "event_id", "ts",
        (F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    # 1-second windows: increase*1000 exceeds what bigint can carry for
    # the big jump, and floor semantics matter for the negative reset
    rows2 = [r for r in counter_rate(
        df, ["event_type"], value_col="value_cents",
        window_seconds=1, tiebreak=["value_cents", "event_id"],
    ).collect() if r["increase"] is not None]
    out = {r["event_type"]: r for r in rows2}
    big = out["big"]
    assert big["increase"] == 8_900_000_000_000_000_000
    assert big["rate_milli_per_s"] is None          # 8.9e21 guarded, not crashed
    neg = out["neg"]
    # birth contributes nothing; reset sample contributes its own value
    assert neg["increase"] == -4250
    assert neg["rate_milli_per_s"] == -4_250_000    # exact, sign preserved

    # and at a 6h window the same big jump is representable and EXACT
    # (floor(8.9e21 / 21600) — a double-typed division would be off)
    r6 = [r for r in counter_rate(
        df.filter(df.event_type == "big"), ["event_type"],
        value_col="value_cents", window_seconds=6 * 3600,
        tiebreak=["value_cents", "event_id"],
    ).collect() if r["increase"] is not None][0]
    assert r6["rate_milli_per_s"] == 8_900_000_000_000_000_000 * 1000 // 21600
