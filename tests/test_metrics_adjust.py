"""Cumulative-counter adjustment (metrics_adjuster.go analog) + SLO burn.

Golden semantics pinned against the reference's MetricsAdjuster
(receiver/prometheusreceiver/internal/metrics_adjuster.go:254-305):
- isReset: current < previous  =>  new epoch;
- non-reset points inherit initial.StartTimestamp (first point of epoch);
- initial/reset points themselves have no adjusted delta.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.aggregate import (
    adjust_cumulative,
    error_budget_burn,
)

COLS = "series string, ts timestamp, value bigint"


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def counter_frame(spark):
    # series "a": grows 10->25->25->40, resets to 5 (5<40), grows to 17
    # series "b": single point (initial only, never a reset)
    rows = [
        ("a", _ts(1), 10),
        ("a", _ts(2), 25),
        ("a", _ts(3), 25),  # flat: delta 0, NOT a reset (25 < 25 is false)
        ("a", _ts(4), 40),
        ("a", _ts(5), 5),   # reset
        ("a", _ts(6), 17),
        ("b", _ts(1), 7),
    ]
    return spark.createDataFrame(rows, COLS)


def test_adjust_golden(spark, counter_frame):
    out = {
        (r["series"], r["ts"]): (r["start_ts"], r["delta"], r["is_reset"])
        for r in adjust_cumulative(counter_frame, ["series"]).collect()
    }
    # epoch 1 of "a" starts at 01:00; every non-initial point carries it
    assert out[("a", _ts(1))] == (_ts(1), None, False)  # series birth, not a reset
    assert out[("a", _ts(2))] == (_ts(1), 15, False)
    assert out[("a", _ts(3))] == (_ts(1), 0, False)  # flat != reset
    assert out[("a", _ts(4))] == (_ts(1), 15, False)
    # reset: new epoch starts at 05:00, no delta on the reset point itself
    assert out[("a", _ts(5))] == (_ts(5), None, True)
    assert out[("a", _ts(6))] == (_ts(5), 12, False)
    assert out[("b", _ts(1))] == (_ts(1), None, False)


def test_adjust_total_increase_ignores_wrap_loss(spark, counter_frame):
    # sum(delta) per series = total observed increase across epochs —
    # the quantity increase() reports (reset points contribute nothing)
    out = adjust_cumulative(counter_frame, ["series"])
    got = {
        r["series"]: r["inc"]
        for r in out.groupBy("series").agg(F.sum("delta").alias("inc")).collect()
    }
    assert got == {"a": 42, "b": None}  # 15+0+15+12; b has no adjusted point


def test_adjust_single_exchange(spark, counter_frame):
    plan = _plan(adjust_cumulative(counter_frame, ["series"]))
    # lag + running max share one hashpartitioning(series) exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_adjust_empty(spark):
    df = spark.createDataFrame([], COLS)
    assert adjust_cumulative(df, ["series"]).count() == 0


def test_burn_golden(spark):
    # tenant "t1" hour 1: 3 errors / 4 rows (750000 ppm, breach)
    #            hour 2: 0 errors / 4 rows
    #            day ratio: 3/8 = 375000 ppm (breach) => hour 1 fast_burn
    # tenant "t2": 1 error / 8 rows in one hour => 125000 ppm, no breach
    rows = [("t1", _ts(1, i), i < 3) for i in range(4)]
    rows += [("t1", _ts(2, i), False) for i in range(4)]
    rows += [("t2", _ts(1, i), i == 0) for i in range(8)]
    df = spark.createDataFrame(rows, "tenant string, ts timestamp, is_err boolean")
    out = error_budget_burn(df, ["tenant"], "is_err", budget_ppm=150_000)
    got = {(r["tenant"], r["bucket"]): r for r in out.collect()}
    r11 = got[("t1", _ts(1))]
    assert (r11["n_total"], r11["n_err"], r11["err_ppm"]) == (4, 3, 750_000)
    assert (r11["n_total_long"], r11["n_err_long"], r11["err_ppm_long"]) == (8, 3, 375_000)
    assert r11["fast_burn"]
    r12 = got[("t1", _ts(2))]
    assert (r12["err_ppm"], r12["err_ppm_long"], r12["fast_burn"]) == (0, 375_000, False)
    r2 = got[("t2", _ts(1))]
    assert (r2["err_ppm"], r2["fast_burn"]) == (125_000, False)


def test_burn_single_scan_plan(spark):
    rows = [("t", _ts(1), True)]
    df = spark.createDataFrame(rows, "tenant string, ts timestamp, is_err boolean")
    plan = _plan(error_budget_burn(df, ["tenant"], "is_err"))
    # partial HashAggregate before the shuffle (map-side combine over the
    # raw rows); the long window re-shuffles only the tiny hourly frame
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 2


def test_adjust_null_samples_bridged_not_resets(spark):
    # a NULL value is not a datapoint: [10, NULL, 12] must read as one
    # epoch with delta 2, never a spurious reset at t3 (and the row count
    # matches the streaming operator, which filters NULLs the same way)
    rows = [("a", _ts(1), 10), ("a", _ts(2), None), ("a", _ts(3), 12)]
    df = spark.createDataFrame(rows, COLS)
    got = {r["ts"]: (r["start_ts"], r["delta"], r["is_reset"])
           for r in adjust_cumulative(df, ["series"]).collect()}
    assert len(got) == 2
    assert got[_ts(1)] == (_ts(1), None, False)
    assert got[_ts(3)] == (_ts(1), 2, False)


def test_q87_q89_oracle_parity_on_degenerate_events(spark, tmp_path):
    """The two review repros: (1) an extreme value sharing a series with a
    normal sample must degrade to a NULL sample in BOTH engines, never
    ANSI-abort the running sum (Spark floor(double) saturates to
    Long.MaxValue); (2) a span at the Unix epoch encodes timestamp=0 on
    the zipkin v1 wire and must read back ABSENT in both engines."""
    import datetime as dt

    import duckdb

    from opentelemetry_collector_spark.plans.queries import ORACLES, QUERIES

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # same (event_type, user_id%4) series: extreme then normal
        (1, t0, 6, "purchase", 1e18, None),
        (2, t0 + dt.timedelta(seconds=1), 6, "purchase", 5.0, None),
        # epoch-exact timestamp (v1 wire cannot express it)
        (3, dt.datetime(1970, 1, 1), 2, "view", 2.0, None),
        (4, t0, 2, "click", 1.0, None),
    ]
    d = tmp_path / "sf_repro"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet").coalesce(1).write.parquet(
        str(d / "customer.parquet")
    )

    con = duckdb.connect()
    # Spark writes directories; DuckDB needs the part-file glob
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{d}/customer.parquet/*.parquet'")
    for name in ("q87_counter_adjust", "q89_zipkinv1_roundtrip"):
        spk = QUERIES[name](spark, str(d)).toPandas()
        dk = con.sql(ORACLES[name]).df()
        spk = spk[sorted(spk.columns)].sort_values(sorted(spk.columns)).reset_index(drop=True)
        dk = dk[sorted(dk.columns)].sort_values(sorted(dk.columns)).reset_index(drop=True)
        for c in spk.columns:
            if str(spk[c].dtype).startswith("datetime"):
                spk[c] = spk[c].astype("datetime64[us]")
                dk[c] = dk[c].astype("datetime64[us]")
        import pandas.testing as pdt

        pdt.assert_frame_equal(
            spk.astype(object).where(spk.notna(), None),
            dk.astype(object).where(dk.notna(), None),
            check_dtype=False,
        ), name


def test_accumulate_deltas_roundtrip_inverse(spark):
    # delta -> cumulative -> adjust recovers the deltas (no resets: a
    # cumulative built from nonnegative deltas is monotone)
    from opentelemetry_collector_spark.operators.aggregate import accumulate_deltas

    rows = [("a", _ts(1), 10), ("a", _ts(2), 0), ("a", _ts(3), 5), ("b", _ts(1), 3)]
    df = spark.createDataFrame(rows, "series string, ts timestamp, delta bigint")
    cum = accumulate_deltas(df, ["series"])
    got = {(r["series"], r["ts"]): r["cumulative"] for r in cum.collect()}
    assert got == {("a", _ts(1)): 10, ("a", _ts(2)): 10, ("a", _ts(3)): 15, ("b", _ts(1)): 3}
    back = adjust_cumulative(cum.select("series", "ts", F.col("cumulative").alias("value")), ["series"])
    rec = {(r["series"], r["ts"]): (r["delta"], r["is_reset"]) for r in back.collect()}
    # first point of each series has no baseline; the rest recover exactly
    assert rec[("a", _ts(2))] == (0, False)
    assert rec[("a", _ts(3))] == (5, False)
    assert rec[("a", _ts(1))] == (None, False)


def test_robust_anomalies_flags_outlier_and_survives_degenerate_series(spark):
    """Median/MAD doubled-integer goldens: series [10,10,10,12,100] has
    med=10, devs [0,0,0,2,90], MAD=0... use [10,12,10,14,100]: med=12?
    sorted [10,10,12,14,100] -> med 12, devs [2,2,0,2,88], sorted
    [0,2,2,2,88] -> MAD 2; flag iff dev > 3.5*2=7 -> only 100."""
    from opentelemetry_collector_spark.operators.aggregate import robust_anomalies

    rows = [("k", v) for v in [10, 10, 12, 14, 100]]
    df = spark.createDataFrame(rows, "key string, v bigint")
    got = {
        r["v"]: (r["is_anomaly"], r["med2"], r["mad4"], r["score_pm"])
        for r in robust_anomalies(df, ["key"], "v").collect()
    }
    assert got[100] == (True, 24, 8, 44000)  # dev2=176, 176*2000/8 = 44000
    assert not any(got[v][0] for v in (10, 12, 14))

    # constant series: MAD == 0 -> any deviation flags, constants never do
    const = spark.createDataFrame([("c", 5)] * 4 + [("c", 6)], "key string, v bigint")
    got2 = {r["v"]: r["is_anomaly"] for r in robust_anomalies(const, ["key"], "v").collect()}
    assert got2 == {5: False, 6: True}


def test_robust_anomalies_even_count_half_median_and_nulls(spark):
    from opentelemetry_collector_spark.operators.aggregate import robust_anomalies

    # [1, 2]: med = 1.5 -> med2 = 3 (exact, no float drift); NULL passes through
    df = spark.createDataFrame(
        [("k", 1), ("k", 2), ("k", None)], "key string, v bigint"
    )
    got = {r["v"]: r for r in robust_anomalies(df, ["key"], "v").collect()}
    assert got[1]["med2"] == 3 and got[2]["med2"] == 3
    assert got[None]["is_anomaly"] is False and got[None]["score_pm"] == 0


def test_robust_anomalies_single_exchange_plan(spark):
    from opentelemetry_collector_spark.operators.aggregate import robust_anomalies

    df = spark.createDataFrame([("k", 1), ("k", 2)], "key string, v bigint")
    plan = (
        robust_anomalies(df, ["key"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_role_transitions_golden_and_boundary_isolation(spark):
    """Two conversations; transitions never cross the conv boundary."""
    from opentelemetry_collector_spark.operators.aggregate import role_transitions

    rows = [
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "user"),
        ("c2", 0, "assistant"), ("c2", 1, "user"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {
        (r["from_role"], r["to_role"]): (r["n_transitions"], r["p_pm"])
        for r in role_transitions(df).collect()
    }
    # user outgoing: 2 edges to assistant? no: c1 user(0)->assistant(1),
    # assistant(1)->user(2); c2 assistant(0)->user(1).
    assert got == {
        ("user", "assistant"): (1, 1000),
        ("assistant", "user"): (2, 1000),
    }


def test_counter_rate_reset_restarts_from_zero(spark):
    from opentelemetry_collector_spark.operators.aggregate import counter_rate

    # series: 10, 15, 3 (reset), 8 within one hour window
    rows = [
        ("s", 1, _ts(0, 0), 10),
        ("s", 2, _ts(0, 10), 15),
        ("s", 3, _ts(0, 20), 3),
        ("s", 4, _ts(0, 30), 8),
    ]
    df = spark.createDataFrame(rows, "series string, id int, ts timestamp, v long")
    out = counter_rate(
        df, ["series"], value_col="v", window_seconds=3600, tiebreak=["v", "id"]
    ).collect()
    assert len(out) == 1
    r = out[0]
    # increases: 5 (10->15), 3 (reset: restart from zero), 5 (3->8); first
    # sample has no baseline and contributes nothing
    assert (r["increase"], r["n_deltas"]) == (13, 3)
    assert r["rate_milli_per_s"] == (13 * 1000) // 3600


def test_counter_rate_delta_attributed_to_later_window(spark):
    from opentelemetry_collector_spark.operators.aggregate import counter_rate

    rows = [
        ("s", 1, _ts(0, 50), 10),
        ("s", 2, _ts(1, 10), 25),  # increase 15 lands in hour-1 bucket
    ]
    df = spark.createDataFrame(rows, "series string, id int, ts timestamp, v long")
    got = {
        r["bucket"] % 24: (r["increase"], r["n_deltas"])
        for r in counter_rate(
            df, ["series"], value_col="v", window_seconds=3600, tiebreak=["v", "id"]
        ).collect()
    }
    assert got[0] == (None, 0)  # only the baseline-less first sample
    assert got[1] == (15, 1)


def test_counter_rate_rejects_bad_window(spark):
    from opentelemetry_collector_spark.operators.aggregate import counter_rate

    df = spark.createDataFrame([("s", _ts(0), 1)], "series string, ts timestamp, v long")
    with pytest.raises(ValueError, match="window_seconds"):
        counter_rate(df, ["series"], value_col="v", window_seconds=0)
