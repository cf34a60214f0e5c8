"""Time-series regridding operators: OHLC downsample, gap-fill + LOCF,
grid linear interpolation, EWMA smoothing.

Reference relative: the collector transports raw datapoints and its
Prometheus exporter keeps only the last value per series signature
(exporter/prometheusexporter/accumulator.go:353-384); every metrics
backend it feeds then re-grids those series — downsamples them into
fixed buckets, carries the last observation forward across empty
buckets, interpolates interior gaps and smooths them. These are those
at-rest forms over a (series keys, ts, value) frame, in the repo's
integer-exact cross-engine currency (cents in, scaled integers out).

Scale shape shared by all four: the only corpus-sized operation is ONE
partial-aggregated groupBy(keys, bucket) — every later step (grid
explode, LOCF/interp windows, EWMA recurrence) runs on the bucket- or
series-sized frame, so a 100 TB input costs one shuffle of per-bucket
partials and the windows never see raw rows.

Determinism: within a bucket, observations are totally ordered by
(ts_us, value_cents); `min_by`/`max_by` over that struct give the
open/close tiebreak both engines can replay (the oracle packs the pair
into one HUGEINT because DuckDB's min_by needs a scalar order key).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ts_us(ts: Column) -> Column:
    # unix_micros rejects TIMESTAMP_NTZ; cast through the session-UTC zone.
    return F.unix_micros(F.to_utc_timestamp(ts, "UTC"))


def _cents(value: Column) -> Column:
    return F.floor(value * 100).cast("bigint")


def _prepare(
    df: DataFrame, keys: list[str], ts: str, value: str, step_seconds: int
) -> DataFrame:
    """(keys, bucket, ts_us, value_cents) projection; NULL ts/value rows are
    refused per-row (codec discipline: junk isolates, never poisons)."""
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    if not keys:
        raise ValueError("at least one series key column is required")
    step_us = int(step_seconds) * 1_000_000
    return (
        df.filter(F.col(ts).isNotNull() & F.col(value).isNotNull())
        .select(
            *keys,
            _ts_us(F.col(ts)).alias("ts_us"),
            _cents(F.col(value)).alias("value_cents"),
        )
        .withColumn("bucket", (F.col("ts_us") - F.col("ts_us") % F.lit(step_us)) / F.lit(step_us))
        .withColumn("bucket", F.col("bucket").cast("bigint"))
    )


def ohlc_downsample(
    df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """Fixed-bucket OHLC downsample per series: open/close are the first/
    last observation in the bucket under the total (ts_us, value_cents)
    order (ties: open takes the min value, close the max — a stated rule,
    not shuffle luck), high/low/sum/count are plain aggregates. One
    partial-aggregated shuffle on (keys, bucket); integer cents end to end.

    Plan note: the struct-ordered min_by/max_by compiles to SortAggregate
    (struct aggregation buffers are not hash-able), so the exact tiebreak
    costs a per-task sort — the shuffle still carries only per-bucket
    partials, which is the property that matters at 100 TB.
    """
    obs = _prepare(df, keys, ts, value, step_seconds)
    pair = F.struct(F.col("ts_us"), F.col("value_cents"))
    return (
        obs.groupBy(*keys, "bucket")
        .agg(
            F.min_by(F.col("value_cents"), pair).alias("open_cents"),
            F.max_by(F.col("value_cents"), pair).alias("close_cents"),
            F.max("value_cents").alias("high_cents"),
            F.min("value_cents").alias("low_cents"),
            F.sum("value_cents").cast("bigint").alias("sum_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        )
    )


def _bucket_grid(obs: DataFrame, keys: list[str]) -> DataFrame:
    """Dense [min_bucket, max_bucket] grid per series, LEFT-joined back to
    the per-bucket observations. Both inputs are already bucket-sized."""
    span = obs.groupBy(*keys).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = span.select(
        *keys, F.explode(F.sequence(F.col("_b0"), F.col("_b1"))).alias("bucket")
    )
    return grid.join(obs, [*keys, "bucket"], "left")


def gapfill_locf(
    df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """Gap-filling with last-observation-carried-forward (the TimescaleDB
    time_bucket_gapfill + locf shape): per series, a dense bucket grid
    from first to last observed bucket; empty buckets inherit the latest
    earlier observation (bucket representative = last observation in the
    bucket, same close tiebreak as ohlc_downsample) and are flagged
    filled=1. The leading bucket always has an observation by
    construction, so LOCF never emits NULL.
    """
    obs = _prepare(df, keys, ts, value, step_seconds)
    pair = F.struct(F.col("ts_us"), F.col("value_cents"))
    per_bucket = obs.groupBy(*keys, "bucket").agg(
        F.max_by(F.col("value_cents"), pair).alias("_last"),
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
    )
    filled = _bucket_grid(per_bucket, keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        *keys,
        "bucket",
        F.last(F.col("_last"), ignorenulls=True).over(w).alias("value_cents"),
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("bigint").alias("n_obs"),
        F.col("_last").isNull().cast("int").alias("filled"),
    )


def interpolate_linear(
    df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """Gap-filling with linear interpolation between the surrounding
    observed buckets (the TimescaleDB interpolate shape, on the grid):
    empty interior buckets get value = prev + (next-prev) * elapsed/span,
    computed as one bigint expression
    (prev*(next_b - b) + next*(b - prev_b)) div (next_b - prev_b)
    so both engines agree bit-for-bit on non-negative cents (where SQL
    truncating and flooring division coincide; the grid never has a gap
    without both neighbors because it spans first..last observation).
    """
    obs = _prepare(df, keys, ts, value, step_seconds)
    pair = F.struct(F.col("ts_us"), F.col("value_cents"))
    per_bucket = obs.groupBy(*keys, "bucket").agg(
        F.max_by(F.col("value_cents"), pair).alias("_anchor"),
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
    )
    filled = _bucket_grid(per_bucket, keys)
    anchor = F.struct(F.col("bucket"), F.col("_anchor"))
    w_back = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    with_nbrs = filled.select(
        *keys,
        "bucket",
        "_anchor",
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("bigint").alias("n_obs"),
        F.last(
            F.when(F.col("_anchor").isNotNull(), anchor), ignorenulls=True
        ).over(w_back).alias("_prev"),
        F.first(
            F.when(F.col("_anchor").isNotNull(), anchor), ignorenulls=True
        ).over(w_fwd).alias("_next"),
    )
    prev_b = F.col("_prev.bucket")
    prev_v = F.col("_prev._anchor")
    next_b = F.col("_next.bucket")
    next_v = F.col("_next._anchor")
    interp = (
        prev_v * (next_b - F.col("bucket")) + next_v * (F.col("bucket") - prev_b)
    ).cast("bigint")
    span = (next_b - prev_b).cast("bigint")
    # exact floor division for non-negative bigints: subtract the remainder
    # first so the final divide is an integer-exact double op
    interp_div = ((interp - F.pmod(interp, span)) / span).cast("bigint")
    return with_nbrs.select(
        *keys,
        "bucket",
        F.when(F.col("_anchor").isNotNull(), F.col("_anchor"))
        .otherwise(interp_div)
        .alias("value_cents"),
        "n_obs",
        F.col("_anchor").isNull().cast("int").alias("filled"),
    )


def ewma(
    df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
    alpha: float = 0.25,
) -> DataFrame:
    """Per-series exponentially-weighted moving average over the raw
    observations: s_0 = x_0, s_t = (1-alpha)*s_{t-1} + alpha*x_t, rows
    totally ordered by (ts_us, value_cents). Inherently a sequential
    recurrence, so this is the repo's sanctioned non-JVM path: one
    applyInPandas whose body is the Arrow-vectorized pandas C kernel
    (`Series.ewm(adjust=False).mean()`), never a per-row Python loop.

    Cross-engine exactness: the pandas kernel computes
    ((1-a)*s + a*x) / ((1-a) + a); for every double a in (0, 1] the
    denominator is exactly 1.0 (Sterbenz exactness for a >= 0.5, and the
    re-add rounds back to 1.0 below it — verified by exhaustive random
    search), so the kernel is bit-identical to the plain recurrence
    s = fl(1-a)*s + a*x, which an oracle replays with the same two
    literals — the q155 DuckDB recursive CTE does exactly that. Output is
    floor(s * 10_000) (hundredths of a cent) so the hash compares
    integers, not float formatting.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    obs = (
        df.filter(F.col(ts).isNotNull() & F.col(value).isNotNull())
        .select(
            *keys,
            _ts_us(F.col(ts)).alias("ts_us"),
            _cents(F.col(value)).alias("value_cents"),
        )
    )
    schema_parts = [
        f"{k} {obs.schema[k].dataType.simpleString()}" for k in keys
    ] + ["ts_us bigint", "value_cents bigint", "ewma_centi bigint"]
    out_schema = ", ".join(schema_parts)
    key_cols = list(keys)

    def _smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["ts_us", "value_cents"], kind="mergesort")
        s = pdf["value_cents"].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        pdf["ewma_centi"] = np.floor(s.to_numpy() * 10_000.0).astype("int64")
        return pdf[[*key_cols, "ts_us", "value_cents", "ewma_centi"]]

    return obs.groupBy(*keys).applyInPandas(_smooth, schema=out_schema)


def cusum_drift(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    target_cents: int = 0,
    slack_cents: int = 0,
    threshold_cents: int = 1,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """One-sided CUSUM drift detection per series (Page 1954) — the
    changepoint alarm a metrics backend runs over the series the collector
    transports (the sequential complement of the median/MAD point-anomaly
    flags): ``C_i = max(0, C_{i-1} + x_i - target - slack)``, alarm when
    ``C_i > threshold``.

    The recurrence looks inherently sequential, but has an exact windowed
    closed form BOTH engines can evaluate: with
    ``y_i = x_i - target - slack`` and prefix sum ``S_i``,
    ``C_i = S_i - min(0, min_{j<=i} S_j)`` — a running sum and a running
    min over the SAME frame. So the whole detector is two window
    aggregates on ONE ``hashpartitioning(keys)`` exchange: no
    applyInPandas, no recursion, no driver loop; a 100 TB scan costs one
    per-series sort, the same bound as any keyed window. All arithmetic in
    integer cents — bit-identical across engines and partitionings.

    Rows are totally ordered by ``(ts_us, value_cents, *tiebreak)``; pass
    a unique ``tiebreak`` (e.g. an event id) when same-instant same-value
    rows are possible, otherwise their C values could swap between
    engines. NULL ts/value rows are refused per-row (junk isolates).

    Returns (keys..., tiebreak..., ts_us, value_cents, cusum_cents, alarm).
    """
    if threshold_cents <= 0:
        raise ValueError(f"threshold_cents must be positive, got {threshold_cents}")
    if not keys:
        raise ValueError("at least one series key column is required")
    tb = list(tiebreak or [])
    obs = df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()).select(
        *keys,
        *tb,
        _ts_us(F.col(ts_col)).alias("ts_us"),
        _cents(F.col(value_col)).alias("value_cents"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("ts_us", "value_cents", *tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = F.col("value_cents") - F.lit(int(target_cents) + int(slack_cents))
    obs = obs.withColumn("_s", F.sum(y).over(w))
    obs = obs.withColumn("_m", F.min("_s").over(w))
    cusum = F.col("_s") - F.least(F.col("_m"), F.lit(0).cast("bigint"))
    return obs.select(
        *keys,
        *tb,
        "ts_us",
        "value_cents",
        cusum.cast("bigint").alias("cusum_cents"),
        (cusum > F.lit(int(threshold_cents))).alias("alarm"),
    )


def threshold_hysteresis(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    hi_cents: int = 0,
    lo_cents: int = 0,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Two-threshold (Schmitt-trigger) alerting per series: alert turns ON
    when the value exceeds ``hi_cents``, OFF only when it drops below
    ``lo_cents``, and HOLDS in between — the flapping suppression every
    alert manager applies so a series oscillating around one threshold
    doesn't page on every sample (the stateful complement of
    :func:`cusum_drift`'s accumulation detector).

    The state recurrence is "carry the last crossing", which both engines
    express exactly as ``last(crossing IGNORE NULLS)`` over the running
    frame: samples above hi emit TRUE, below lo emit FALSE, the dead band
    emits NULL and inherits. One window on ONE ``hashpartitioning(keys)``
    exchange; a lag over the same frame marks edges. Initial state is OFF.

    Rows are totally ordered by ``(ts_us, value_cents, *tiebreak)``; NULL
    ts/value rows are refused per-row. Returns (keys..., tiebreak...,
    ts_us, value_cents, alert, is_edge).
    """
    if hi_cents <= lo_cents:
        raise ValueError(f"need hi_cents > lo_cents, got {hi_cents} <= {lo_cents}")
    if not keys:
        raise ValueError("at least one series key column is required")
    tb = list(tiebreak or [])
    obs = df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()).select(
        *keys,
        *tb,
        _ts_us(F.col(ts_col)).alias("ts_us"),
        _cents(F.col(value_col)).alias("value_cents"),
    )
    order = [F.col("ts_us"), F.col("value_cents"), *[F.col(c) for c in tb]]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy(*keys).orderBy(*order)
    sig = (
        F.when(F.col("value_cents") > F.lit(int(hi_cents)), F.lit(True))
        .when(F.col("value_cents") < F.lit(int(lo_cents)), F.lit(False))
    )
    obs = obs.withColumn("alert", F.coalesce(F.last(sig, ignorenulls=True).over(w), F.lit(False)))
    return obs.select(
        *keys,
        *tb,
        "ts_us",
        "value_cents",
        "alert",
        (
            F.col("alert") != F.coalesce(F.lag("alert").over(wl), F.lit(False))
        ).alias("is_edge"),
    )
