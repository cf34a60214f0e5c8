"""Structured Streaming pipeline tests (push-path analog).

Gate: the streaming fan-out over the same input produces exactly the same
per-sink row sets as the batch pipeline (sent == received,
testbed/correctness/traces/correctness_test.go:95-100), and watermarked
window aggregates match a batch groupBy over the same data once the stream
drains (availableNow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.filters import MatchProperties, filter_records
from opentelemetry_collector_spark.operators.parse import extract_columns
from opentelemetry_collector_spark.plans.route import Route, fan_out
from opentelemetry_collector_spark.sources.transcripts import synthesize
from opentelemetry_collector_spark.streaming import (
    run_stream_pipeline,
    session_turn_counts,
    windowed_turn_counts,
)


def _routes():
    return [
        Route("sink_tools", F.col("tool_name").isNotNull()),
        Route("sink_user", F.col("role") == "user"),
    ]


def _processors():
    return [
        lambda df: extract_columns(df, "text", r"tool_call: (?P<tool_name>\w+)\((?P<arg>[^)]*)\)"),
        lambda df: filter_records(df, include=MatchProperties(columns={"role": ["user", "assistant"]})),
    ]


def _landing(spark, tmp_path, n_convs=40):
    """Write the input as several files => several pushed batches."""
    path = str(tmp_path / "landing")
    df = synthesize(spark, n_convs=n_convs, mean_turns=6, seed=42)
    df.repartition(4).write.mode("overwrite").parquet(path)
    return path, df


def test_stream_fanout_matches_batch(spark, tmp_path):
    landing, df = _landing(spark, tmp_path)
    base = str(tmp_path / "sinks")
    q = run_stream_pipeline(
        spark,
        landing,
        base,
        processors=_processors(),
        routes=_routes(),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    # batch reference over the identical input
    b = df
    for p in _processors():
        b = p(b)
    expected = fan_out(b, _routes())
    for sink in ("sink_tools", "sink_user"):
        got = spark.read.parquet(f"{base}/{sink}").drop("_epoch")
        exp = expected[sink]
        cols = ["conv_id", "turn_idx", "role", "text"]
        assert {tuple(r) for r in got.select(*cols).collect()} == {
            tuple(r) for r in exp.select(*cols).collect()
        }


def test_windowed_counts_match_batch_groupby(spark, tmp_path):
    landing, df = _landing(spark, tmp_path)
    out = []
    stream = windowed_turn_counts(
        __import__("opentelemetry_collector_spark.streaming.stream", fromlist=["x"]).read_transcript_stream(
            spark, landing
        ),
        window="1 minute",
        watermark="0 seconds",
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.win.start, r.role): r.turn_count
        for r in spark.sql("select * from win_counts").collect()
    }
    exp = {
        (r.win.start, r.role): r.turn_count
        for r in df.groupBy(F.window("ts", "1 minute").alias("win"), "role")
        .agg(F.count(F.lit(1)).alias("turn_count"))
        .collect()
    }
    assert got == exp


def test_session_windows_close_on_gap(spark):
    import datetime as dt

    base = dt.datetime(2025, 1, 1)
    rows = [
        ("c1", 0, "user", "a", None, base),
        ("c1", 1, "assistant", "b", None, base + dt.timedelta(minutes=1)),
        # > 5 min gap => second session for c1
        ("c1", 2, "user", "c", None, base + dt.timedelta(minutes=20)),
        ("c2", 0, "user", "d", None, base),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    got = session_turn_counts(df, gap="5 minutes").collect()
    per_conv = {}
    for r in got:
        per_conv.setdefault(r.conv_id, []).append(r.turn_count)
    assert sorted(per_conv["c1"]) == [1, 2]
    assert per_conv["c2"] == [1]


def test_stateful_dedup_redelivered(spark, tmp_path):
    """applyInPandasWithState exactly-once filter: overlapping redelivered
    files (the queued_retry at-least-once analog) emit each (conv, turn)
    exactly once across micro-batches."""
    import datetime as dt

    from opentelemetry_collector_spark.streaming.stream import (
        dedup_redelivered,
        read_transcript_stream,
    )

    base = dt.datetime(2025, 1, 1)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

    def rows(lo, hi):
        return [
            ("A", i, "user", f"t{i}", None, base + dt.timedelta(seconds=i)) for i in range(lo, hi)
        ]

    landing = str(tmp_path / "landing")
    # delivery 1: turns 0-4; delivery 2 (retry): turns 3-7 overlap
    spark.createDataFrame(rows(0, 5), schema).coalesce(1).write.mode("append").parquet(landing)
    spark.createDataFrame(rows(3, 8), schema).coalesce(1).write.mode("append").parquet(landing)

    stream = dedup_redelivered(read_transcript_stream(spark, landing, max_files_per_trigger=1))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r.conv_id, r.turn_idx) for r in spark.sql("select * from dedup_out").collect())
    assert got == [("A", i) for i in range(8)]  # each turn exactly once


def test_dedup_state_timeout_removes_state_not_resurrects():
    """The expiry invocation must DROP a closed conversation's state —
    pre-fix it update()d and re-armed the timer, growing the state store
    monotonically with total conversations ever seen."""
    from opentelemetry_collector_spark.streaming.stream import _dedup_state_fn

    class FakeState:
        hasTimedOut = True
        exists = True
        get = ([1, 2],)

        def __init__(self):
            self.removed = False

        def remove(self):
            self.removed = True

        def update(self, *_):
            raise AssertionError("timed-out state must be removed, not updated")

        def setTimeoutDuration(self, *_):
            raise AssertionError("timed-out state must not re-arm its timer")

    st = FakeState()
    out = list(_dedup_state_fn(60)(("c1",), iter([]), st) or [])
    assert out == [] and st.removed


def test_streaming_counter_adjust_matches_batch(spark, tmp_path):
    """adjust_cumulative_stream across micro-batches == the batch operator
    on the union: reset straddles the file boundary, epoch start carries
    through state (the MetricsAdjuster's initial.StartTimestamp)."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.aggregate import adjust_cumulative
    from opentelemetry_collector_spark.streaming.stream import (
        SERIES_SCHEMA,
        adjust_cumulative_stream,
    )

    base = dt.datetime(2025, 1, 1)

    def rows(spec):
        return [("s1", base + dt.timedelta(minutes=m), v) for m, v in spec]

    # file 1: birth + growth; file 2: continues, then resets, then grows
    f1 = rows([(0, 10), (1, 25)])
    f2 = rows([(2, 40), (3, 5), (4, 17)])
    landing = str(tmp_path / "landing")
    spark.createDataFrame(f1, SERIES_SCHEMA).coalesce(1).write.mode("append").parquet(landing)
    spark.createDataFrame(f2, SERIES_SCHEMA).coalesce(1).write.mode("append").parquet(landing)

    stream = adjust_cumulative_stream(
        spark.readStream.schema(SERIES_SCHEMA).option("maxFilesPerTrigger", 1).parquet(landing)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("adjust_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["ts"]: (r["start_ts"], r["delta"], r["is_reset"])
        for r in spark.sql("select * from adjust_out").collect()
    }
    batch = adjust_cumulative(
        spark.createDataFrame(f1 + f2, SERIES_SCHEMA), ["series"]
    )
    want = {
        r["ts"]: (r["start_ts"], r["delta"], r["is_reset"]) for r in batch.collect()
    }
    assert got == want
    # and the semantics themselves: epoch 2 starts at the reset minute
    t = lambda m: base + dt.timedelta(minutes=m)
    assert got[t(3)] == (t(3), None, True)
    assert got[t(4)] == (t(3), 12, False)
    assert got[t(2)] == (t(0), 15, False)  # carried across the file boundary


def test_adjust_state_timeout_drops_series():
    from opentelemetry_collector_spark.streaming.stream import _adjust_state_fn

    class FakeState:
        hasTimedOut = True
        exists = True
        get = (40, 0)

        def __init__(self):
            self.removed = False

        def remove(self):
            self.removed = True

        def update(self, *_):
            raise AssertionError("timed-out series must be removed")

        def setTimeoutDuration(self, *_):
            raise AssertionError("timed-out series must not re-arm")

    st = FakeState()
    assert list(_adjust_state_fn(60)(("s1",), iter([]), st) or []) == []
    assert st.removed


def test_bloom_accumulates_across_epochs_and_replay_is_idempotent(spark, tmp_path):
    """Streaming bloom ingest (accumulate_bloom_stream): after the stream
    drains epoch-by-epoch, the artifact equals a one-shot build over the
    whole input (merge==whole across epochs), every ingested key probes
    True, and refolding the same input (at-least-once replay) leaves the
    bitset bit-identical."""
    from opentelemetry_collector_spark.operators.sketches import bloom_build, bloom_probe
    from opentelemetry_collector_spark.streaming import (
        accumulate_bloom_stream,
        read_bloom_artifact,
    )

    landing, df = _landing(spark, tmp_path)
    artifact = str(tmp_path / "bloom")
    m, k = 1 << 14, 3

    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(landing)
    q = accumulate_bloom_stream(
        stream, artifact, "conv_id", str(tmp_path / "ckpt_bloom"), m_bits=m, k=k
    )
    q.awaitTermination(120)

    got = {(r["word"], r["bits"]) for r in read_bloom_artifact(spark, artifact).collect()}
    want = {
        (r["word"], r["bits"])
        for r in bloom_build(df.select("conv_id"), "conv_id", m_bits=m, k=k).collect()
    }
    assert got == want

    keys = df.select("conv_id").distinct()
    flagged = bloom_probe(keys, read_bloom_artifact(spark, artifact), "conv_id", m, k)
    assert all(r["maybe_seen"] for r in flagged.collect())

    # replay: fresh checkpoint, same input — bit_or idempotence
    q2 = accumulate_bloom_stream(
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(landing),
        artifact, "conv_id", str(tmp_path / "ckpt_bloom2"), m_bits=m, k=k,
    )
    q2.awaitTermination(120)
    again = {(r["word"], r["bits"]) for r in read_bloom_artifact(spark, artifact).collect()}
    assert again == want
    assert read_bloom_artifact(spark, str(tmp_path / "nope")) is None


def test_cell_sketch_epochs_merge_to_whole_and_replay_overwrites(spark, tmp_path):
    """Sum-merged sketch accumulation (accumulate_cells_stream): per-epoch
    CM partials merged at read equal the one-shot build over the whole
    input, and refolding the same input (at-least-once replay) does NOT
    double-count — a replayed epoch overwrites its own partition."""
    from opentelemetry_collector_spark.operators.sketches import cm_build, cm_merge
    from opentelemetry_collector_spark.streaming import accumulate_cells_stream

    landing, df = _landing(spark, tmp_path)
    artifact = str(tmp_path / "cm_cells")
    build = lambda b: cm_build(b, "conv_id", depth=4, width=64)  # noqa: E731

    def _fold(ckpt):
        stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(landing)
        q = accumulate_cells_stream(stream, artifact, str(tmp_path / ckpt), build)
        q.awaitTermination(120)

    _fold("ckpt_cm")
    merged = cm_merge(spark.read.parquet(artifact).drop("_epoch"))
    want = {(r["row"], r["col"], r["cnt"]) for r in build(df).collect()}
    assert {(r["row"], r["col"], r["cnt"]) for r in merged.collect()} == want
    n_epochs = spark.read.parquet(artifact).select("_epoch").distinct().count()
    assert n_epochs > 1  # maxFilesPerTrigger=1 over a 4-file landing

    _fold("ckpt_cm2")  # replay: fresh checkpoint, same epochs re-delivered
    again = cm_merge(spark.read.parquet(artifact).drop("_epoch"))
    assert {(r["row"], r["col"], r["cnt"]) for r in again.collect()} == want


def test_interval_join_stream_matches_batch_operator(spark, tmp_path):
    """Stream-stream binned interval join == the batch interval_join on the
    same in-order input; the plan is a watermarked symmetric hash join with
    both state stores bounded."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.rangejoin import interval_join
    from opentelemetry_collector_spark.streaming import interval_join_stream

    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    ev_rows = [(f"e{i}", ts(i * 37)) for i in range(200)]
    win_rows = [(f"w{j}", ts(j * 600), ts(j * 600 + 300)) for j in range(12)]
    win_rows.append(("w_inv", ts(100), ts(50)))  # inverted: matches nothing
    win_rows.append(("w_wide", ts(0), ts(100000)))  # beyond max_window: excluded
    ev = spark.createDataFrame(ev_rows, "event_id string, ts timestamp")
    wi = spark.createDataFrame(
        win_rows, "window_id string, w_start timestamp, w_end timestamp"
    )
    ev_path, wi_path = str(tmp_path / "ev"), str(tmp_path / "wi")
    ev.repartition(3).write.parquet(ev_path)
    wi.repartition(2).write.parquet(wi_path)

    ev_s = spark.readStream.schema(ev.schema).parquet(ev_path)
    wi_s = spark.readStream.schema(wi.schema).parquet(wi_path)
    joined = interval_join_stream(
        ev_s, wi_s, "ts", "w_start", "w_end", bin_seconds=300, max_window_seconds=600
    )
    out = str(tmp_path / "joined")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_ij"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["event_id"], r["window_id"])
        for r in spark.read.parquet(out).select("event_id", "window_id").collect()
    }
    # batch reference over the SAME domain (windows within max_window)
    bounded = wi.filter(
        (F.col("w_end").cast("long") - F.col("w_start").cast("long")) <= 600
    )
    want = {
        (r["event_id"], r["window_id"])
        for r in interval_join(ev, bounded, "ts", "w_start", "w_end", 300)
        .select("event_id", "window_id")
        .collect()
    }
    assert got == want and len(got) > 0
    assert not any(w == "w_inv" or w == "w_wide" for _, w in got)


def test_interval_join_stream_rejects_bad_shapes(spark, tmp_path):
    import pytest

    from opentelemetry_collector_spark.streaming import interval_join_stream

    (tmp_path / "empty_ev").mkdir()
    (tmp_path / "empty_wi").mkdir()
    ev = spark.readStream.schema("event_id string, ts timestamp").parquet(
        str(tmp_path / "empty_ev")
    )
    wi = spark.readStream.schema(
        "window_id string, w_start timestamp, w_end timestamp"
    ).parquet(str(tmp_path / "empty_wi"))
    with pytest.raises(ValueError, match="bins"):
        interval_join_stream(
            ev, wi, "ts", "w_start", "w_end", bin_seconds=1, max_window_seconds=1 << 17
        )
    wi_dup = wi.withColumnRenamed("window_id", "event_id")
    with pytest.raises(ValueError, match="ambiguous"):
        interval_join_stream(
            ev, wi_dup, "ts", "w_start", "w_end", bin_seconds=60, max_window_seconds=600
        )


class _TailFakeState:
    """Minimal GroupState stand-in for the tail-sampler handler."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self.removed = True
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _span_pdf(rows):
    import pandas as pd

    return pd.DataFrame(rows, columns=["trace_id", "ts", "duration_us", "status_code"])


def test_tail_stream_decision_matches_batch_operator(spark):
    """Accumulate-then-timeout through the streaming handler == the batch
    tail_sample_decisions over the same spans, for every policy branch."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.sample import tail_sample_decisions
    from opentelemetry_collector_spark.streaming.stream import _tail_state_fn

    base = dt.datetime(2024, 1, 1)
    traces = {
        "err": [(base, 1_000_000, 0), (base + dt.timedelta(seconds=5), 1_000_000, 2)],
        "slow": [(base, 1_000_000, 0), (base + dt.timedelta(seconds=9), 1_000_000, 0)],
        "quick": [(base, 100_000, 0)],
    }
    fn = _tail_state_fn(5_000, True, 500, 5)
    got = {}
    for tid, spans in traces.items():
        st = _TailFakeState()
        rows = [(tid, ts, dur, sc) for ts, dur, sc in spans]
        # spans arrive across TWO micro-batches
        list(fn((tid,), iter([_span_pdf(rows[:1]), _span_pdf(rows[1:])]), st) or [])
        assert st.exists and st.timeout_ms == 5 * 60 * 1000
        st.hasTimedOut = True
        out = list(fn((tid,), iter([]), st))
        assert st.removed and len(out) == 1
        r = out[0].iloc[0]
        got[tid] = (int(r["n_spans"]), int(r["trace_duration_us"]), r["reason"], int(r["keep"]))

    batch_rows = [
        (tid, f"s{i}", sc, ts, dur)
        for tid, spans in traces.items()
        for i, (ts, dur, sc) in enumerate(spans)
    ]
    bdf = spark.createDataFrame(
        batch_rows, "trace_id string, span_id string, status_code int, ts timestamp, duration_us long"
    )
    expect = {
        r["trace_id"]: (
            int(r["n_spans"]),
            int(r["trace_duration_us"]),
            r["reason"],
            int(r["keep"]),
        )
        for r in tail_sample_decisions(bdf, latency_ms=5_000, rate_pm=500).collect()
    }
    assert got == expect
    # sanity on the branches themselves
    assert got["err"][2] == "status_code" and got["slow"][2] == "latency"


def test_tail_stream_no_decision_before_quiescence(spark, tmp_path):
    """End-to-end availableNow run: spans arrive, no trace goes quiet, so
    the sampler emits NOTHING (decisions wait for the timeout) and state
    accumulation completes cleanly."""
    import datetime as dt

    from opentelemetry_collector_spark.streaming.stream import tail_sample_stream

    base = dt.datetime(2024, 1, 1)
    schema = "trace_id string, ts timestamp, duration_us long, status_code int"
    landing = str(tmp_path / "spans")
    spark.createDataFrame(
        [("t1", base, 1_000_000, 0), ("t2", base, 2_000_000, 2)], schema
    ).coalesce(1).write.mode("append").parquet(landing)

    stream = tail_sample_stream(
        spark.readStream.schema(schema).parquet(landing), latency_ms=1, rate_pm=1000
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("tail_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("select * from tail_out").count() == 0


def test_tail_stream_null_junk_isolates():
    """NULL ts/duration rows are refused per-row; a batch of only junk must
    not create state (no timer armed for a trace with zero valid spans)."""
    import datetime as dt

    from opentelemetry_collector_spark.streaming.stream import _tail_state_fn

    fn = _tail_state_fn(None, True, 0, 5)
    st = _TailFakeState()
    junk = _span_pdf([("t", None, 1, 0), ("t", dt.datetime(2024, 1, 1), None, 2)])
    list(fn(("t",), iter([junk]), st) or [])
    assert not st.exists and st.timeout_ms is None


def test_cusum_stream_matches_batch_operator(spark, tmp_path):
    """cusum_stream across micro-batches == timeseries.cusum_drift on the
    union: the accumulator carries through state across the file boundary
    (a drift ramp split across triggers must keep accumulating)."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.timeseries import cusum_drift
    from opentelemetry_collector_spark.streaming.stream import (
        SERIES_SCHEMA,
        cusum_stream,
    )

    base = dt.datetime(2025, 1, 1)

    def rows(spec):
        return [("s1", base + dt.timedelta(minutes=m), v) for m, v in spec]

    # ramp above target in file 1, keeps ramping in file 2, then drains
    f1 = rows([(0, 90), (1, 90)])
    f2 = rows([(2, 90), (3, 0), (4, 0), (5, 200)])
    landing = str(tmp_path / "landing")
    spark.createDataFrame(f1, SERIES_SCHEMA).coalesce(1).write.mode("append").parquet(landing)
    spark.createDataFrame(f2, SERIES_SCHEMA).coalesce(1).write.mode("append").parquet(landing)

    stream = cusum_stream(
        spark.readStream.schema(SERIES_SCHEMA).option("maxFilesPerTrigger", 1).parquet(landing),
        target=50, slack=0, threshold=100,
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("cusum_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    epoch = dt.datetime(1970, 1, 1)
    got = {
        int((r["ts"] - epoch).total_seconds() * 1_000_000): (r["cusum"], r["alarm"])
        for r in spark.sql("select * from cusum_out").collect()
    }
    batch_in = spark.createDataFrame(
        [(s, t, v / 100.0) for s, t, v in f1 + f2],
        "series string, ts timestamp, value double",
    )
    want = {
        # batch op converts value->cents via floor(v*100); inputs are exact
        r["ts_us"]: (r["cusum_cents"], r["cusum_cents"] > 100)
        for r in cusum_drift(batch_in, ["series"], target_cents=50,
                             threshold_cents=100).collect()
    }
    assert got == want
    t = lambda m: int((base + dt.timedelta(minutes=m) - epoch).total_seconds() * 1_000_000)
    # semantics: accumulates 40/min over the boundary, alarms at minute 2,
    # drains by 50/min, re-alarms on the spike
    assert got[t(1)] == (80, False)
    assert got[t(2)] == (120, True)      # state carried across the trigger
    assert got[t(4)] == (20, False)
    assert got[t(5)] == (170, True)


def test_cusum_state_timeout_drops_accumulator():
    from opentelemetry_collector_spark.streaming.stream import _cusum_state_fn

    class S:
        hasTimedOut = True
        removed = False
        def remove(self):
            self.removed = True

    st = S()
    assert list(_cusum_state_fn(0, 1, 1)("s", iter([]), st)) == []
    assert st.removed


def test_hysteresis_stream_matches_batch_operator(spark, tmp_path):
    """hysteresis_stream across micro-batches == threshold_hysteresis on
    the union: the ON state carries across the file boundary, so the dead
    band in file 2 holds instead of re-edging."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.timeseries import threshold_hysteresis
    from opentelemetry_collector_spark.streaming.stream import (
        SERIES_SCHEMA,
        hysteresis_stream,
    )

    base = dt.datetime(2025, 1, 1)

    def rows(spec):
        return [("s1", base + dt.timedelta(minutes=m), v) for m, v in spec]

    f1 = rows([(0, 70), (1, 120)])                   # band, then ON
    f2 = rows([(2, 70), (3, 40), (4, 70), (5, 130)])  # hold, OFF, hold, ON
    landing = str(tmp_path / "landing")
    spark.createDataFrame(f1, SERIES_SCHEMA).coalesce(1).write.mode("append").parquet(landing)
    spark.createDataFrame(f2, SERIES_SCHEMA).coalesce(1).write.mode("append").parquet(landing)

    stream = hysteresis_stream(
        spark.readStream.schema(SERIES_SCHEMA).option("maxFilesPerTrigger", 1).parquet(landing),
        hi=100, lo=50,
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("hyst_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    epoch = dt.datetime(1970, 1, 1)
    got = {
        int((r["ts"] - epoch).total_seconds() * 1_000_000): (r["alert"], r["is_edge"])
        for r in spark.sql("select * from hyst_out").collect()
    }
    batch_in = spark.createDataFrame(
        [(s, t, v / 100.0) for s, t, v in f1 + f2],
        "series string, ts timestamp, value double",
    )
    want = {
        r["ts_us"]: (r["alert"], r["is_edge"])
        for r in threshold_hysteresis(batch_in, ["series"], hi_cents=100,
                                      lo_cents=50).collect()
    }
    assert got == want
    t = lambda m: int((base + dt.timedelta(minutes=m) - epoch).total_seconds() * 1_000_000)
    assert got[t(1)] == (True, True)
    assert got[t(2)] == (True, False)    # dead band HOLDS across the trigger
    assert got[t(3)] == (False, True)
    assert got[t(5)] == (True, True)


def test_hysteresis_state_timeout_drops():
    from opentelemetry_collector_spark.streaming.stream import _hyst_state_fn

    class S:
        hasTimedOut = True
        removed = False
        def remove(self):
            self.removed = True

    st = S()
    assert list(_hyst_state_fn(2, 1, 1)("s", iter([]), st)) == []
    assert st.removed


def test_staleness_stream_passthrough_and_state(spark, tmp_path):
    """Live samples pass through with stale=false across micro-batches;
    series state records the max-seen timestamp (the marker's anchor)."""
    import datetime as dt

    from opentelemetry_collector_spark.streaming.stream import staleness_stream

    base = dt.datetime(2025, 6, 1)
    schema = "series string, ts timestamp, value double"
    landing = str(tmp_path / "landing")
    rows1 = [("A", base, 1.0), ("B", base, 2.0)]
    rows2 = [("A", base + dt.timedelta(minutes=1), 3.0)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(landing)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(landing)

    stream = staleness_stream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(landing),
        scrape_interval_minutes=60,
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("stale_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.series, r.value, r.stale) for r in spark.sql("select * from stale_out").collect()
    )
    # nothing timed out inside the run: all three samples live, no markers
    assert got == [("A", 1.0, False), ("A", 3.0, False), ("B", 2.0, False)]


def test_staleness_timeout_emits_one_marker_and_drops_state():
    """The expiry branch is the staleness store's emitStaleLabels: exactly
    one marker row (value NULL, stale=true, stamped one interval after the
    last sample) and the series state is REMOVED — a dead series costs
    nothing and is never re-marked."""
    import pandas as pd

    from opentelemetry_collector_spark.streaming.stream import _staleness_state_fn

    last_us = 1_750_000_000_000_000

    class FakeState:
        hasTimedOut = True
        exists = True
        get = (last_us,)

        def __init__(self):
            self.removed = False

        def remove(self):
            self.removed = True

        def update(self, *_):
            raise AssertionError("timed-out series must be removed, not updated")

        def setTimeoutDuration(self, *_):
            raise AssertionError("timed-out series must not re-arm its timer")

    st = FakeState()
    out = list(_staleness_state_fn(2)(("m\x02k\x01v",), iter([]), st))
    assert st.removed and len(out) == 1
    marker = out[0]
    assert marker["stale"].tolist() == [True]
    assert marker["value"].isna().all()
    want_ts = pd.to_datetime([last_us + 2 * 60 * 1_000_000], unit="us")
    assert (marker["ts"] == want_ts).all()


def test_staleness_stream_rejects_bad_interval(spark):
    from opentelemetry_collector_spark.streaming.stream import staleness_stream

    df = spark.readStream.format("rate").load().selectExpr(
        "cast(value as string) series", "timestamp ts", "cast(value as double) value"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="scrape_interval_minutes"):
        staleness_stream(df, scrape_interval_minutes=0)


def test_relabel_chain_works_on_streaming_frames(spark, tmp_path):
    """apply_relabel_configs is a pure projection, so the SAME operator
    runs unchanged inside a streaming plan — the scrape-shaped pipeline
    needs no batch/stream fork for its label machinery."""
    from opentelemetry_collector_spark.sources.prometheus import (
        RelabelConfig,
        apply_relabel_configs,
    )

    landing = str(tmp_path / "landing")
    schema = "metric string, labels map<string,string>, value double"
    spark.createDataFrame(
        [("m", {"role": "user"}, 1.0), ("m", {"role": "tool"}, 2.0)], schema
    ).coalesce(1).write.parquet(landing)
    stream = apply_relabel_configs(
        spark.readStream.schema(schema).parquet(landing),
        [
            RelabelConfig(action="keep", source_labels=["role"], regex="user"),
            RelabelConfig(action="hashmod", source_labels=["role"], target_label="s", modulus=4),
        ],
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("relabel_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from relabel_stream_out").collect()
    assert len(rows) == 1 and dict(rows[0].labels)["role"] == "user"
    assert dict(rows[0].labels)["s"] in {"0", "1", "2", "3"}
