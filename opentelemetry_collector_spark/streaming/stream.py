"""Structured Streaming pipeline: the push-data-path analog.

The reference is a push engine: receivers accept batches on live connections
and forward them synchronously through the processor chain to exporters
(``receiver/otlpreceiver/internal/logs/otlp.go:60-69`` ->
``processor/processorhelper/logs.go:62-75`` ->
``fanoutconsumer/consumer.go:104-112``). Its "streaming" has no event-time
semantics — everything is in-order per connection, no watermarks, no late
data (SURVEY §2.7). The Spark-native equivalent is Structured Streaming:

- **receiver** = ``readStream`` on a directory (each arriving file is a
  pushed batch; in production this is the Kafka/OTLP landing zone);
- **processor chain** = the SAME pure DataFrame transforms as the batch
  planner — parse/attributes/filter/sampler compose unchanged on a
  streaming DataFrame (they are stateless projections/filters);
- **exporter fan-out** = ``foreachBatch`` writing each sink's predicate
  slice idempotently per micro-batch (epoch id = the batch-sequence number,
  the queued_retry redelivery analog: a replayed epoch overwrites itself);
- **batch processor** = micro-batch trigger (`processingTime`/`availableNow`)
  — size/timeout rebatching is the trigger policy;
- **aggregates** = watermarked window / session-window groupBy, the
  streaming generalization of the prometheus-accumulator groupBy
  (``exporter/prometheusexporter/accumulator.go:65-132``) with the
  late-data story the Go collector never had.

Everything here is bounded-state: watermarks cap the window state store,
and the fan-out write is append-only per epoch — the design a 1000-executor
continuous ingest of 10^12 turns needs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from opentelemetry_collector_spark.schema import TRANSCRIPTS_SCHEMA
from opentelemetry_collector_spark.plans.route import Route

Transform = Callable[[DataFrame], DataFrame]


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source receiver: each new parquet file under `path` is a pushed
    batch (the OTLP-receiver analog; swap for format("kafka") in production —
    the downstream plan is identical)."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_turn_counts(
    df: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(window, role) turn counts with a watermark bounding state.

    The streaming form of the obsreport/accumulator counters: counts are
    emitted per event-time window once the watermark passes, late rows
    beyond `watermark` are dropped (documented, deterministic behavior the
    reference leaves implicit in connection ordering)."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("role"))
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
    )


def session_turn_counts(
    df: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Conversation sessionization via built-in session windows: a session
    closes after `gap` of event-time silence per conv_id. This is the
    stateful custom operator slot (SURVEY §2.7) expressed with the built-in
    session_window instead of applyInPandasWithState — bounded state, no
    Python in the hot path."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("session"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def run_stream_pipeline(
    spark: SparkSession,
    input_path: str,
    base_path: str,
    processors: list[Transform],
    routes: list[Route],
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """readStream -> processor chain -> per-epoch idempotent fan-out writes.

    Each micro-batch is routed with the SAME Route predicates as the batch
    planner and appended to `<base>/<sink>` partitioned by epoch; a replayed
    epoch (failure/restart redelivery — the queued_retry.go:241-332 analog)
    overwrites its own partition, so sinks stay exactly-once downstream of
    Spark's at-least-once epoch replay."""
    df = read_transcript_stream(spark, input_path, max_files_per_trigger)
    for p in processors:
        df = p(df)

    def _write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            for r in routes:
                (
                    batch_df.filter(r.predicate)
                    .withColumn("_epoch", F.lit(epoch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("_epoch")
                    .parquet(f"{base_path}/{r.name}")
                )
        finally:
            batch_df.unpersist()

    writer = df.writeStream.foreachBatch(_write_epoch).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def accumulate_bloom_stream(
    df: DataFrame,
    artifact_path: str,
    key_col: str,
    checkpoint_dir: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    hasher: str = "md5",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming ingest side of the bloom-prefiltered incremental dedup
    (q100 / BENCH/PROB_SKETCH.md): each micro-batch's keys are folded into
    the at-rest bloom artifact so later batch probes
    (``sketches.bloom_probe_big``) see every key ever ingested.

    Per epoch: build the batch's (word, bits) frame, bit_or-merge with the
    latest artifact version, and write the merged bitset as a NEW
    ``_v=<epoch>`` partition (dynamic overwrite). Versioning makes every
    failure window non-destructive: a crash mid-write never touches the
    previous version (an in-place ``mode("overwrite")`` deletes the old
    artifact before the new one commits), and a replayed epoch (Spark's
    at-least-once foreachBatch redelivery) overwrites its own version with
    a bit_or-idempotent result. Readers take the max version via
    :func:`read_bloom_artifact`; old versions are sketch-sized and prunable
    with ``plans/maintenance.expire_partitions``. Only a genuinely missing
    artifact is treated as the first epoch — any other read error
    propagates (swallowing it would silently restart the seen-set and break
    the no-false-negatives dedup contract downstream).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    from opentelemetry_collector_spark.operators.sketches import bloom_build, bloom_merge

    schema = StructType(
        [StructField("word", LongType()), StructField("bits", LongType())]
    )

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        new = bloom_build(batch_df, key_col, m_bits=m_bits, k=k, hasher=hasher)
        prior = read_bloom_artifact(spark, artifact_path)
        merged = bloom_merge(prior, new) if prior is not None else new
        rows = [(r["word"], r["bits"]) for r in merged.collect()]
        (
            spark.createDataFrame(rows, schema)
            .withColumn("_v", F.lit(epoch_id).cast("bigint"))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_v")
            .parquet(artifact_path)
        )

    writer = df.writeStream.foreachBatch(_fold).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_bloom_artifact(spark: SparkSession, artifact_path: str) -> DataFrame | None:
    """Latest version of a versioned bloom artifact as a plain (word, bits)
    frame — feed it to ``sketches.bloom_probe``/``bloom_probe_big``.
    Returns None only when the artifact does not exist yet; any other read
    failure raises."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(artifact_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e):
            return None
        raise
    vmax = df.agg(F.max("_v")).first()[0]
    return df.filter(F.col("_v") == vmax).select("word", "bits")


def accumulate_cells_stream(
    df: DataFrame,
    artifact_path: str,
    checkpoint_dir: str,
    build_fn,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming accumulation for SUM-merged sketches (Count-Min cells,
    histogram-quantile cells — anything :func:`sketches.cm_merge` /
    ``hq_merge`` shaped). The algebra contrast with
    :func:`accumulate_bloom_stream` decides the storage layout: bit_or is
    idempotent so the bloom can fold in place, but re-summing a replayed
    epoch DOUBLE-COUNTS — so each epoch's partial cells are written to its
    own partition with dynamic overwrite (the run_stream_pipeline
    exactly-once pattern: a redelivered epoch overwrites itself, never
    adds). Readers merge at query time with the sketch's own groupBy-sum —
    over partials whose total size is epochs x sketch cells, never the
    input.

    Scope of the replay guarantee: it covers Spark's OWN redelivery — the
    same checkpoint re-running an epoch with the identical batch (that is
    what foreachBatch can replay). Re-ingesting the same input under a NEW
    checkpoint is only safe if the trigger reproduces the same epoch
    batching; a coarser trigger would renumber epochs and leave stale
    higher-numbered partitions double-counting. For a from-scratch rebuild,
    point ``artifact_path`` at a fresh directory (the bloom's bit_or
    accumulation in :func:`accumulate_bloom_stream` is the variant that
    tolerates arbitrary re-ingestion).

    ``build_fn(batch_df) -> DataFrame`` produces the batch's cell frame
    (e.g. ``lambda b: cm_build(b, "conv_id", depth=4, width=256)``).
    """

    def _write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            build_fn(batch_df)
            .withColumn("_epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(artifact_path)
        )

    writer = df.writeStream.foreachBatch(_write_epoch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_redelivered(
    df: DataFrame,
    timeout_minutes: int = 60,
) -> DataFrame:
    """Stateful exactly-once filter over an at-least-once stream.

    The reference's delivery chain may redeliver whole batches (queue retry,
    ``exporter/exporterhelper/queued_retry.go:241-332``); sinks there are
    expected to tolerate duplicates. This operator upgrades the contract to
    exactly-once per (conv_id, turn_idx): a custom stateful operator via
    ``applyInPandasWithState`` (the SURVEY §2.7 slot) keeping the set of
    seen turn_idx per conversation, emitting only first deliveries. State is
    bounded per conversation and dropped after `timeout_minutes` of
    processing-time inactivity (closed conversations cost nothing).

    Arrow-batched per group — no per-row Python.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return df.groupBy("conv_id").applyInPandasWithState(
        _dedup_state_fn(timeout_minutes),
        outputStructType=TRANSCRIPTS_SCHEMA,
        stateStructType="seen array<int>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _dedup_state_fn(timeout_minutes: int):
    """The per-group state handler behind :func:`dedup_redelivered`,
    module-level so the timeout branch is unit-testable without a running
    stream (a GroupState expiry cannot be forced synchronously)."""
    out_cols = TRANSCRIPTS_SCHEMA.fieldNames()  # one source of truth

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            # expiry invocation (no data): DROP the conversation's state —
            # updating + re-arming here would resurrect every closed
            # conversation forever and grow the store monotonically
            state.remove()
            return
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf["turn_idx"].isin(seen)]
            # dedupe within the batch too (a batch may repeat a turn)
            fresh = fresh.drop_duplicates(subset=["turn_idx"])
            seen.update(int(t) for t in fresh["turn_idx"])
            if len(fresh):
                yield fresh[out_cols]
        state.update((sorted(seen),))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    return fn


# ---------------------------------------------------------------------------
# streaming MetricsAdjuster (stateful cumulative-counter adjustment)
# ---------------------------------------------------------------------------

SERIES_SCHEMA = "series string, ts timestamp, value bigint"
ADJUSTED_SCHEMA = (
    "series string, ts timestamp, value bigint,"
    " start_ts timestamp, delta bigint, is_reset boolean"
)


def adjust_cumulative_stream(df: DataFrame, timeout_minutes: int = 60) -> DataFrame:
    """The Prometheus receiver's MetricsAdjuster as the stateful streaming
    operator it actually is in the reference: per-series state (last value,
    current epoch start) maintained across scrapes, reset detected when
    ``current < previous`` (``receiver/prometheusreceiver/internal/
    metrics_adjuster.go:254-305``), non-reset points stamped with the
    epoch's start time, plus the cumulative->delta conversion q87 runs in
    batch (``operators/aggregate.adjust_cumulative`` — same output columns,
    so batch backfill and streaming ingest agree row-for-row).

    State GC mirrors the adjuster's mark-and-sweep (``metrics_adjuster.go``
    job/timeseries gc notes, :27-58): a series idle for `timeout_minutes`
    of processing time DROPS its state — the store is bounded by live
    series, not series ever seen. Within a micro-batch rows are processed
    in ts order; across batches state carries arrival order, exactly like
    the Go adjuster's per-scrape sequence.

    Arrow-batched per series with a vectorized numpy recurrence — no
    per-row Python.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return df.groupBy("series").applyInPandasWithState(
        _adjust_state_fn(timeout_minutes),
        outputStructType=ADJUSTED_SCHEMA,
        stateStructType="last_value bigint, epoch_start_us bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _adjust_state_fn(timeout_minutes: int):
    """Per-series handler behind :func:`adjust_cumulative_stream`,
    module-level so the timeout branch is unit-testable."""
    import numpy as np
    import pandas as pd

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()  # the timeseriesMap gc sweep: idle series cost nothing
            return
        last, epoch_us = state.get if state.exists else (None, None)
        # concat ALL Arrow chunks before sorting: chunks arrive split at
        # arrow.maxRecordsPerBatch in arrival order, so sorting each chunk
        # independently would compare a later chunk's earliest sample
        # against the previous chunk's LAST value — spurious resets for any
        # series over ~10k rows per trigger. Memory = one series' rows in
        # one micro-batch (the Go adjuster likewise holds a whole scrape).
        chunks = list(pdfs)
        whole = pd.concat(chunks) if chunks else None
        if whole is not None:
            pdf = whole[whole["value"].notna() & whole["ts"].notna()]
        if whole is not None and len(pdf):
            pdf = pdf.sort_values("ts", kind="stable").reset_index(drop=True)
            vals = pdf["value"].to_numpy(dtype="int64")
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            n = len(pdf)
            prev = np.empty(n, dtype="int64")
            prev[1:] = vals[:-1]
            had_prev = last is not None
            prev[0] = last if had_prev else 0
            es = vals < prev
            es[0] = es[0] or not had_prev  # series birth starts an epoch
            # forward-fill each row's epoch start from the latest reset row,
            # carrying the cross-batch epoch in for the prefix before one
            idx = np.where(es, np.arange(n), -1)
            idx = np.maximum.accumulate(idx)
            start_us = np.where(idx >= 0, ts_us[np.maximum(idx, 0)], epoch_us if epoch_us is not None else 0)
            delta = vals - prev
            is_reset = es.copy()
            is_reset[0] = es[0] and had_prev  # birth is not a counter reset
            out = pd.DataFrame(
                {
                    "series": pdf["series"],
                    "ts": pdf["ts"],
                    "value": pdf["value"],
                    "start_ts": pd.to_datetime(start_us, unit="us"),
                    "delta": pd.array(np.where(es, 0, delta), dtype="Int64"),
                    "is_reset": is_reset,
                }
            )
            out.loc[es, "delta"] = pd.NA  # initial/reset points have no baseline
            yield out
            last = int(vals[-1])
            epoch_us = int(start_us[-1])
        if last is not None:
            state.update((last, epoch_us))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    return fn


def interval_join_stream(
    events: DataFrame,
    windows: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    max_window_seconds: int,
    *,
    event_delay: str = "10 minutes",
    window_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream form of ``operators/rangejoin.interval_join``: live
    events joined to live windows (incidents opening as they are detected),
    with watermarks bounding BOTH state stores — the event-time/late-data
    machinery the reference never had (SURVEY §2.7).

    Same binned formulation as the batch operator: windows explode into
    ``bin_seconds`` buckets, events carry exactly one bucket, so the
    symmetric hash join has a real equality key instead of a pure range
    predicate. The extra streaming contract is ``max_window_seconds`` —
    the operator's stated domain, not a silent guard: a window's span must
    fit it, because state cleanup needs a bound relating the two
    watermarked columns (``event.ts <= window.start + max_window``). Wider
    windows are excluded by definition, exactly as late rows beyond the
    watermark are. Late events older than ``event_delay`` and windows
    opening more than ``window_delay`` behind the event watermark drop per
    Spark's join-watermark semantics.

    Row parity with the batch operator on in-order input is pinned in
    tests; use the batch form for backfill (they compose: same bin math,
    same range predicate).
    """
    from opentelemetry_collector_spark.operators.rangejoin import (
        _MAX_BINS_PER_WINDOW,
        _bin_of,
    )

    if max_window_seconds // bin_seconds >= _MAX_BINS_PER_WINDOW:
        raise ValueError(
            f"max_window_seconds={max_window_seconds} explodes into more than "
            f"{_MAX_BINS_PER_WINDOW} bins of {bin_seconds}s — pick a larger bin"
        )
    dup = set(events.columns) & set(windows.columns)
    if dup:
        raise ValueError(f"ambiguous columns (alias before joining): {sorted(dup)}")

    sb = _bin_of(F.col(start_col), bin_seconds)
    eb = _bin_of(F.col(end_col), bin_seconds)
    span_ok = (
        F.col(end_col).cast("long") - F.col(start_col).cast("long")
    ) <= max_window_seconds
    e = (
        events.withWatermark(ts_col, event_delay)
        .withColumn("__e_bin", _bin_of(F.col(ts_col), bin_seconds))
        .alias("e")
    )
    w = (
        windows.withWatermark(start_col, window_delay)
        .filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
        .filter((eb - sb >= 0) & span_ok)
        .withColumn("__w_bin", F.explode(F.sequence(sb, eb)))
        .alias("w")
    )
    cond = (
        (F.col("e.__e_bin") == F.col("w.__w_bin"))
        & (F.col(f"e.{ts_col}") >= F.col(f"w.{start_col}"))
        & (F.col(f"e.{ts_col}") <= F.col(f"w.{end_col}"))
        # state bound: relates the two watermarked columns so Spark can
        # evict both stores (end_col carries no watermark of its own)
        & (
            F.col(f"e.{ts_col}")
            <= F.col(f"w.{start_col}") + F.expr(f"INTERVAL {max_window_seconds} SECONDS")
        )
    )
    out_cols = [F.col(f"e.{c}") for c in events.columns] + [
        F.col(f"w.{c}") for c in windows.columns
    ]
    return e.join(w, cond, "inner").select(*out_cols)


# ---------------------------------------------------------------------------
# streaming tail-based trace sampler (decision on trace quiescence)
# ---------------------------------------------------------------------------

TAIL_DECISION_SCHEMA = (
    "trace_id string, n_spans bigint, trace_duration_us bigint,"
    " reason string, keep int"
)


def tail_sample_stream(
    df: DataFrame,
    latency_ms: int | None = None,
    keep_error_traces: bool = True,
    rate_pm: int = 0,
    decision_wait_minutes: int = 5,
) -> DataFrame:
    """Tail-based trace sampling as the stateful streaming operator the
    collector-contrib tailsamplingprocessor actually is: spans accumulate
    per trace_id in a bounded state cell (error flag, min start, max end,
    span count — NOT the spans themselves), and the decision is emitted
    once, when the trace has been QUIET for ``decision_wait_minutes`` of
    processing time (the contrib ``decision_wait`` analog; the expiry
    invocation emits the decision row and drops the state, so the store is
    bounded by in-flight traces).

    Policy order and arithmetic are byte-identical to the batch operator
    (:func:`operators.sample.tail_sample_decisions`): status_code ->
    latency -> probabilistic (md5-prefix integer cross-multiply — Python
    hashlib.md5 of the utf-8 id equals Spark's ``md5``), so a streamed
    decision equals the batch decision over the same spans (pinned in
    tests). Arrow-batched per group — no per-row Python.

    Input span stream contract: trace_id, ts (timestamp), duration_us,
    status_code.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if rate_pm < 0 or rate_pm > 1000:
        raise ValueError(f"rate_pm must be in [0, 1000], got {rate_pm}")
    return df.groupBy("trace_id").applyInPandasWithState(
        _tail_state_fn(latency_ms, keep_error_traces, rate_pm, decision_wait_minutes),
        outputStructType=TAIL_DECISION_SCHEMA,
        stateStructType="err int, min_start bigint, max_end bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _tail_state_fn(
    latency_ms: int | None,
    keep_error_traces: bool,
    rate_pm: int,
    decision_wait_minutes: int,
):
    """Per-group handler behind :func:`tail_sample_stream`, module-level so
    the timeout decision is unit-testable against the batch operator."""
    import hashlib

    import pandas as pd

    def decide(key, err, min_start, max_end, n):
        trace_us = max_end - min_start
        reason = None
        if keep_error_traces and err:
            reason = "status_code"
        elif latency_ms is not None and trace_us >= int(latency_ms) * 1000:
            reason = "latency"
        else:
            prefix = int(hashlib.md5(key.encode("utf-8")).hexdigest()[:13], 16)
            if prefix * 1000 < rate_pm * 16**13:
                reason = "probabilistic"
        return pd.DataFrame(
            {
                "trace_id": [key],
                "n_spans": [n],
                "trace_duration_us": [trace_us],
                "reason": [reason],
                "keep": [0 if reason is None else 1],
            }
        )

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            # trace went quiet: decide once, drop the state
            err, min_start, max_end, n = state.get
            state.remove()
            yield decide(key[0], err, min_start, max_end, n)
            return
        err, min_start, max_end, n = (
            state.get if state.exists else (0, None, None, 0)
        )
        for pdf in pdfs:
            pdf = pdf[pdf["ts"].notna() & pdf["duration_us"].notna()]
            if not len(pdf):
                continue
            start = pdf["ts"].astype("datetime64[us]").astype("int64")
            end = start + pdf["duration_us"].astype("int64")
            b_min, b_max = int(start.min()), int(end.max())
            min_start = b_min if min_start is None else min(min_start, b_min)
            max_end = b_max if max_end is None else max(max_end, b_max)
            err = int(err or (pdf["status_code"] == 2).any())
            n += int(len(pdf))
        if n:
            state.update((err, min_start, max_end, n))
            state.setTimeoutDuration(decision_wait_minutes * 60 * 1000)
        return
        yield  # pragma: no cover - generator form required by the API

    return fn


CUSUM_SCHEMA = (
    "series string, ts timestamp, value bigint, cusum bigint, alarm boolean"
)


def cusum_stream(
    df: DataFrame,
    target: int = 0,
    slack: int = 0,
    threshold: int = 1,
    timeout_minutes: int = 60,
) -> DataFrame:
    """Streaming form of ``operators/timeseries.cusum_drift``: the
    one-sided CUSUM recurrence C = max(0, C + x - target - slack) with the
    accumulator carried PER SERIES across micro-batches, so continuous
    ingest raises the same drift alarms batch backfill computes (identical
    output columns — parity pinned in pytest).

    Within a batch the clamp chain is evaluated by the same windowed
    closed form the batch operator uses, generalized to a carried seed:
    with P = C_prev + cumsum(y), C = P - min(0, running-min P) — two numpy
    accumulates per series per trigger, no per-row Python. State is ONE
    bigint per live series; a series idle for ``timeout_minutes`` drops
    its accumulator (same mark-and-sweep bound as the MetricsAdjuster
    store: live series, not series ever seen).

    Input follows :data:`SERIES_SCHEMA` with ``value`` already in integer
    units (cents); NULL ts/value rows are refused per-row.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    return df.groupBy("series").applyInPandasWithState(
        _cusum_state_fn(int(target) + int(slack), int(threshold), timeout_minutes),
        outputStructType=CUSUM_SCHEMA,
        stateStructType="acc bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _cusum_state_fn(drift: int, threshold: int, timeout_minutes: int):
    """Per-series handler behind :func:`cusum_stream`, module-level so the
    timeout branch is unit-testable."""
    import numpy as np
    import pandas as pd

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        (acc,) = state.get if state.exists else (0,)
        chunks = list(pdfs)
        whole = pd.concat(chunks) if chunks else None
        if whole is not None:
            pdf = whole[whole["value"].notna() & whole["ts"].notna()]
            if len(pdf):
                # same total order as the batch operator: (ts, value);
                # stable sort keeps arrival order for exact ties
                pdf = pdf.sort_values(["ts", "value"], kind="stable").reset_index(drop=True)
                y = pdf["value"].to_numpy(dtype="int64") - drift
                p = acc + np.cumsum(y)
                c = p - np.minimum(np.minimum.accumulate(p), 0)
                yield pd.DataFrame(
                    {
                        "series": pdf["series"],
                        "ts": pdf["ts"],
                        "value": pdf["value"],
                        "cusum": c,
                        "alarm": c > threshold,
                    }
                )
                acc = int(c[-1])
                state.update((acc,))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    return fn


HYST_SCHEMA = (
    "series string, ts timestamp, value bigint, alert boolean, is_edge boolean"
)


def hysteresis_stream(
    df: DataFrame,
    hi: int = 0,
    lo: int = 0,
    timeout_minutes: int = 60,
) -> DataFrame:
    """Streaming form of ``operators/timeseries.threshold_hysteresis``: the
    Schmitt-trigger alert state carried PER SERIES across micro-batches,
    so continuous ingest raises/clears the same alerts batch backfill
    computes. Within a batch the carry-last-crossing recurrence is one
    numpy forward-fill; state is ONE boolean per live series with the
    usual idle sweep. Edges are exact across trigger boundaries because
    the previous batch's final state seeds the comparison.

    Input follows :data:`SERIES_SCHEMA` (value in integer cents); NULL
    ts/value rows are refused per-row.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if hi <= lo:
        raise ValueError(f"need hi > lo, got {hi} <= {lo}")
    return df.groupBy("series").applyInPandasWithState(
        _hyst_state_fn(int(hi), int(lo), timeout_minutes),
        outputStructType=HYST_SCHEMA,
        stateStructType="alert boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _hyst_state_fn(hi: int, lo: int, timeout_minutes: int):
    """Per-series handler behind :func:`hysteresis_stream`."""
    import numpy as np
    import pandas as pd

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        (prev,) = state.get if state.exists else (False,)
        chunks = list(pdfs)
        whole = pd.concat(chunks) if chunks else None
        if whole is not None:
            pdf = whole[whole["value"].notna() & whole["ts"].notna()]
            if len(pdf):
                pdf = pdf.sort_values(["ts", "value"], kind="stable").reset_index(drop=True)
                v = pdf["value"].to_numpy(dtype="int64")
                # crossing signal: +1 above hi, -1 below lo, 0 in the band;
                # forward-fill the last non-zero crossing, seeded by state
                sig = np.where(v > hi, 1, np.where(v < lo, -1, 0))
                idx = np.where(sig != 0, np.arange(len(v)), -1)
                idx = np.maximum.accumulate(idx)
                alert = np.where(idx >= 0, sig[np.maximum(idx, 0)] > 0, prev)
                shifted = np.empty_like(alert)
                shifted[0] = prev
                shifted[1:] = alert[:-1]
                yield pd.DataFrame(
                    {
                        "series": pdf["series"],
                        "ts": pdf["ts"],
                        "value": pdf["value"],
                        "alert": alert,
                        "is_edge": alert != shifted,
                    }
                )
                prev = bool(alert[-1])
                state.update((prev,))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    return fn


STALENESS_SCHEMA = (
    "series string, ts timestamp, value double, stale boolean"
)


def staleness_stream(df: DataFrame, scrape_interval_minutes: int = 2) -> DataFrame:
    """Staleness markers as the CONTINUOUS operator the reference's
    staleness store actually is (``receiver/prometheusreceiver/internal/
    staleness_store.go:21-90``): the store diffs consecutive scrape
    generations and emits a marker for a series that vanished; in a
    stream, "vanished" IS a processing-time timeout — a series whose
    state expires after ``scrape_interval_minutes`` without a new sample
    gets exactly one marker row (value NULL, stale=true, stamped one
    interval after its last sample) and its state is dropped, so the
    store is bounded by LIVE series, precisely the two-generation
    property of the batch twin (``sources/prometheus.staleness_markers``,
    whose window + anti-join this operator replaces when the scrapes are
    an unbounded stream instead of an at-rest frame).

    Live samples pass through with stale=false (the scrape path is
    untouched — markers are additional rows, as on the Prometheus wire).

    Input stream contract: series (the canonical
    ``sources/prometheus.series_key`` string), ts (timestamp), value.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if scrape_interval_minutes <= 0:
        raise ValueError(f"scrape_interval_minutes must be positive: {scrape_interval_minutes}")
    return df.groupBy("series").applyInPandasWithState(
        _staleness_state_fn(scrape_interval_minutes),
        outputStructType=STALENESS_SCHEMA,
        stateStructType="last_ts_us bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _staleness_state_fn(scrape_interval_minutes: int):
    """Per-series handler behind :func:`staleness_stream`, module-level so
    the timeout (marker-emitting) branch is unit-testable."""
    import pandas as pd

    interval_us = scrape_interval_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            (last_us,) = state.get
            state.remove()  # marker emitted ONCE; dead series cost nothing
            yield pd.DataFrame(
                {
                    "series": [key[0]],
                    "ts": pd.to_datetime([last_us + interval_us], unit="us"),
                    "value": pd.array([None], dtype="Float64"),
                    "stale": [True],
                }
            )
            return
        last_us = state.get[0] if state.exists else None
        for pdf in pdfs:
            live = pdf[pdf["ts"].notna()]
            if not len(live):
                continue
            ts_us = live["ts"].astype("datetime64[us]").astype("int64")
            batch_max = int(ts_us.max())
            last_us = batch_max if last_us is None else max(last_us, batch_max)
            yield pd.DataFrame(
                {
                    "series": live["series"],
                    "ts": live["ts"],
                    "value": live["value"].astype("float64"),
                    "stale": [False] * len(live),
                }
            )
        if last_us is not None:
            state.update((last_us,))
            state.setTimeoutDuration(scrape_interval_minutes * 60 * 1000)

    return fn


# ---------------------------------------------------------------------------
# streaming turn pairing (stateful prompt→response fencing)
# ---------------------------------------------------------------------------

PAIRS_SCHEMA = (
    "conv_id string, prompt_idx int, prompt_text string, prompt_tokens bigint,"
    " answered boolean, resp_idx int, resp_text string, resp_tokens bigint,"
    " resp_tool string, latency_us bigint"
)


def pair_turns_stream(
    df: DataFrame,
    from_role: str = "user",
    to_role: str = "assistant",
    timeout_minutes: int = 60,
) -> DataFrame:
    """Streaming twin of ``operators/dialogue.pair_turns``: stateful
    prompt→response pairing over a live transcript stream via
    ``applyInPandasWithState`` keyed on ``conv_id``.

    Per-conversation state is ONE pending prompt (the newest ``from_role``
    turn not yet answered or fenced) plus the processing frontier — O(1)
    per conversation, unlike buffering turns. Decisions are emitted as
    soon as they are causally final: a ``to_role`` turn answers the
    pending prompt immediately; a new ``from_role`` turn fences the
    pending one (emitted unanswered) and becomes pending itself; on
    ``timeout_minutes`` of inactivity the pending prompt is emitted
    unanswered and the conversation's state dropped (the conversation-
    closed decision — same expiry discipline as :func:`dedup_redelivered`).

    Exactness contract: on in-order delivery the emitted pairs equal the
    batch operator's output row-for-row (pytest-pinned). Turns arriving
    behind the frontier are refused per-row (the staleness-marker analog);
    append mode cannot retract an already-emitted pair.

    Arrow-batched per group: the batch's pairing decisions are vectorized
    (searchsorted over the from/to turn indices), no per-row Python.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return df.groupBy("conv_id").applyInPandasWithState(
        _pair_state_fn(from_role, to_role, timeout_minutes),
        outputStructType=PAIRS_SCHEMA,
        stateStructType="open_idx int, open_ts_us bigint, open_text string, frontier int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _tok_count(text):
    """Whitespace token count matching operators/text.token_count exactly:
    NULL -> None, empty/whitespace-only -> 0, else \\s+ splits of trim."""
    if text is None:
        return None
    stripped = text.strip()
    return len(stripped.split()) if stripped else 0


def _pair_state_fn(from_role: str, to_role: str, timeout_minutes: int):
    """Per-conversation handler behind :func:`pair_turns_stream`,
    module-level so the timeout branch is unit-testable."""
    import numpy as np
    import pandas as pd

    out_cols = [
        "conv_id",
        "prompt_idx",
        "prompt_text",
        "prompt_tokens",
        "answered",
        "resp_idx",
        "resp_text",
        "resp_tokens",
        "resp_tool",
        "latency_us",
    ]

    def emit(conv, prompts, resps):
        """prompts: list of (idx, ts_us, text); resps: matching list of
        (idx, ts_us, text, tool) or None."""
        rows = []
        for (p_i, p_ts, p_txt), r in zip(prompts, resps):
            if r is None:
                rows.append((conv, p_i, p_txt, _tok_count(p_txt), False, None, None, None, None, None))
            else:
                r_i, r_ts, r_txt, r_tool = r
                lat = r_ts - p_ts if (r_ts is not None and p_ts is not None) else None
                rows.append(
                    (conv, p_i, p_txt, _tok_count(p_txt), True, r_i, r_txt, _tok_count(r_txt), r_tool, lat)
                )
        df = pd.DataFrame(rows, columns=out_cols)
        for c, dt in (
            ("prompt_idx", "int32"),
            ("resp_idx", "Int32"),
            ("prompt_tokens", "Int64"),
            ("resp_tokens", "Int64"),
            ("latency_us", "Int64"),
        ):
            df[c] = df[c].astype(dt)
        return df

    def fn(key, pdfs, state):
        conv = key[0]
        if state.hasTimedOut:
            open_idx, open_ts, open_text, _ = state.get
            state.remove()
            if open_idx is not None:
                yield emit(conv, [(open_idx, open_ts, open_text)], [None])
            return

        open_idx, open_ts, open_text, frontier = (
            state.get if state.exists else (None, None, None, -1)
        )
        for pdf in pdfs:
            pdf = pdf[pdf["role"].isin([from_role, to_role])]
            pdf = pdf[pdf["turn_idx"] > frontier].sort_values("turn_idx", kind="mergesort")
            if not len(pdf):
                continue
            frontier = int(pdf["turn_idx"].max())
            ts = pd.to_datetime(pdf["ts"])
            # NaT refuses integer casts in pandas>=2; go through numpy
            # (NaT -> int64 min) and mask to None per-row
            tsv = np.where(
                ts.isna().to_numpy(),
                None,
                ts.to_numpy("datetime64[us]").astype(np.int64),
            ).astype(object)
            idx = pdf["turn_idx"].to_numpy(np.int64)
            is_from = (pdf["role"] == from_role).to_numpy()
            texts = pdf["text"].to_numpy(object)
            tools = pdf["tool"].to_numpy(object)

            prompts = (
                [] if open_idx is None else [(int(open_idx), open_ts, open_text)]
            ) + [
                (int(idx[i]), None if tsv[i] is None else int(tsv[i]), texts[i])
                for i in np.flatnonzero(is_from)
            ]
            open_idx = open_ts = open_text = None
            if prompts:
                to_pos = np.flatnonzero(~is_from)
                to_idx = idx[to_pos]
                p_idx = np.asarray([p[0] for p in prompts], dtype=np.int64)
                # first to_role turn strictly after each prompt (vectorized)
                r_at = np.searchsorted(to_idx, p_idx, side="right")
                outp, outr = [], []
                for k, p in enumerate(prompts):
                    fence = p_idx[k + 1] if k + 1 < len(p_idx) else None
                    r = None
                    if r_at[k] < len(to_idx):
                        j = to_pos[r_at[k]]
                        if fence is None or idx[j] < fence:
                            r = (
                                int(idx[j]),
                                None if tsv[j] is None else int(tsv[j]),
                                texts[j],
                                tools[j],
                            )
                    if r is None and fence is None:
                        # newest prompt with no answer yet: stays pending
                        open_idx, open_ts, open_text = p
                    else:
                        outp.append(p)
                        outr.append(r)
                if outp:
                    yield emit(conv, outp, outr)
        state.update((open_idx, open_ts, open_text, frontier))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    return fn


# ---------------------------------------------------------------------------
# streaming preference mining (twin of operators/preference.preference_pairs)
# ---------------------------------------------------------------------------

PREF_SCHEMA = (
    "prompt_text string, n_cands bigint,"
    " chosen_conv string, chosen_idx int, chosen_resp_idx int,"
    " chosen_text string, chosen_reward bigint,"
    " rejected_conv string, rejected_idx int, rejected_resp_idx int,"
    " rejected_text string, rejected_reward bigint, margin bigint"
)


def _pref_reward(text):
    """Exact Python twin of ``preference.response_reward``, mirroring the
    JVM chain symbol-for-symbol rather than using Python's near-miss
    idioms: Spark ``trim`` strips only U+0020 (not ``\\n`` or Unicode
    spaces, unlike Python ``str.strip()``); Java's ``\\s`` is ASCII-only
    (NBSP/U+2009 are NOT delimiters, unlike Python ``str.split()``); and
    Spark ``split``'s default limit -1 is ``Pattern.split(input, -1)``,
    which KEEPS the empty tokens that edge whitespace produces — so
    ``"\\nhello"`` counts 2 tokens here exactly as in the batch operator.
    ``len``/code-point semantics and the ASCII ``[A-Za-z]`` class agree
    with Spark's ``length``/``regexp_replace``; integer ``//`` equals the
    operator's ``floor(x*1000.0/n)`` for these magnitudes (exact-dyadic
    argument in operators/text._per_mille usage). Parity is pinned by
    tests/test_streaming_preference.py's adversarial-whitespace case."""
    import re

    if text is None:
        return None
    stripped = text.strip(" ")
    tok = len(re.split(r"\s+", stripped, flags=re.ASCII)) if stripped else 0
    n = len(text)
    alpha = len(re.sub("[^A-Za-z]", "", text))
    return tok * 1000 + ((alpha * 1000) // n if n > 0 else 0)


def preference_stream(df: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/preference.preference_pairs``:
    running (chosen, rejected) per prompt over a live stream of candidate
    pairs (``pair_turns`` output shape) via ``applyInPandasWithState``
    keyed on ``prompt_text``.

    State per prompt is O(1) — candidate count plus the current best and
    worst (reward, conv_id, prompt_idx, resp_idx, resp_text) tuples under
    the batch operator's exact tie-break order. Each micro-batch that
    changes a prompt's snapshot emits the updated row (UPDATE semantics:
    downstream keeps the latest row per prompt; a chosen response CAN be
    superseded by a later better candidate, so append mode would lie).
    Rows are emitted regardless of margin — the margin>0 informative
    filter is the consumer's, because a prompt can become informative
    later (parity test filters identically).

    Exactness contract: after any prefix of the stream, the latest
    snapshot per prompt — filtered to ``margin > 0`` — equals batch
    ``preference_pairs`` over the same candidate rows (pytest-pinned
    across micro-batch splits). Candidates are disqualified per-row
    exactly like the batch operator (NULL prompt / NULL response /
    unanswered)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    cols = [
        "prompt_text", "n_cands",
        "chosen_conv", "chosen_idx", "chosen_resp_idx", "chosen_text", "chosen_reward",
        "rejected_conv", "rejected_idx", "rejected_resp_idx", "rejected_text",
        "rejected_reward", "margin",
    ]

    def fn(key, pdfs, state):
        (prompt,) = key
        if state.exists:
            n, b_r, b_c, b_i, b_ri, b_t, w_r, w_c, w_i, w_ri, w_t = state.get
            best = (b_r, b_c, b_i, b_ri, b_t) if n else None
            worst = (w_r, w_c, w_i, w_ri, w_t) if n else None
        else:
            n, best, worst = 0, None, None
        changed = False
        for pdf in pdfs:
            if prompt is None:
                continue  # NULL prompt: untrainable, refuse the group's rows
            cand = pdf[pdf["answered"].fillna(False) & pdf["resp_text"].notna()]

            def _key(t):
                # Spark-struct null ordering: a NULL field sorts below any
                # non-NULL value. (present, value) pairs reproduce the batch
                # operator's null-aware min/max tie-break on junk rows (NULL
                # conv_id / prompt_idx) instead of raising TypeError — the
                # row degrades per-row exactly like the batch path, it does
                # not kill the streaming query.
                return (
                    t[0],
                    (t[1] is not None, t[1] if t[1] is not None else ""),
                    (t[2] is not None, t[2] if t[2] is not None else 0),
                )

            for row in cand.itertuples(index=False):
                r = _pref_reward(row.resp_text)
                t = (r, row.conv_id,
                     int(row.prompt_idx) if pd.notna(row.prompt_idx) else None,
                     int(row.resp_idx) if pd.notna(row.resp_idx) else None,
                     row.resp_text)
                n += 1
                changed = True
                if best is None or _key(t) > _key(best):
                    best = t
                if worst is None or _key(t) < _key(worst):
                    worst = t
        if changed:
            state.update((n, best[0], best[1], best[2], best[3], best[4],
                          worst[0], worst[1], worst[2], worst[3], worst[4]))
            yield pd.DataFrame(
                [(prompt, n, best[1], best[2], best[3], best[4], best[0],
                  worst[1], worst[2], worst[3], worst[4], worst[0],
                  best[0] - worst[0])],
                columns=cols,
            )

    return df.groupBy("prompt_text").applyInPandasWithState(
        fn,
        outputStructType=PREF_SCHEMA,
        stateStructType=(
            "n bigint, b_r bigint, b_c string, b_i int, b_ri int, b_t string,"
            " w_r bigint, w_c string, w_i int, w_ri int, w_t string"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming render accounting (twin of dialogue.render_conversations' sizes)
# ---------------------------------------------------------------------------

RENDER_STATS_SCHEMA = "conv_id string, n_turns bigint, n_chars bigint"


def render_stats_stream(df: DataFrame) -> DataFrame:
    """Streaming twin of the SIZE half of ``dialogue.render_conversations``:
    running (n_turns, n_chars) per conversation over a live turn stream —
    the accounting a context-budget monitor or corpus sizer needs, without
    ever holding a conversation's text in state.

    The rendered length decomposes order-independently: ``n_chars =
    sum(per-turn template length) + (n_turns - 1)`` separators, and each
    turn's template length is ``len('<|') + len(role) + len('|>') +
    len(text) + len('<|end|>')`` with NULLs as '' — exactly the
    arithmetic ``dialogue.render_spans`` uses. So state per conversation
    is TWO counters (turn count, summed turn lengths): O(1), monotone,
    indifferent to arrival order, and exact against the batch renderer
    after any prefix of the stream (pytest-pinned). UPDATE-mode snapshots:
    downstream keeps the latest row per conversation."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from opentelemetry_collector_spark.operators.dialogue import (
        _ROLE_CLOSE,
        _ROLE_OPEN,
        _TURN_END,
        _TURN_SEP,
    )

    overhead = len(_ROLE_OPEN) + len(_ROLE_CLOSE) + len(_TURN_END)
    sep = len(_TURN_SEP)

    def fn(key, pdfs, state):
        (conv,) = key
        n, sum_len = state.get if state.exists else (0, 0)
        changed = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            changed = True
            role_len = pdf["role"].fillna("").str.len()
            text_len = pdf["text"].fillna("").str.len()
            n += len(pdf)
            sum_len += int((role_len + text_len).sum()) + overhead * len(pdf)
        if changed:
            state.update((n, sum_len))
            n_chars = sum_len + sep * (n - 1) if n else 0
            yield pd.DataFrame(
                [(conv, n, n_chars)], columns=["conv_id", "n_turns", "n_chars"]
            )

    return df.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=RENDER_STATS_SCHEMA,
        stateStructType="n bigint, sum_len bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
