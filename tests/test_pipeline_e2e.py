"""End-to-end pipeline tests: the testbed correctness analog.

Reference gate: sent items == received items per run
(testbed/correctness/traces/correctness_test.go:95-100), plus our
north-star invariants (FIXTURES.md §6): per-turn text equality under stable
(conv_id, turn_idx) ordering, per-sink aggregate counts, routed-row set
equality, determinism, and checkpoint resume.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.attributes import Action, apply_actions
from opentelemetry_collector_spark.operators.parse import extract_columns
from opentelemetry_collector_spark.plans.checkpoint import CheckpointManifest
from opentelemetry_collector_spark.plans.pipeline import PipelineSpec, SinkSpec, run_pipeline
from opentelemetry_collector_spark.sources.transcripts import synthesize


def _spec(spark, base, n_convs=100):
    def source(s):
        return synthesize(s, n_convs=n_convs, mean_turns=8, seed=42)

    def parse(df):
        return extract_columns(df, "text", r"tool_call: (?P<tool_name>\w+)\((?P<arg>[^)]*)\)")

    def attrs(df):
        return apply_actions(df, [Action("stage", "upsert", value="e2e")])

    return PipelineSpec(
        name="e2e",
        source=source,
        processors=[parse, attrs],
        sinks=[
            SinkSpec("sink_tools", F.col("tool_name").isNotNull(), f"{base}/sink_tools"),
            SinkSpec("sink_user", F.col("role") == "user", f"{base}/sink_user"),
        ],
    )


def test_pipeline_e2e_counts_and_invariants(spark, tmp_path):
    base = str(tmp_path / "run1")
    spec = _spec(spark, base)
    res = run_pipeline(spark, spec, base)

    src = spec.source(spark)
    n_user = src.filter(F.col("role") == "user").count()
    assert res.sink_rows["sink_user"] == n_user  # sent == received

    # per-turn text equality under stable ordering vs the input
    out = spark.read.parquet(f"{base}/sink_user").orderBy("conv_id", "turn_idx")
    inp = src.filter(F.col("role") == "user").orderBy("conv_id", "turn_idx")
    assert [r.text for r in out.select("text").collect()] == [
        r.text for r in inp.select("text").collect()
    ]

    # metrics table taxonomy
    m = spark.read.parquet(f"{base}/metrics")
    metrics = {r.metric for r in m.collect()}
    assert {"accepted_log_records", "dropped_log_records", "sent_log_records"} <= metrics
    sent = {
        r.sink: r.value for r in m.filter(F.col("metric") == "sent_log_records").collect()
    }
    assert sent == res.sink_rows


def test_pipeline_validation():
    with pytest.raises(ValueError):
        PipelineSpec(name="bad", source=lambda s: None, sinks=[]).validate()


def test_resume_skips_committed_sinks(spark, tmp_path):
    base = str(tmp_path / "run2")
    spec = _spec(spark, base, n_convs=40)
    r1 = run_pipeline(spark, spec, base, run_id="r1")
    assert r1.resumed_sinks == []
    # second run over identical input resumes every sink
    r2 = run_pipeline(spark, spec, base, run_id="r2")
    assert set(r2.resumed_sinks) == {"sink_tools", "sink_user"}
    assert r2.sink_rows == r1.sink_rows


def test_crash_between_sink_and_manifest_is_idempotent(spark, tmp_path):
    # SURVEY §7 risk 4: sink committed but manifest write lost => re-run
    # rewrites the sink idempotently (overwrite), same final content.
    base = str(tmp_path / "run3")
    spec = _spec(spark, base, n_convs=40)
    r1 = run_pipeline(spark, spec, base, run_id="r1")
    # simulate lost manifest for sink_user
    man = CheckpointManifest(base)
    entries = [e for e in man.load() if e.stage != "sink_user"]
    import json, os

    with open(man.path, "w") as f:
        for e in entries:
            f.write(json.dumps(e.__dict__) + "\n")
    r2 = run_pipeline(spark, spec, base, run_id="r2")
    assert r2.resumed_sinks == ["sink_tools"]
    assert r2.sink_rows == r1.sink_rows


def test_determinism_two_runs_identical(spark, tmp_path):
    b1, b2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    for b in (b1, b2):
        run_pipeline(spark, _spec(spark, b, n_convs=40), b)
    a = spark.read.parquet(f"{b1}/sink_tools").orderBy("conv_id", "turn_idx").collect()
    b = spark.read.parquet(f"{b2}/sink_tools").orderBy("conv_id", "turn_idx").collect()
    assert a == b


def test_per_partition_lineage_recorded(spark, tmp_path):
    """North-rule lineage: every committed parquet sink logs one line per
    written partition file with exact footer row counts, summing to the
    sink's sent count."""
    from opentelemetry_collector_spark.plans.checkpoint import LineageLog

    base = str(tmp_path / "lineage_run")
    spec = _spec(spark, base)
    res = run_pipeline(spark, spec, base)
    entries = LineageLog(base).load()
    assert entries, "lineage log missing"
    for sink, n in res.sink_rows.items():
        sink_entries = [e for e in entries if e["stage"] == sink]
        assert sink_entries and sum(e["rows"] for e in sink_entries) == n
        assert all(e["status"] == "committed" and e["file"] for e in sink_entries)
        # partition ids are dense from 0
        assert sorted(e["partition_id"] for e in sink_entries) == list(range(len(sink_entries)))


def test_health_flips_ready_after_run(spark, tmp_path):
    """healthcheck analog: unavailable before the run, ready after every sink
    commits (healthcheckextension.go:83-88 Ready/Unavailable)."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.plans.checkpoint import input_snapshot_id
    from opentelemetry_collector_spark.plans.pipeline import (
        PipelineSpec,
        SinkSpec,
        run_pipeline,
    )
    from opentelemetry_collector_spark.plans.status import (
        READY,
        UNAVAILABLE,
        pipeline_health,
        zpages_text,
    )
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    def source(s):
        return synthesize(s, n_convs=4, mean_turns=3, seed=7)

    spec = PipelineSpec(
        name="p",
        source=source,
        sinks=[SinkSpec(name="all", predicate=F.lit(True), path=str(tmp_path / "all"))],
    )
    from opentelemetry_collector_spark.plans.pipeline import pipeline_snapshot

    df = source(spark)
    snapshot = pipeline_snapshot("p", df, df.count())
    base = str(tmp_path / "base")
    before = pipeline_health(spec, base, snapshot)
    assert before.status == UNAVAILABLE and before.pending_sinks == ["all"]
    run_pipeline(spark, spec, base)
    after = pipeline_health(spec, base, snapshot)
    assert after.status == READY and after.committed_sinks == ["all"]
    page = zpages_text({"p": spec})
    assert "pipeline p:" in page and "exporter all: format=parquet" in page


def _mini_spec(tmp_path, two_sinks=False):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.plans.pipeline import PipelineSpec, SinkSpec
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    sinks = [SinkSpec(name="a", predicate=F.lit(True), path=str(tmp_path / "a"))]
    if two_sinks:
        sinks.append(SinkSpec(name="b", predicate=F.lit(True), path=str(tmp_path / "b")))
    return PipelineSpec(
        name="p",
        source=lambda s: synthesize(s, n_convs=3, mean_turns=3, seed=5),
        sinks=sinks,
    )


def test_retry_recovers_from_transient_sink_failure(spark, tmp_path, monkeypatch):
    """queued_retry.go:241-332 analog: transient failures retried with
    backoff; the write is overwrite-idempotent so a retry replaces output."""
    from opentelemetry_collector_spark.plans import pipeline as P

    real = P.write_sink
    calls = {"n": 0}

    def flaky(df, s):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("transient io")
        real(df, s)

    monkeypatch.setattr(P, "write_sink", flaky)
    res = P.run_pipeline(spark, _mini_spec(tmp_path), str(tmp_path / "base"))
    assert calls["n"] == 3 and res.sink_rows["a"] > 0
    failed = {
        (r.sink): r.value
        for r in res.metrics.filter("metric = 'send_failed_log_records'").collect()
    }
    assert failed["a"] > 0  # two failed attempts recorded


def test_permanent_error_not_retried_and_combined(spark, tmp_path, monkeypatch):
    """Permanent errors short-circuit the retry loop (consumererror.Permanent)
    and combine without blocking sibling sinks (fanoutconsumer error
    combination)."""
    import pytest

    from opentelemetry_collector_spark.plans import pipeline as P

    real = P.write_sink
    calls = {"a": 0, "b": 0}

    def partial(df, s):
        calls[s.name] += 1
        if s.name == "a":
            raise ValueError("bad schema")  # classified permanent
        real(df, s)

    monkeypatch.setattr(P, "write_sink", partial)
    spec = _mini_spec(tmp_path, two_sinks=True)
    with pytest.raises(P.SinkErrors, match="bad schema"):
        P.run_pipeline(spark, spec, str(tmp_path / "base"))
    assert calls == {"a": 1, "b": 1}  # no retry on permanent; sibling delivered
    assert spark.read.parquet(str(tmp_path / "b")).count() > 0

    # resume: fixed writer re-runs ONLY the failed sink
    monkeypatch.setattr(P, "write_sink", real)
    res = P.run_pipeline(spark, spec, str(tmp_path / "base"))
    assert res.resumed_sinks == ["b"] and res.sink_rows["a"] > 0


def test_manifest_tolerates_torn_trailing_line(tmp_path):
    """A crash mid-append leaves a partial JSON line; load()/resume must
    skip it (torn NON-trailing lines are real corruption and still raise)."""
    import json

    import pytest

    from opentelemetry_collector_spark.plans.checkpoint import (
        CheckpointManifest,
        ManifestEntry,
    )

    m = CheckpointManifest(str(tmp_path))
    m.commit(ManifestEntry("r1", "sink_a", "snap@rows=5", "committed", 5))
    # forward-compat: unknown fields from a newer build are dropped
    with open(m.path, "a") as f:
        f.write(json.dumps({"run_id": "r3", "stage": "sink_b", "input_snapshot": "s",
                            "status": "committed", "rows": 1, "new_field": True}) + "\n")
    assert m.committed("sink_b", "s").rows == 1
    with open(m.path, "a") as f:
        f.write('{"run_id": "r2", "stage": "si')  # torn trailing append
    assert [e.stage for e in m.load()] == ["sink_a", "sink_b"]
    assert m.committed("sink_a", "snap@rows=5").rows == 5
    # torn line in the MIDDLE is corruption
    with open(m.path) as f:
        lines = f.read().splitlines()
    lines.insert(0, '{"torn')
    with open(m.path, "w") as f:
        f.write("\n".join(lines) + "\n")
    with pytest.raises(json.JSONDecodeError):
        m.load()


def test_snapshot_distinguishes_different_inputs_same_rowcount(spark, tmp_path):
    """Re-pointing the receiver at a different dataset with the same row
    count must NOT resume against the old manifest entry."""
    from opentelemetry_collector_spark.plans.pipeline import pipeline_snapshot

    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    spark.range(5).write.parquet(str(a))
    spark.range(5).write.parquet(str(b))
    da, db = spark.read.parquet(str(a)), spark.read.parquet(str(b))
    assert pipeline_snapshot("p", da, 5) != pipeline_snapshot("p", db, 5)
    assert pipeline_snapshot("p", da, 5) == pipeline_snapshot("p", da, 5)


def test_throttle_hint_raises_backoff_delay(spark, tmp_path, monkeypatch):
    """queued_retry.go:306-308: a throttle hint FLOORS the next backoff —
    the retry never waits less than the server asked."""
    from opentelemetry_collector_spark.plans import pipeline as P

    real = P.write_sink
    calls = {"n": 0}
    sleeps: list[float] = []

    def throttled(df, s):
        calls["n"] += 1
        if calls["n"] == 1:
            raise P.ThrottleError("slow down", delay_s=1.25)
        if calls["n"] == 2:
            raise RuntimeError("transient")
        real(df, s)

    monkeypatch.setattr(P, "write_sink", throttled)
    # patch the module's sleep seam, NOT global time.sleep: py4j's cleanup
    # thread calls time.sleep(1) in the background and would race the spy
    monkeypatch.setattr(P, "_sleep", lambda d: sleeps.append(d))
    res = P.run_pipeline(spark, _mini_spec(tmp_path), str(tmp_path / "base"))
    assert res.sink_rows["a"] > 0
    # first delay floored to the hint (base backoff is 0.2); second delay
    # falls back to plain exponential (0.4) — the hint is per-error
    assert sleeps[0] == 1.25 and sleeps[1] < 1.25


def test_queue_capacity_refuses_batch_as_enqueue_failed(spark, tmp_path):
    """Sending-queue admission: an over-capacity batch is REFUSED before
    any send attempt (enqueue_failed_log_records, obs_exporter.go:24-95),
    never counted as send_failed, and siblings see the same refusal
    independently. The queue_size gauge is recorded for admitted runs."""
    from opentelemetry_collector_spark.plans import pipeline as P

    res = P.run_pipeline(
        spark, _mini_spec(tmp_path), str(tmp_path / "base"),
        queue_capacity=1, raise_on_sink_error=False,
    )
    rows = {(r.metric, r.sink): r.value for r in res.metrics.collect() if r.sink}
    assert rows[("enqueue_failed_log_records", "a")] > 1
    assert ("sent_log_records", "a") not in rows
    assert res.sink_rows == {}
    # an admitted run reports the gauge and the full exporter taxonomy
    res2 = P.run_pipeline(
        spark, _mini_spec(tmp_path / "ok"), str(tmp_path / "ok" / "base"),
        queue_capacity=10_000,
    )
    fam = {r.metric for r in res2.metrics.collect() if r.sink}
    assert {"sent_log_records", "send_failed_log_records", "queue_size"} <= fam
    gauge = [r.value for r in res2.metrics.collect() if r.metric == "queue_size"]
    assert gauge and gauge[0] == res2.sink_rows["a"]


def test_process_telemetry_gauges_present_and_monotone(spark, tmp_path):
    """Engine self-telemetry (process_telemetry.go:30-90 analog): every run
    emits uptime / peak-RSS / CPU gauges into the metrics table, uptime is
    monotone across successive samples, and values are sane (peak RSS of a
    live JVM+Python driver is comfortably >32MB; CPU time positive)."""
    from opentelemetry_collector_spark.plans.metrics import MetricsCollector

    base = str(tmp_path / "runpt")
    res = run_pipeline(spark, _spec(spark, base), base)
    vals = {
        r.metric: r.value
        for r in res.metrics.filter(F.col("component") == "service/telemetry").collect()
    }
    assert {
        "process/uptime_us",
        "process/memory/rss_peak_bytes",
        "process/cpu_seconds_us",
    } <= set(vals)
    assert vals["process/uptime_us"] > 0
    assert vals["process/memory/rss_peak_bytes"] > 32 * 1024 * 1024
    assert vals["process/cpu_seconds_us"] > 0

    # monotone uptime across repeated samples on one collector
    mc = MetricsCollector("ptest")
    mc.record_process_telemetry()
    mc.record_process_telemetry()
    ups = [v for (_, comp, _, met, v) in mc.rows if met == "process/uptime_us"]
    assert len(ups) == 2 and ups[1] >= ups[0]
    # persisted alongside the obsreport rows, same schema
    persisted = {
        r.metric
        for r in spark.read.parquet(f"{base}/metrics")
        .filter(F.col("component") == "service/telemetry")
        .collect()
    }
    assert "process/uptime_us" in persisted
