"""obsreport-style per-component metrics.

Reference taxonomy (``internal/obsreportconfig/obsmetrics/``):
- receiver: accepted_/refused_log_records (obs_receiver.go:24-55)
- processor: accepted_/refused_/dropped_log_records (obs_processor.go:24-77)
- exporter: sent_log_records, send_failed_log_records,
  enqueue_failed_log_records (obs_exporter.go:24-95)

Spark mapping: counts are computed from DataFrame actions / write results and
materialized into a `metrics` table (run_id, component, sink, metric, value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from opentelemetry_collector_spark.schema import METRICS_SCHEMA


class MetricsCollector:
    def __init__(self, run_id: str):
        import time

        self.run_id = run_id
        self.rows: list[tuple[str, str, str | None, str, int]] = []
        # process-start analog: the collector's construction marks the run's
        # epoch, like ProcessMetricsViews records its start for process/uptime
        # (service/internal/telemetry/process_telemetry.go:30-47)
        self._t0 = time.monotonic()

    def add(self, component: str, metric: str, value: int, sink: str | None = None) -> None:
        self.rows.append((self.run_id, component, sink, metric, int(value)))

    def receiver_accepted(self, n: int, component: str = "receiver/scan") -> None:
        self.add(component, "accepted_log_records", n)

    def processor_counts(self, component: str, before: int, after: int) -> None:
        self.add(component, "accepted_log_records", after)
        self.add(component, "dropped_log_records", before - after)

    def processor_refused(self, component: str, n: int) -> None:
        # memory-limiter path: batches rejected at admission are *refused*,
        # not dropped (obs_processor.go:24-77; memorylimiter.go:191-209)
        self.add(component, "refused_log_records", n)

    def exporter_sent(self, sink: str, n: int, failed: int = 0) -> None:
        self.add("exporter", "sent_log_records", n, sink=sink)
        self.add("exporter", "send_failed_log_records", failed, sink=sink)

    def exporter_enqueue_failed(self, sink: str, n: int) -> None:
        # queue-full refusals are their own counter family, distinct from
        # send failures (obs_exporter.go:24-95 enqueue_failed_log_records)
        self.add("exporter", "enqueue_failed_log_records", n, sink=sink)

    def exporter_queue_size(self, sink: str, n: int) -> None:
        # gauge analog: instantaneous queue depth observed at enqueue
        # (obsmetrics exporter/queue_size)
        self.add("exporter", "queue_size", n, sink=sink)

    def record_process_telemetry(self, component: str = "service/telemetry") -> None:
        """Engine self-telemetry gauges, the ProcessMetricsViews analog
        (service/internal/telemetry/process_telemetry.go:30-90): the
        reference samples process/uptime, process/memory/rss and
        process/cpu_seconds via gopsutil on a ticker; a batch engine
        samples once per run (and callers may call repeatedly — uptime is
        monotone across calls). Integer units so the LongType metrics
        value stays exact: microseconds for times, bytes for memory.
        Driver-side stdlib only (resource.getrusage — no gopsutil
        equivalent dependency): ru_maxrss is the PEAK resident set (the
        high-watermark a capacity planner actually wants; Linux reports
        KiB), ru_utime+ru_stime is total user+system CPU. Executor-side
        memory is Spark's own telemetry domain (event log / UI), see
        COVERAGE.md §2.6."""
        import resource
        import time

        ru = resource.getrusage(resource.RUSAGE_SELF)
        self.add(component, "process/uptime_us", int((time.monotonic() - self._t0) * 1e6))
        self.add(component, "process/memory/rss_peak_bytes", int(ru.ru_maxrss) * 1024)
        self.add(
            component,
            "process/cpu_seconds_us",
            int((ru.ru_utime + ru.ru_stime) * 1e6),
        )

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, schema=METRICS_SCHEMA)
