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
        self.run_id = run_id
        self.rows: list[tuple[str, str, str | None, str, int]] = []

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

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, schema=METRICS_SCHEMA)
