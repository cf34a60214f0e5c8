"""Pipeline planner: config spec -> DataFrame DAG -> per-sink writes.

The reference builds pipelines backwards from a YAML config — exporters,
then processors back-to-front, then receivers
(``service/internal/builder/pipelines_builder.go:93-216``,
``service/service.go:154-198``); the IR is a chain of consumer closures.
Here the "IR" is a chain of pure DataFrame->DataFrame functions; Catalyst
owns physical ordering, so "start backwards" reduces to validating sinks
before materializing scans.

Spec shape (dict; YAML loads to the same thing — configloader analog,
``config/configloader/config.go:96-140``):

    {
      "receivers":  {"transcripts": {"path": ".../events.parquet"}},
      "processors": [ {"type": "attributes", ...}, {"type": "filter", ...} ],
      "exporters":  {"sink_a": {"predicate": ..., "path": ...}, ...},
    }

Validation mirrors config.go:31-150: >=1 receiver and >=1 exporter.
"""

from __future__ import annotations

import time as _time_mod
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.checkpoint import (
    CheckpointManifest,
    LineageLog,
    ManifestEntry,
    input_snapshot_id,
    partition_lineage,
)
from opentelemetry_collector_spark.plans.metrics import MetricsCollector

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class SinkSpec:
    name: str
    predicate: Column
    path: str
    format: str = "parquet"
    max_records_per_file: int | None = None
    # Kafka-exporter analog (exporter/kafkaexporter/kafka_exporter.go:44-100,
    # jaeger_marshaler.go:56 keys messages by trace id): co-locate a sink's
    # rows by key before writing, so downstream consumers see per-key locality
    repartition_key: str | None = None
    # hive-style partitioned layout (partition pruning for sink readers)
    partition_by: list[str] | None = None
    # bucketed layout (SURVEY §7 scale machinery: pre-partitioning so every
    # downstream groupBy/join on the key reads co-located buckets and skips
    # its Exchange entirely — the parquet analog of the Iceberg
    # `bucket(N, conv_id)` transform above). Requires saveAsTable: the sink's
    # `name` becomes the table identifier and `path` its external location.
    bucket_by: tuple[int, str] | None = None
    bucket_sort: list[str] | None = None


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath.

    On a Spark Connect session there is no driver-side ``_jvm`` to probe —
    report available and let the write surface the server's own error if
    the runtime is genuinely missing (refusing here would block Connect
    users whose server classpath is fine)."""
    jvm = getattr(spark, "_jvm", None)
    if jvm is None:
        return True
    try:
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _iceberg_partition_col(spec: str):
    """'days(ts)' / 'bucket(16, conv_id)' / 'conv_id' -> partition Column.

    The transforms the north_rule tables want: days(ts) for time pruning,
    bucket(N, conv_id) so per-conversation reads and downstream co-located
    joins skip the shuffle (Iceberg's hidden partitioning)."""
    try:  # Spark 4.x home for partition transforms
        from pyspark.sql.functions import partitioning as PT
    except ImportError:  # pragma: no cover - Spark 3.x fallback
        PT = F
    spec = spec.strip()
    if spec.startswith("days(") and spec.endswith(")"):
        return PT.days(spec[5:-1].strip())
    if spec.startswith("hours(") and spec.endswith(")"):
        return PT.hours(spec[6:-1].strip())
    if spec.startswith("bucket(") and spec.endswith(")"):
        n, col = spec[7:-1].split(",", 1)
        return PT.bucket(int(n), col.strip())
    return F.col(spec)


def write_sink(df: DataFrame, s: SinkSpec) -> None:
    """One idempotent sink write honoring the spec's physical options."""
    out = df.filter(s.predicate)
    if s.repartition_key:
        out = out.repartition(F.col(s.repartition_key))
    if s.format == "iceberg":
        # north_rule target: per-exporter Iceberg tables. `path` is a catalog
        # table identifier (catalog.db.table). DataFrameWriterV2 lets Iceberg
        # own commit atomicity — its snapshot id is the durable form of our
        # parquet manifest analog (plans/checkpoint.py), and replace is the
        # same idempotent overwrite contract.
        if not iceberg_available(out.sparkSession):
            raise RuntimeError(
                "sink format 'iceberg' requires the iceberg-spark-runtime jar "
                "and a configured catalog (spark.sql.catalog.<name>); "
                "use format='parquet' otherwise"
            )
        # max_records_per_file is NOT mapped: Iceberg sizes files in BYTES
        # (write.target-file-size-bytes table property, set by the table
        # owner) — converting a record count with an assumed record width
        # would silently mean different things per format
        if s.bucket_sort:
            raise NotImplementedError(
                "bucket_sort for iceberg sinks: sort order is a table-level "
                "DDL (ALTER TABLE ... WRITE ORDERED BY), not a writer option"
            )
        writer = out.writeTo(s.path).using("iceberg")
        part_cols = [_iceberg_partition_col(p) for p in (s.partition_by or [])]
        if s.bucket_by:
            # the co-location contract maps to Iceberg's bucket transform
            n, key = s.bucket_by
            part_cols.append(_iceberg_partition_col(f"bucket({n}, {key})"))
        if part_cols:
            writer = writer.partitionedBy(*part_cols)
        writer.createOrReplace()
        return
    writer = out.write.mode("overwrite").format(s.format)
    if s.max_records_per_file:
        writer = writer.option("maxRecordsPerFile", s.max_records_per_file)
    if s.partition_by:
        writer = writer.partitionBy(*s.partition_by)
    if s.bucket_by:
        n, key = s.bucket_by
        writer = writer.bucketBy(n, key)
        if s.bucket_sort:
            writer = writer.sortBy(*s.bucket_sort)
        # bucketBy requires a table (file names carry bucket ids); external
        # location keeps the data addressable outside the session catalog —
        # re-attach in a later session with register_bucketed()
        writer.option("path", s.path).saveAsTable(s.name)
        return
    writer.save(s.path)


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    schema_ddl: str,
    buckets: int,
    key: str,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Re-attach an existing bucketed parquet location in a fresh session.

    Bucket membership is encoded in the file names, but the *spec* (bucket
    count/column) lives in the catalog — a plain ``read.parquet`` of the same
    files loses the co-location guarantee and re-shuffles. This recreates the
    table definition over the existing location (no data rewrite).
    """
    sorted_by = f"SORTED BY ({', '.join(sort_cols)})" if sort_cols else ""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({key}) {sorted_by} INTO {buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
    return spark.table(table)


@dataclass
class PipelineSpec:
    name: str
    source: Callable[[SparkSession], DataFrame]
    processors: list[Transform] = field(default_factory=list)
    sinks: list[SinkSpec] = field(default_factory=list)

    def validate(self) -> None:
        # config.go:31-150 — every pipeline needs >=1 receiver & >=1 exporter
        if self.source is None:
            raise ValueError(f"pipeline {self.name}: must have a source")
        if not self.sinks:
            raise ValueError(f"pipeline {self.name}: must have at least one exporter")


def is_permanent(exc: Exception) -> bool:
    """Permanent-error classification (consumererror.Permanent analog,
    queued_retry.go:241-263): config/schema/analysis errors never heal with
    a retry; IO/transient runtime errors might."""
    from pyspark.errors import AnalysisException, IllegalArgumentException

    return isinstance(exc, (AnalysisException, IllegalArgumentException, ValueError, TypeError))


class ThrottleError(RuntimeError):
    """A retryable failure carrying a server-suggested delay — the
    exporterhelper throttle hint (queued_retry.go:306-308: the backoff
    interval becomes max(computed, hinted); gRPC throttling / HTTP
    Retry-After both surface this way in the reference)."""

    def __init__(self, message: str, delay_s: float):
        super().__init__(message)
        self.delay_s = float(delay_s)


def _sleep(seconds: float) -> None:
    """Retry-delay indirection. Tests observe backoff by patching THIS, not
    the global ``time.sleep``: py4j's client-server cleanup thread calls
    ``time.sleep(1)`` in the background, so a global patch races with it
    and records phantom delays (seen once under full-suite load)."""
    _time_mod.sleep(seconds)


def write_sink_with_retry(
    df: DataFrame,
    s: SinkSpec,
    max_attempts: int = 3,
    initial_backoff_s: float = 0.2,
    backoff_cap_s: float = 30.0,
) -> int:
    """Exponential-backoff retry around one sink write; returns the number
    of FAILED attempts (for the send_failed metric).

    Mirrors the exporterhelper retry sender (queued_retry.go:90-98: 5 s
    initial -> 30 s cap; :241-332 retry loop, permanent short-circuit,
    :306-308 throttle hint: a :class:`ThrottleError` raises the NEXT delay
    to at least the server-suggested one — backoff never shortens it).
    Spark already retries tasks inside a job — this wraps whole-JOB failures
    (driver-visible), which is the layer the Go retry operates at. The write
    is overwrite-idempotent, so a retry replaces partial output."""
    failed = 0
    backoff = initial_backoff_s
    while True:
        try:
            write_sink(df, s)
            return failed
        except Exception as exc:
            failed += 1
            if is_permanent(exc) or failed >= max_attempts:
                raise
            delay = min(backoff, backoff_cap_s)
            if isinstance(exc, ThrottleError):
                delay = max(delay, exc.delay_s)
            _sleep(delay)
            backoff *= 2


class SinkErrors(RuntimeError):
    """Combination of per-sink failures (fanoutconsumer/consumer.go:48-56 —
    one child's error must not short-circuit deliveries to its siblings)."""

    def __init__(self, errors: dict[str, Exception]):
        self.errors = errors
        detail = "; ".join(f"{k}: {type(v).__name__}: {v}" for k, v in errors.items())
        super().__init__(f"{len(errors)} sink(s) failed: {detail}")


def _read_sink(spark: SparkSession, s: SinkSpec) -> DataFrame:
    if s.format == "iceberg":
        return spark.table(s.path)
    return spark.read.format(s.format).load(s.path)


def pipeline_snapshot(name: str, df: DataFrame, n_in: int) -> str:
    """The resume key: pipeline name + the scanned FILE SET + row count
    (the checkpoint contract: "identifies the exact input"). Re-pointing
    the receiver at a different dataset of coincidentally equal size must
    NOT resume against the old manifest. Health probes compute the same id
    to ask "is the CURRENT input fully committed"."""
    import hashlib

    files = sorted(df.inputFiles())
    file_fp = hashlib.md5("\n".join(files).encode()).hexdigest()[:12] if files else "inline"
    return input_snapshot_id(f"{name}:{file_fp}", n_in)


@dataclass
class RunResult:
    run_id: str
    sink_rows: dict[str, int]
    metrics: DataFrame
    resumed_sinks: list[str]


def run_pipeline(
    spark: SparkSession,
    spec: PipelineSpec,
    base_path: str,
    run_id: str | None = None,
    input_rows: int | None = None,
    max_attempts: int = 3,
    raise_on_sink_error: bool = True,
    queue_capacity: int | None = None,
) -> RunResult:
    """Execute: scan -> processors -> predicate fan-out -> idempotent sink
    writes (exp-backoff retried), with obsreport metrics and a
    resume-capable manifest. A failing sink does not block its siblings;
    all failures raise combined as :class:`SinkErrors` at the end.

    ``queue_capacity`` is the sending-queue admission analog
    (exporterhelper QueueSettings): a batch larger than the capacity is
    REFUSED before any send attempt — counted as
    ``enqueue_failed_log_records`` (obs_exporter.go:24-95), exactly the
    "sending_queue is full" drop. Admitted batches record the
    ``queue_size`` gauge observed at enqueue time (the instantaneous
    queue depth a bounded in-memory queue would report)."""
    spec.validate()
    run_id = run_id or uuid.uuid4().hex[:12]
    metrics = MetricsCollector(run_id)

    df = spec.source(spark)
    df_processed = df
    for p in spec.processors:
        df_processed = p(df_processed)
    # cache when fanning to many sinks (the receiver fan-in reuse analog,
    # receivers_builder.go:161-233 — one scan feeds all pipelines)
    if len(spec.sinks) > 1:
        df_processed = df_processed.persist()

    n_in = input_rows if input_rows is not None else df.count()
    metrics.receiver_accepted(n_in)
    n_proc = df_processed.count()
    metrics.processor_counts("processors/chain", n_in, n_proc)

    snapshot = pipeline_snapshot(spec.name, df, n_in)
    manifest = CheckpointManifest(base_path)
    lineage = LineageLog(base_path)
    sink_rows: dict[str, int] = {}
    resumed: list[str] = []

    sink_errors: dict[str, Exception] = {}
    for s in spec.sinks:
        if queue_capacity is not None and n_proc > queue_capacity:
            # queue-full refusal happens BEFORE any send attempt and is a
            # separate counter family from send_failed (the reference drops
            # the batch at enqueue; siblings are unaffected)
            metrics.exporter_enqueue_failed(s.name, n_proc)
            sink_errors[s.name] = RuntimeError(
                f"sending_queue is full: {n_proc} > capacity {queue_capacity}"
            )
            manifest.commit(ManifestEntry(run_id, s.name, snapshot, "failed", 0))
            continue
        metrics.exporter_queue_size(s.name, n_proc if queue_capacity is not None else 0)
        prior = manifest.committed(s.name, snapshot)
        if prior:
            resumed.append(s.name)
            # the manifest already carries the committed row count — no
            # rescan of sinks we are skipping
            sink_rows[s.name] = prior.rows
            metrics.exporter_sent(s.name, prior.rows)
            continue
        try:
            failed_attempts = write_sink_with_retry(df_processed, s, max_attempts=max_attempts)
        except Exception as exc:
            # error combination: siblings still get their deliveries
            # (fanoutconsumer/consumer.go:48-56); this sink records a failed
            # manifest entry + send_failed metric and stays resumable
            sink_errors[s.name] = exc
            metrics.exporter_sent(s.name, 0, failed=n_proc)
            manifest.commit(ManifestEntry(run_id, s.name, snapshot, "failed", 0))
            continue
        if s.format == "parquet":
            try:
                # per-partition lineage + counts straight from parquet
                # footers (no re-scan of the data)
                parts = partition_lineage(s.path)
                n = sum(p.rows for p in parts)
            except Exception:
                # driver-local pyarrow can't read every filesystem Spark can
                # write (s3a://, hdfs:// without libhdfs) — a lineage read
                # failure after a SUCCESSFUL write must not crash the run or
                # skip sibling sinks; fall back to a Spark-side count
                parts = []
                n = _read_sink(spark, s).count()
        else:
            parts = []
            n = _read_sink(spark, s).count()
        sink_rows[s.name] = n
        metrics.exporter_sent(s.name, n, failed=failed_attempts * n_proc)
        # sinks-first, lineage, manifest-last commit order (SURVEY §7 risk 4)
        if parts:
            lineage.record(run_id, s.name, snapshot, parts)
        manifest.commit(ManifestEntry(run_id, s.name, snapshot, "committed", n))

    df_processed.unpersist()
    # engine self-telemetry sampled once per run, after all sink work
    # (process_telemetry.go:30-90 analog — uptime / peak-RSS / CPU)
    metrics.record_process_telemetry()
    mdf = metrics.to_df(spark)
    mdf.write.mode("append").parquet(f"{base_path}/metrics")
    if sink_errors and raise_on_sink_error:
        raise SinkErrors(sink_errors)
    return RunResult(run_id, sink_rows, mdf, resumed)
