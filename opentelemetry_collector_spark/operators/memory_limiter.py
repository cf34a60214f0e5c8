"""Memory limiter processor — deterministic batch-admission analog.

Reference: ``processor/memorylimiter/memorylimiter.go``. The Go processor
samples the runtime heap on a ticker; while usage >= the *soft* limit
(``memAllocLimit - memSpikeLimit``, memorylimiter.go:300-312) every incoming
batch is refused WHOLE (``errForcedDrop``, :39-40) — never row-sliced — and
counted as ``refused_log_records`` (ProcessLogs, :191-209); below the soft
limit batches pass through untouched and count accepted. Construction
validates ``limit > 0`` (errLimitOutOfRange, :47-48) and ``spike < limit``
(errMemSpikeLimitOutOfRange, :50-51); an unset spike defaults to 20% of the
limit (newFixedMemUsageChecker, :313-326).

Spark analog: heap pressure on an executor is per-task and proportional to
the bytes a batch pins while it is being processed. Wall-clock heap sampling
is non-deterministic and meaningless under Spark's memory manager (which
spills instead of OOMing), so the honest batch analog is *admission by
estimated batch size*: estimate each batch's in-flight bytes from column
byte lengths plus a per-row object overhead (the pdata LogRecord fixed
fields), and refuse — whole batch, matching the Go whole-``ConsumeLogs``
refusal — any batch whose estimate reaches the soft limit. At 100 TB this
is the knob that keeps one hot conversation from OOMing an executor: the
estimate is a map-side expression, the per-batch sum rides the SAME
hash-partition-by-conv_id shuffle the downstream groupBy already pays
(AQE coalesces the two), and refusal is a filter, not a driver round-trip.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MIB = 1024 * 1024

# pdata LogRecord fixed-field overhead analog (timestamps, severity, trace
# ids, map headers) — charged per row on top of variable-length columns.
ROW_OVERHEAD_BYTES = 64


@dataclass(frozen=True)
class MemoryLimiterConfig:
    """Fixed-limit config (limit_mib path; percentage path is a scale of it).

    Mirrors processor/memorylimiter/config.go:27-53 + the construction
    errors in memorylimiter.go:42-56.
    """

    limit_mib: float
    spike_limit_mib: float = 0.0

    def __post_init__(self) -> None:
        if self.limit_mib <= 0:
            raise ValueError("memAllocLimit or memoryLimitPercentage must be greater than zero")
        if self.spike_limit_mib and self.spike_limit_mib >= self.limit_mib:
            raise ValueError("memSpikeLimit must be smaller than memAllocLimit")

    @property
    def limit_bytes(self) -> int:
        return int(self.limit_mib * MIB)

    @property
    def spike_bytes(self) -> int:
        # unset spike => 20% of the limit (newFixedMemUsageChecker :317-320)
        if self.spike_limit_mib:
            return int(self.spike_limit_mib * MIB)
        return self.limit_bytes // 5

    @property
    def soft_limit_bytes(self) -> int:
        """Refusal threshold: aboveSoftLimit == usage >= limit - spike."""
        return self.limit_bytes - self.spike_bytes


def estimated_row_bytes(byte_cols: tuple[str, ...] = ("text", "tool")) -> Column:
    """Deterministic per-row in-flight byte estimate (JVM expression)."""
    est: Column = F.lit(ROW_OVERHEAD_BYTES).cast("bigint")
    for c in byte_cols:
        est = est + F.coalesce(F.octet_length(F.col(c)), F.lit(0)).cast("bigint")
    return est


def with_admission(
    df: DataFrame,
    cfg: MemoryLimiterConfig,
    batch_key: str = "conv_id",
    byte_cols: tuple[str, ...] = ("text", "tool"),
) -> DataFrame:
    """Tag every row with its batch's byte estimate and admission verdict.

    Adds ``_batch_bytes`` (sum over the batch) and ``_admitted`` (boolean).
    The window sum hash-partitions by ``batch_key`` — the same partitioning
    the downstream per-conversation aggregate needs, so no extra shuffle
    survives in a fused plan.
    """
    w = Window.partitionBy(batch_key)
    batch_bytes = F.sum(estimated_row_bytes(byte_cols)).over(w)
    return df.withColumn("_batch_bytes", batch_bytes).withColumn(
        "_admitted", F.col("_batch_bytes") < F.lit(cfg.soft_limit_bytes)
    )


def memory_limit(
    df: DataFrame,
    cfg: MemoryLimiterConfig,
    batch_key: str = "conv_id",
    byte_cols: tuple[str, ...] = ("text", "tool"),
) -> DataFrame:
    """The processor: admitted rows pass through with original schema.

    Whole-batch semantics: a batch is either fully present or fully refused
    downstream (ProcessLogs returns the err *with the whole ld*, :191-209).
    """
    tagged = with_admission(df, cfg, batch_key, byte_cols)
    return tagged.filter(F.col("_admitted")).drop("_batch_bytes", "_admitted")


def admission_report(
    df: DataFrame,
    cfg: MemoryLimiterConfig,
    batch_key: str = "conv_id",
    byte_cols: tuple[str, ...] = ("text", "tool"),
) -> DataFrame:
    """Per-verdict batch/record counts — the obsreport accepted/refused
    taxonomy (obs_processor.go:24-77) as one aggregation pass."""
    per_batch = (
        df.groupBy(batch_key)
        .agg(
            F.sum(estimated_row_bytes(byte_cols)).alias("_batch_bytes"),
            F.count(F.lit(1)).alias("_n"),
        )
        .withColumn(
            "status",
            F.when(F.col("_batch_bytes") < F.lit(cfg.soft_limit_bytes), F.lit("accepted")).otherwise(
                F.lit("refused")
            ),
        )
    )
    return per_batch.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batches"),
        F.sum("_n").cast("bigint").alias("n_records"),
    )
