"""Batch processor analog: size-bounded rebatching for transport.

Reference: ``processor/batchprocessor/batch_processor.go:41-205`` accumulates
records and emits when `send_batch_size` is reached or a timeout fires,
splitting oversize batches (``splitlogs.go:21-70``) while preserving
resource grouping. In batch Spark, "batches" are output files/partitions;
the observable contract (north_star) is that record counts are invariant
across any rebatching — splitting never duplicates or drops.

Mapping:
- send_batch_size / send_batch_max_size -> `maxRecordsPerFile` on the write
  and/or an explicit repartition sized to target batch count.
- grouping preservation -> repartition BY conv_id so one conversation never
  straddles batches unnecessarily (splitlogs.go keeps resource groups whole).
- the batch_send_size / trigger metrics -> emitted from write statistics in
  plans/metrics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rebatch(
    df: DataFrame,
    send_batch_size: int,
    approx_rows: int | None = None,
    group_col: str = "conv_id",
) -> DataFrame:
    """Repartition so each output partition targets ~send_batch_size rows,
    hash-distributed by group_col (grouping-preserving like splitLogs)."""
    total = approx_rows if approx_rows is not None else df.count()
    n = max(1, (total + send_batch_size - 1) // send_batch_size)
    return df.repartition(n, F.col(group_col))


def writer_options(send_batch_max_size: int | None) -> dict[str, str]:
    """Per-sink writer options enforcing the max batch size exactly."""
    return {"maxRecordsPerFile": str(send_batch_max_size)} if send_batch_max_size else {}
