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

from pyspark.sql import DataFrame, Window
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


def split_batches(
    df: DataFrame,
    max_size: int,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Exact ``splitLogs`` semantics (``splitlogs.go:21-70``): walk records in
    stable (resource, record) order and cut a batch after every ``max_size``
    records — a resource group MAY straddle a cut (splitLogs copies out
    exactly N records, splitting the current ResourceLogs when needed), the
    last batch is partial, nothing is dropped or duplicated.

    Adds a ``batch_id`` column: global (group_col, order_col) rank div
    max_size. The unpartitioned window is intentional — batch numbering is a
    *global* sequence in the reference too (one splitLogs loop over the whole
    Logs object). At 100 TB one would zipWithIndex per partition + offset
    cumsum instead; the semantics pinned here (and in the oracle) are the
    contract, and batching-for-transport at scale is `maxRecordsPerFile`
    (see :func:`writer_options`) — this operator exists for golden parity.
    """
    w = Window.orderBy(F.col(group_col).asc(), F.col(order_col).asc())
    return df.withColumn(
        "batch_id", ((F.row_number().over(w) - F.lit(1)) / F.lit(max_size)).cast("bigint")
    )


def split_datapoint_batches(
    df: DataFrame,
    max_size: int,
    metric_col: str = "metric",
    order_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """``splitMetrics`` semantics (``processor/batchprocessor/
    splitmetrics.go:21-77``): the counting unit is DATAPOINTS, not metrics —
    ``DataPointCount()`` drives the threshold and a metric with more points
    than the remaining free slots is split mid-metric (``splitMetric``,
    :104-151), so the same metric name reappears at the head of the next
    batch. ``TestSplitMetricsUneven`` (splitmetrics_test.go:179-205) pins
    exactly that: 10 metrics x 2 points split at 9 yields batches of 9/9/2
    with metric #4 straddling the first cut.

    Adds ``batch_id``: global (metric, kind?, *order_cols) datapoint rank
    div max_size — every batch except the last holds exactly ``max_size``
    points, nothing dropped or duplicated. (The Go ``splitMetric`` has an
    off-by-RemoveIf wrinkle: for a mid-metric split where the metric holds
    more than twice the free slots, ``ms.RemoveIf`` deletes
    ``count - size`` points while ``dest`` copied only ``size`` — upstream
    fixed this after this fork's vintage; its own golden tests never enter
    that regime, and we pin the tested, lossless contract.)

    Same global-window caveat as :func:`split_batches`: batch numbering is a
    global sequence in the reference too (one splitMetrics loop per emit);
    at scale the transport analog is ``maxRecordsPerFile`` — this operator
    exists for golden parity on the metrics signal.
    """
    order = [F.col(metric_col).asc()]
    if "kind" in df.columns:
        order.append(F.col("kind").asc())
    order += [F.col(c).asc() for c in order_cols]
    w = Window.orderBy(*order)
    return df.withColumn(
        "batch_id", ((F.row_number().over(w) - F.lit(1)) / F.lit(max_size)).cast("bigint")
    )
