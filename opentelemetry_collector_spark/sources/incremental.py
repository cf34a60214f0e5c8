"""Incremental batch ingest: the scraper-controller / scheduled-trigger
analog (SURVEY §3.3).

The reference's pull path is a ticker driving scrapers into the same
pipeline machinery (``receiver/scraperhelper/scrapercontroller.go:157-201``).
The at-rest analog is a scheduled batch job that processes ONLY the table
snapshots that appeared since the last run: on Iceberg that is the
incremental-scan API (read between snapshot ids); on an epoch-partitioned
landing zone it is "partitions above the committed high-watermark", which
is what this module binds.

Delivery contract (mirrors plans/checkpoint.py): **at-least-once with
idempotent sinks**. The cursor commits AFTER downstream writes commit —
a crash between processing and commit replays the same epochs, and the
sink's dynamic-partition-overwrite / merge_upsert idempotence converges.
Commit order: sinks first, cursor last (SURVEY §7 risk 4).

Scale shape: the epoch probe is a directory listing (metadata-only; a
snapshot-list call on Iceberg) and the read carries an IN-list filter on
the partition column, so Spark statically prunes to exactly the new
epochs — ingest cost scales with NEW data, never with table history.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EpochCursor:
    """File-backed high-watermark over string-ordered epoch values.

    String ordering must match epoch ordering — zero-pad numeric epochs at
    write time (the expire_partitions contract). The state file is written
    atomically (tmp + rename) so a torn write can't corrupt the cursor.
    """

    def __init__(self, state_path: str):
        self.state_path = state_path

    def read(self) -> str | None:
        try:
            with open(self.state_path) as f:
                return json.load(f)["high_watermark"]
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return None

    def commit(self, epoch: str) -> None:
        cur = self.read()
        if cur is not None and epoch <= cur:
            return  # replays never move the watermark backwards
        tmp = self.state_path + ".tmp"
        os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"high_watermark": epoch}, f)
        os.replace(tmp, self.state_path)


def list_epochs(path: str, partition_col: str) -> list[str]:
    """Sorted epoch values present in the landing zone (metadata-only)."""
    prefix = f"{partition_col}="
    if not os.path.isdir(path):
        return []
    return sorted(
        name[len(prefix):]
        for name in os.listdir(path)
        if name.startswith(prefix) and os.path.isdir(os.path.join(path, name))
    )


def read_new_epochs(
    spark: SparkSession,
    path: str,
    partition_col: str,
    cursor: EpochCursor,
) -> tuple[DataFrame | None, list[str]]:
    """DataFrame over every epoch ABOVE the cursor (None if nothing new),
    plus the epoch list. The caller processes, commits its sinks, then
    calls ``cursor.commit(max(new_epochs))`` — in that order.
    """
    from functools import reduce

    hw = cursor.read()
    new = [e for e in list_epochs(path, partition_col) if hw is None or e > hw]
    if not new:
        return None, []
    df = spark.read.parquet(path)
    # directory inference types the partition column (e.g. "0001" -> int 1);
    # compare each raw value THROUGH that type so the probe matches what the
    # scan actually carries, and pruning stays static
    dtype = dict(df.dtypes)[partition_col]
    pred = reduce(
        lambda a, b: a | b,
        [F.col(partition_col) == F.lit(e).cast(dtype) for e in new],
    )
    return df.filter(pred), new
